"""A/B a single stem TransformerBlock: fused whole-block kernel vs the
round-3 configuration (XLA block with only the inner MHCA fused) vs plain
XLA — eval forward and train fwd+bwd.

Usage: python tools/bench_tblock.py [--batch 64] [--t 224] [--iters 30]
       [--dtype float32|bfloat16] [--train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t", type=int, default=224)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--mode", type=str, default="all",
                    help="tblock|mhca_only|xla|all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import unav_yolyolva_tpu.models.blocks as blocks
    from unav_yolyolva_tpu.models.blocks import TransformerBlock

    b, t, c = args.batch, args.t, 512
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    mask = jnp.ones((b, t), bool)
    w = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))

    layer = TransformerBlock(c, 4, path_pdrop=0.1, dtype=dtype)
    blocks.FUSED_TBLOCK = "never"
    blocks.FUSED_MHCA = "never"
    params = layer.init(
        {"params": jax.random.PRNGKey(0),
         "droppath": jax.random.PRNGKey(1)},
        x, x, mask, train=True,
    )

    droppath = jax.random.PRNGKey(7)

    def loss(p, a):
        out, _ = layer.apply(p, a, a, mask, train=True,
                             rngs={"droppath": droppath})
        return jnp.sum(out.astype(jnp.float32) * w)

    def fwd(p, a):
        out, _ = layer.apply(p, a, a, mask, train=False)
        return out

    fn = jax.grad(loss, argnums=(0, 1)) if args.train else fwd

    def run(tag, tb, mh):
        blocks.FUSED_TBLOCK = tb
        blocks.FUSED_MHCA = mh
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = f(params, x)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(params, x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 3),
                          "compile_s": round(compile_s, 1), "b": b, "t": t,
                          "dtype": args.dtype, "train": args.train}))
        return out

    results = {}
    modes = (["tblock", "mhca_only", "xla"] if args.mode == "all"
             else [args.mode])
    for m in modes:
        if m == "tblock":
            results[m] = run("fused_tblock", "always", "auto")
        elif m == "mhca_only":
            results[m] = run("xla_block_fused_mhca", "never", "always")
        elif m == "xla":
            results[m] = run("xla_plain", "never", "never")

    if len(results) > 1:
        ref = results.get("xla", next(iter(results.values())))
        for m, out in results.items():
            for a, r in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(r, np.float32),
                    rtol=2e-2, atol=2e-2)
        print("# outputs agree across modes")


if __name__ == "__main__":
    main()
