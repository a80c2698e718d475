"""A/B a single MaxSigmoidCSPLayer train fwd+bwd: kernel backward vs the
round-3 XLA-composition backward vs the plain XLA module path.

Usage: python tools/bench_csp_bwd.py [--batch 128] [--t 224] [--iters 20]
       [--dtype float32|bfloat16]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t", type=int, default=224)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--mode", type=str, default="all",
                    help="kernel|xla_bwd|xla|all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import unav_yolyolva_tpu.models.blocks as blocks
    from unav_yolyolva_tpu.models.fusion import MaxSigmoidCSPLayer

    b, t = args.batch, args.t
    cin, n_embd, ng, fg = 1024, 512, 512, 224
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, cin)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, ng, fg)).astype(np.float32))
    mask = jnp.ones((b, t), bool)
    w = jnp.asarray(rng.normal(size=(b, t, n_embd)).astype(np.float32))

    layer = MaxSigmoidCSPLayer(
        in_channels=cin, out_channels=n_embd, guide_in_features=fg,
        embed_channels=n_embd // 2, num_heads=8, dtype=dtype,
    )
    blocks.FUSED_MHCA = "never"
    params = layer.init(jax.random.PRNGKey(0), x, g, mask, train=True)
    blocks.FUSED_MHCA = os.environ.get("UNAV_FUSED_MHCA", "auto")

    def loss(p, a, b_):
        out, _ = layer.apply(p, a, b_, mask, train=True)
        return jnp.sum(out.astype(jnp.float32) * w)

    grad_fn = jax.grad(loss, argnums=(0, 1, 2))

    def run(tag, env_csp, env_bwd):
        os.environ["UNAV_FUSED_CSP"] = env_csp
        if env_bwd:
            os.environ["UNAV_CSP_BWD"] = env_bwd
        else:
            os.environ.pop("UNAV_CSP_BWD", None)
        f = jax.jit(grad_fn)
        t0 = time.perf_counter()
        out = f(params, x, g)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(params, x, g)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 3),
                          "compile_s": round(compile_s, 1),
                          "b": b, "t": t, "dtype": args.dtype}))
        return out

    results = {}
    modes = (["kernel", "xla_bwd", "xla"] if args.mode == "all"
             else [args.mode])
    for m in modes:
        if m == "kernel":
            results[m] = run("kernel_bwd", "always", None)
        elif m == "xla_bwd":
            results[m] = run("xla_composition_bwd", "always", "xla")
        elif m == "xla":
            results[m] = run("xla_path", "never", None)

    if len(results) > 1:
        ref = results.get("xla") or results["xla_bwd"]
        for m, out in results.items():
            for a, r in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(r, np.float32),
                    rtol=2e-2, atol=2e-2)
        print("# grads agree across modes")


if __name__ == "__main__":
    main()
