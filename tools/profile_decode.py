"""Stage attribution of the eval decode cost at flagship shapes.

Times, each as its own jitted program on identical random head outputs
(B=64, levels [224,112,56,28,14,7], C=100, class-aware), pipelined
dispatch with one fence (see bench.py for the protocol rationale):

  sigmoid+mask    elementwise probability map only
  +topk           + per-level lax.top_k (the candidate filter)
  +gathers        + offset/point gathers and segment arithmetic (full
                    decode_single_video, vmapped)
  topk only L0    the single largest level's top_k in isolation

Use to decide whether the sort or the gathers dominate decode.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(out):
    import jax
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])


def timed(fn, *args, iters=20):
    fence(fn(*args))
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from unav_yolyolva_tpu.eval.decode import decode_predictions
    from unav_yolyolva_tpu.geometry.points import generate_points

    B, C = 64, 100
    lengths = [224, 112, 56, 28, 14, 7]
    reg_range = [(0, 4), (4, 8), (8, 16), (16, 32), (32, 64), (64, 10000)]
    test_cfg = {
        "pre_nms_thresh": 0.001,
        "pre_nms_topk": 2000,
        "duration_thresh": 0.05,
    }
    rng = np.random.default_rng(0)
    cls_logits = [
        jnp.asarray(rng.normal(-2, 1, (B, t, C)).astype(np.float32))
        for t in lengths
    ]
    offsets = [
        jnp.asarray(rng.uniform(0, 2, (B, t, C, 2)).astype(np.float32))
        for t in lengths
    ]
    masks = [jnp.ones((B, t), bool) for t in lengths]
    points = generate_points(224, reg_range, 2)

    @jax.jit
    def stage_sigmoid(cls_l, msks):
        return [
            jax.nn.sigmoid(c) * m[..., None].astype(c.dtype)
            for c, m in zip(cls_l, msks)
        ]

    @jax.jit
    def stage_topk(cls_l, msks):
        outs = []
        for c, m in zip(cls_l, msks):
            prob = jax.nn.sigmoid(c) * m[..., None].astype(c.dtype)
            flat = prob.reshape(B, -1)
            k = min(test_cfg["pre_nms_topk"], flat.shape[-1])
            if k == flat.shape[-1]:
                outs.append((flat, None))
            else:
                outs.append(jax.lax.top_k(flat, k))
        return outs

    @jax.jit
    def stage_full(cls_l, offs, msks):
        out = {"cls_logits": cls_l, "offsets": offs, "masks": msks}
        return decode_predictions(out, points, test_cfg, class_aware=True)

    @jax.jit
    def topk_L0(c, m):
        prob = jax.nn.sigmoid(c) * m[..., None].astype(c.dtype)
        return jax.lax.top_k(prob.reshape(B, -1), 2000)

    print(f"B={B} C={C} device={jax.devices()[0].device_kind}")
    t = timed(stage_sigmoid, cls_logits, masks) * 1e3
    print(f"sigmoid+mask  : {t:8.2f} ms")
    t = timed(stage_topk, cls_logits, masks) * 1e3
    print(f"+topk         : {t:8.2f} ms")
    t = timed(stage_full, cls_logits, offsets, masks) * 1e3
    print(f"full decode   : {t:8.2f} ms")
    t = timed(topk_L0, cls_logits[0], masks[0]) * 1e3
    print(f"topk L0 only  : {t:8.2f} ms")


if __name__ == "__main__":
    main()
