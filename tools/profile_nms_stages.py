"""Stage-level breakdown of the in-pipeline multiclass NMS on TPU.

Times, each as its own jit on identical decoded candidates (B=64, N=10100,
C=100, M=1024): group_by_class sort+scatter, the pallas decay scan, the
index-map + final global top-k, and the fused whole.
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


def timed(fn, *args, iters=5):
    fence(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from unav_yolyolva_tpu.ops.nms import batched_nms, group_by_class
    from unav_yolyolva_tpu.ops.pallas_nms import soft_nms_pallas

    B, N, C, M, K = 64, 10100, 100, 1024, 100
    rng = np.random.default_rng(0)
    starts = rng.uniform(0, 224, (B, N)).astype(np.float32)
    segs = np.stack(
        [starts, starts + rng.uniform(1, 40, (B, N)).astype(np.float32)], -1)
    scores = rng.uniform(0, 1, (B, N)).astype(np.float32)
    cls = rng.integers(0, C, (B, N)).astype(np.int32)
    valid = (rng.uniform(size=(B, N)) < 0.95)

    d = jax.device_put((jnp.asarray(segs), jnp.asarray(scores),
                        jnp.asarray(cls), jnp.asarray(valid)))

    group = jax.jit(jax.vmap(
        lambda s, sc, ci, v: group_by_class(s, sc, ci, v, C, M)))
    t_group = timed(group, *d)
    print(f"group_by_class : {t_group*1e3:7.1f} ms", flush=True)

    bufs = jax.tree.map(jnp.asarray, group(*d))

    scan = jax.jit(lambda bs, bsc: soft_nms_pallas(
        bs.reshape(-1, M, 2), bsc.reshape(-1, M), max_out=K,
        iou_threshold=0.7, sigma=0.4, min_score=0.001, method=2))
    t_scan = timed(scan, bufs[0], bufs[1])
    print(f"scan (reshaped): {t_scan*1e3:7.1f} ms", flush=True)

    scan_v = jax.jit(jax.vmap(lambda bs, bsc: soft_nms_pallas(
        bs, bsc, max_out=K,
        iou_threshold=0.7, sigma=0.4, min_score=0.001, method=2)))
    t_scanv = timed(scan_v, bufs[0], bufs[1])
    print(f"scan (vmapped) : {t_scanv*1e3:7.1f} ms", flush=True)

    kw = dict(num_classes=C, iou_threshold=0.7, min_score=0.001,
              max_seg_num=K, use_soft_nms=True, multiclass=True, sigma=0.4)
    whole = jax.jit(jax.vmap(
        lambda s, sc, ci, v: batched_nms(s, sc, ci, v, **kw)))
    t_whole = timed(whole, *d)
    print(f"whole          : {t_whole*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
