"""Head-to-head: XLA fori_loop Soft-NMS vs Pallas VMEM-resident kernel.

Runs both at the reference eval protocol shape (B=64 videos x C=100 classes
per-class candidate buffers of M=1024, max_out=100) on the current
accelerator, checks emission-for-emission equality on a smaller oracle
first, then times both.
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

    from unav_yolyolva_tpu.ops.nms import soft_nms_fixed
    from unav_yolyolva_tpu.ops.pallas_nms import soft_nms_pallas

    rng = np.random.default_rng(0)

    # --- equality oracle: modest G, realistic sparsity -------------------
    g, m, max_out = 64, 256, 100
    segs = np.sort(rng.uniform(0, 200, size=(g, m, 2)).astype(np.float32), -1)
    scores = rng.uniform(0, 1, size=(g, m)).astype(np.float32)
    alive = rng.uniform(size=(g, m)) < 0.4  # ~100 live candidates per row
    kw = dict(max_out=max_out, iou_threshold=0.7, sigma=0.4,
              min_score=0.001, method=2)

    ref = jax.vmap(
        lambda s, sc, al: soft_nms_fixed(
            s, sc, al, kw["max_out"], kw["iou_threshold"], kw["sigma"],
            kw["min_score"], kw["method"])
    )(jnp.asarray(segs), jnp.asarray(scores), jnp.asarray(alive))
    ridx, rsc, rok = map(np.asarray, ref)

    p_scores = np.where(alive, scores, -np.inf).astype(np.float32)
    pidx, psc, pok = map(np.asarray, soft_nms_pallas(
        jnp.asarray(segs), jnp.asarray(p_scores), **kw))

    ok = np.array_equal(rok, pok)
    idx_ok = np.array_equal(np.where(rok, ridx, -1), np.where(pok, pidx, -1))
    sc_ok = np.allclose(np.where(rok, rsc, 0), np.where(pok, psc, 0),
                        atol=1e-5)
    print(f"equality: valid={ok} idx={idx_ok} score={sc_ok}", flush=True)
    if not (ok and idx_ok and sc_ok):
        bad = np.argwhere(
            (rok != pok)
            | (np.where(rok, ridx, -1) != np.where(pok, pidx, -1))
        )
        print("first mismatches:", bad[:5])
        r0 = bad[0][0] if len(bad) else 0
        print("ref  idx/sc:", ridx[r0][:12], rsc[r0][:6])
        print("pal  idx/sc:", pidx[r0][:12], psc[r0][:6])
        sys.exit(1)

    # --- timing at the reference protocol --------------------------------
    B, C, M = 64, 100, 1024
    G = B * C
    segs = np.sort(
        rng.uniform(0, 224, size=(G, M, 2)).astype(np.float32), -1)
    scores = rng.uniform(0, 1, size=(G, M)).astype(np.float32)
    # ~100 live candidates per (video, class) row, like the real decode
    alive = rng.uniform(size=(G, M)) < 0.1

    d_segs = jax.device_put(jnp.asarray(segs))
    d_scores = jax.device_put(jnp.asarray(scores))
    d_alive = jax.device_put(jnp.asarray(alive))
    d_pscores = jax.device_put(jnp.asarray(
        np.where(alive, scores, -np.inf).astype(np.float32)))

    xla_fn = jax.jit(jax.vmap(
        lambda s, sc, al: soft_nms_fixed(
            s, sc, al, kw["max_out"], kw["iou_threshold"], kw["sigma"],
            kw["min_score"], kw["method"])
    ))
    t_xla = timed(xla_fn, d_segs, d_scores, d_alive)

    print(f"XLA fori_loop : {t_xla*1e3:8.1f} ms  (G={G}, M={M})", flush=True)
    for rb in (8, 16, 32, 64, 128):
        pal_fn = jax.jit(
            lambda s, sc, rb=rb: soft_nms_pallas(s, sc, row_block=rb, **kw))
        t_pal = timed(pal_fn, d_segs, d_pscores)
        print(f"Pallas rb={rb:3d} : {t_pal*1e3:8.1f} ms  "
              f"({t_xla/t_pal:.1f}x)", flush=True)

    # --- merged class-masked multiclass kernel ---------------------------
    from unav_yolyolva_tpu.ops.nms import batched_nms, multiclass_nms_batch

    # equality vs the per-class XLA reference path at eval-protocol scale
    B, N, C, K = 8, 10100, 100, 100
    rng = np.random.default_rng(7)
    starts = rng.uniform(0, 224, (B, N)).astype(np.float32)
    msegs = np.stack(
        [starts, starts + rng.uniform(1, 40, (B, N)).astype(np.float32)], -1)
    mscores = rng.uniform(0.002, 1, (B, N)).astype(np.float32)
    mcls = rng.integers(0, C, (B, N)).astype(np.int32)
    mvalid = rng.uniform(size=(B, N)) < 0.5
    nms_kw = dict(max_seg_num=K, iou_threshold=0.7, sigma=0.4,
                  min_score=0.001, method=2)
    ref_fn = jax.jit(jax.vmap(lambda s, sc, ci, v: batched_nms(
        s, sc, ci, v, num_classes=C, use_soft_nms=True, multiclass=True,
        backend="xla", iou_threshold=0.7, sigma=0.4, min_score=0.001,
        max_seg_num=K)))
    mref = jax.tree.map(np.asarray, ref_fn(
        jnp.asarray(msegs), jnp.asarray(mscores), jnp.asarray(mcls),
        jnp.asarray(mvalid)))
    mpal = jax.tree.map(np.asarray, multiclass_nms_batch(
        jnp.asarray(msegs), jnp.asarray(mscores), jnp.asarray(mcls),
        jnp.asarray(mvalid), **nms_kw))
    eq = all(
        np.allclose(np.where(mref[3][..., None] if a.ndim == 3
                             else mref[3], a, 0),
                    np.where(mpal[3][..., None] if b.ndim == 3
                             else mpal[3], b, 0), atol=1e-5)
        for a, b in zip(mref, mpal)
    ) and np.array_equal(mref[3], mpal[3])
    print(f"merged-kernel equality vs per-class XLA (B={B}): {eq}",
          flush=True)

    # timing at the full protocol batch
    B = 64
    starts = rng.uniform(0, 224, (B, N)).astype(np.float32)
    msegs = np.stack(
        [starts, starts + rng.uniform(1, 40, (B, N)).astype(np.float32)], -1)
    mscores = rng.uniform(0.002, 1, (B, N)).astype(np.float32)
    mcls = rng.integers(0, C, (B, N)).astype(np.int32)
    mvalid = rng.uniform(size=(B, N)) < 0.95
    dm = jax.device_put((jnp.asarray(msegs), jnp.asarray(mscores),
                         jnp.asarray(mcls), jnp.asarray(mvalid)))
    flat_fn = jax.jit(lambda s, sc, ci, v: multiclass_nms_batch(
        s, sc, ci, v, **nms_kw))
    t_flat = timed(flat_fn, *dm)
    print(f"merged kernel : {t_flat*1e3:8.1f} ms  (B={B}, N={N}, "
          f"whole multiclass NMS incl. output gathers)", flush=True)


if __name__ == "__main__":
    main()
