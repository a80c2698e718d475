"""Module-level attribution of the eval forward time at flagship shapes.

Times each stage standalone as its own jit (pipelined dispatch, one fence):
alignment, full backbone, fusion module alone, heads, and single CSP layers
at the largest/smallest pyramid levels. Shapes follow the production eval
protocol (B=64, T=224, C=512, 2B-batched fusion). BENCH_DTYPE=bfloat16
switches the compute policy.
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
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from unav_yolyolva_tpu.models.alignment import Alignment
    from unav_yolyolva_tpu.models.backbone import ConvTransformerBackbone
    from unav_yolyolva_tpu.models.fusion import FusionModule, MaxSigmoidCSPLayer
    from unav_yolyolva_tpu.models.heads import ClsHead, RegHead

    b = int(os.environ.get("BENCH_BATCH", "64"))
    t, c, ncls = 224, 512, 100
    dt = os.environ.get("BENCH_DTYPE", "float32")
    dtype = jnp.bfloat16 if dt == "bfloat16" else None
    key = jax.random.PRNGKey(0)
    host = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(host.normal(size=shape).astype(np.float32))

    mask = jnp.ones((b, t), bool)
    rows = []

    def record(name, ms):
        # print incrementally so a timeout mid-run keeps the finished rows
        rows.append((name, ms))
        print(f"{name:26s}: {ms * 1e3:8.2f} ms", flush=True)
    # NB: inits MUST be jitted — eager execution routes every op through
    # the axon tunnel at ~100 ms/op, which turns init into tens of minutes

    # ---- alignment ------------------------------------------------------
    align = Alignment(video_dim=2048, audio_dim=128, num_hidden=c,
                      num_classes=ncls, dtype=dtype)
    vis, aud = mk((b, t, 2048)), mk((b, t, 128))
    msc, mse, mlb = (jnp.zeros((b, t)), jnp.zeros((b, t)),
                     jnp.zeros((b, t, ncls)))
    ap = jax.jit(align.init)(key, vis, aud, mask, mask, mse, msc, mlb)
    f = jax.jit(lambda p, v, a: align.apply(p, v, a, mask, mask, mse, msc, mlb))
    record("alignment", timed(f, ap, vis, aud))

    # ---- backbone (stem + pyramid + 2B fusion) --------------------------
    bb = ConvTransformerBackbone(max_len=t, use_abs_pe=True, dtype=dtype)
    xv, xa = mk((b, t, c)), mk((b, t, c))
    bp = jax.jit(bb.init)(key, xv, xa, mask)
    fb = jax.jit(lambda p, v, a: bb.apply(p, v, a, mask))
    record("backbone (all)", timed(fb, bp, xv, xa))

    # ---- fusion module alone at 2B --------------------------------------
    b2 = 2 * b
    lvl_ts = [t // (2 ** i) for i in range(6)]
    pyr = [mk((b2, tl, c)) for tl in lvl_ts]
    pyr_masks = [jnp.ones((b2, tl), bool) for tl in lvl_ts]
    guide = mk((b2, t, c))
    gmask = jnp.ones((b2, t), bool)
    fm = FusionModule(c, seq_len=t, dtype=dtype)
    fp = jax.jit(fm.init)(key, pyr, guide, pyr_masks, gmask)
    ff = jax.jit(
        lambda p, py, g: fm.apply(p, py, g, pyr_masks, gmask, train=False)
    )
    record("fusion alone (2B)", timed(ff, fp, pyr, guide))

    # ---- heads ----------------------------------------------------------
    feats = [mk((b, tl, 2 * c)) for tl in lvl_ts]
    fmasks = [jnp.ones((b, tl), bool) for tl in lvl_ts]
    ch = ClsHead(feat_dim=c, num_classes=ncls, dtype=dtype)
    cp = jax.jit(ch.init)(key, feats, fmasks)
    fc = jax.jit(lambda p, x: ch.apply(p, x, fmasks))
    rh = RegHead(feat_dim=c, num_classes=ncls, fpn_levels=6, class_aware=True,
                 dtype=dtype)
    rp = jax.jit(rh.init)(key, feats, fmasks)
    fr = jax.jit(lambda p, x: rh.apply(p, x, fmasks))
    record("cls head", timed(fc, cp, feats))
    record("reg head", timed(fr, rp, feats))

    # ---- single CSP layers at extreme levels ----------------------------
    for tl in (224, 7):
        csp = MaxSigmoidCSPLayer(
            in_channels=2 * c, out_channels=c, guide_in_features=t,
            embed_channels=c // 2, num_heads=8, dtype=dtype,
        )
        x_in = mk((b2, tl, 2 * c))
        m_in = jnp.ones((b2, tl), bool)
        g_in = mk((b2, c, t))
        pp = jax.jit(csp.init)(key, x_in, g_in, m_in)
        fcsp = jax.jit(lambda p, x, g: csp.apply(p, x, g, m_in, train=False))
        record(f"one CSP layer T={tl} (2B)", timed(fcsp, pp, x_in, g_in))

    print(f"B={b} dtype={dt} device={jax.devices()[0].device_kind}")


if __name__ == "__main__":
    main()
