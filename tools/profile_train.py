"""Bisect the train-step cost on the current accelerator.

Times, each as its own jitted program at the reference train protocol
(B=8, T=224, full model): forward (train mode), loss-only, grad, and the
full train step (grad + AdamW + EMA + normalizer).
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
    """Pipelined device-throughput timing.

    Dispatches `iters` calls back-to-back and fences ONCE: TPU programs
    execute in submission order, so total/iters is the per-call device time.
    Fencing every call instead would measure the host<->device round-trip
    (~100 ms through this environment's axon tunnel) rather than compute.
    """
    fence(fn(*args))  # compile + warm
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)  # previous out's buffers free once executed
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

    from unav_yolyolva_tpu.core.config import load_config_dict
    from unav_yolyolva_tpu.models import build_model
    from unav_yolyolva_tpu.models.meta_arch import compute_losses
    from unav_yolyolva_tpu.geometry.points import concat_points, generate_points
    from unav_yolyolva_tpu.train.step import build_targets, _model_inputs

    b, t, c = int(os.environ.get("BENCH_BATCH", "8")), 224, 100
    cfg = load_config_dict({
        "dataset": {"max_seq_len": t, "num_classes": c, "max_num_events": 64},
        "loader": {"batch_size": b},
        "model": {
            "use_abs_pe": True, "class_aware": True,
            "intra_contr_weight": 1.0, "inter_contr_weight": 0.001,
            "score_V_weight": 0.001, "score_A_weight": 0.001,
        },
        "train_cfg": {"loss_weight": 1},
        "tpu": {"compute_dtype": os.environ.get("BENCH_DTYPE", "float32")},
    })
    mcfg = cfg["model"]
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    host = np.random.default_rng(0)
    batch = jax.device_put({
        "visual": host.normal(size=(b, t, 2048)).astype(np.float32),
        "audio": host.normal(size=(b, t, 128)).astype(np.float32),
        "mask": np.ones((b, t), bool),
        "gt_segments": np.tile(
            np.float32([[10.0, 60.0], [100.0, 150.0]] + [[0, 0]] * 62),
            (b, 1, 1)),
        "gt_labels": np.tile(np.int32([3, 7] + [0] * 62), (b, 1)),
        "gt_valid": np.tile(np.asarray([True, True] + [False] * 62), (b, 1)),
    })
    points_cat = jnp.asarray(
        concat_points(generate_points(t, mcfg["regression_range"],
                                      mcfg["scale_factor"])))

    tgt_fn = jax.jit(lambda bt: build_targets(bt, points_cat, t, c, True))
    t_tgt = timed(tgt_fn, batch)
    print(f"targets       : {t_tgt*1e3:8.1f} ms", flush=True)
    m_scores, m_start_end, m_labels, gt_cls, gt_reg = jax.tree.map(
        jnp.asarray, tgt_fn(batch))
    inputs = {
        "visual": batch["visual"], "audio": batch["audio"],
        "mask": batch["mask"], "m_scores": m_scores,
        "m_start_end": m_start_end, "m_labels": m_labels,
    }

    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(rng, inputs)

    fwd_eval = jax.jit(lambda p, d: model.apply(p, d, train=False))
    print(f"fwd eval-mode : {timed(fwd_eval, params, inputs)*1e3:8.1f} ms",
          flush=True)

    fwd_train = jax.jit(lambda p, d: model.apply(
        p, d, train=True, rngs={"droppath": rng}))
    print(f"fwd train-mode: {timed(fwd_train, params, inputs)*1e3:8.1f} ms",
          flush=True)

    loss_kwargs = dict(
        class_aware=True, loss_weight=1.0,
        inter_weight=mcfg["inter_contr_weight"],
        intra_weight=mcfg["intra_contr_weight"],
        score_v_weight=mcfg["score_V_weight"],
        score_a_weight=mcfg["score_A_weight"],
        label_smoothing=cfg["train_cfg"]["label_smoothing"],
    )

    def loss_fn(p):
        out = model.apply(p, inputs, train=True, rngs={"droppath": rng})
        losses, new_norm = compute_losses(
            out, gt_cls, gt_reg, jnp.float32(250.0), **loss_kwargs)
        return losses["final_loss"], (losses, new_norm)

    loss_only = jax.jit(lambda p: loss_fn(p)[0])
    print(f"fwd+loss      : {timed(loss_only, params)*1e3:8.1f} ms",
          flush=True)

    grad_fn = jax.jit(lambda p: jax.grad(loss_fn, has_aux=True)(p)[0])
    print(f"grad          : {timed(grad_fn, params)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
