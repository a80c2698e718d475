"""Bisect the full train step's cost layer by layer (pipelined timing).

Variants, each its own jit at the flagship protocol (B=8, T=224):
  grad            jax.grad of fwd+loss
  grad+targets    + on-device target construction
  grad+opt        + clip/AdamW update (no EMA, no donation)
  full-nodonate   complete step, no buffer donation
  full            make_train_step (donated, mesh shardings)

BENCH_DTYPE=bfloat16 switches the compute policy.
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

    from unav_yolyolva_tpu.core.config import load_config_dict
    from unav_yolyolva_tpu.models import build_model
    from unav_yolyolva_tpu.models.meta_arch import compute_losses
    from unav_yolyolva_tpu.geometry.points import concat_points, generate_points
    from unav_yolyolva_tpu.parallel import make_mesh, shard_batch
    from unav_yolyolva_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )
    from unav_yolyolva_tpu.train.step import build_targets, _model_inputs
    from unav_yolyolva_tpu.train.ema import ema_update
    from unav_yolyolva_tpu.train.state import TrainState

    b, t, c = int(os.environ.get("BENCH_BATCH", "8")), 224, 100
    cfg = load_config_dict({
        "dataset": {"max_seq_len": t, "num_classes": c, "max_num_events": 64},
        "loader": {"batch_size": b},
        "model": {
            "use_abs_pe": True, "class_aware": True,
            "intra_contr_weight": 1.0, "inter_contr_weight": 0.001,
            "score_V_weight": 0.001, "score_A_weight": 0.001,
        },
        "opt": {"learning_rate": 1e-4, "epochs": 40, "warmup_epochs": 5,
                "weight_decay": 1e-4},
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

    m_scores, m_start_end, m_labels, gt_cls, gt_reg = jax.jit(
        lambda bt: build_targets(bt, points_cat, t, c, True))(batch)
    inputs = {
        "visual": batch["visual"], "audio": batch["audio"],
        "mask": batch["mask"], "m_scores": m_scores,
        "m_start_end": m_start_end, "m_labels": m_labels,
    }
    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(rng, inputs)
    tx, _ = make_optimizer(params, cfg["opt"], 100,
                           clip_grad_l2norm=cfg["train_cfg"]["clip_grad_l2norm"],
                           local_batch=b)

    loss_kwargs = dict(
        class_aware=True, loss_weight=1.0,
        inter_weight=mcfg["inter_contr_weight"],
        intra_weight=mcfg["intra_contr_weight"],
        score_v_weight=mcfg["score_V_weight"],
        score_a_weight=mcfg["score_A_weight"],
        label_smoothing=cfg["train_cfg"]["label_smoothing"],
    )

    def loss_fn(p, inp, g_cls, g_reg):
        out = model.apply(p, inp, train=True, rngs={"droppath": rng})
        losses, new_norm = compute_losses(
            out, g_cls, g_reg, jnp.float32(250.0), **loss_kwargs)
        return losses["final_loss"], (losses, new_norm)

    grad_fn = jax.jit(
        lambda p: jax.grad(loss_fn, has_aux=True)(p, inputs, gt_cls, gt_reg)[0]
    )
    print(f"grad          : {timed(grad_fn, params)*1e3:8.1f} ms", flush=True)

    def grad_targets(p, bt):
        ms, mse, ml, gc, gr = build_targets(bt, points_cat, t, c, True)
        inp = _model_inputs(bt, ms, mse, ml)
        return jax.grad(loss_fn, has_aux=True)(p, inp, gc, gr)[0]

    gt_fn = jax.jit(grad_targets)
    print(f"grad+targets  : {timed(gt_fn, params, batch)*1e3:8.1f} ms",
          flush=True)

    opt_state0 = tx.init(params)

    def grad_opt(p, os_, bt):
        ms, mse, ml, gc, gr = build_targets(bt, points_cat, t, c, True)
        inp = _model_inputs(bt, ms, mse, ml)
        grads, _ = jax.grad(loss_fn, has_aux=True)(p, inp, gc, gr)
        updates, os2 = tx.update(grads, os_, p)
        p2 = jax.tree.map(lambda a, u: a + u, p, updates)
        return p2, os2

    go_fn = jax.jit(grad_opt)
    print(f"grad+opt      : {timed(go_fn, params, opt_state0, batch)*1e3:8.1f} ms",
          flush=True)

    state0 = create_train_state(jax.tree.map(jnp.array, params), tx, 250.0)

    def full_step(st, bt, key):
        ms, mse, ml, gc, gr = build_targets(bt, points_cat, t, c, True)
        inp = _model_inputs(bt, ms, mse, ml)
        (_, (losses, new_norm)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st.params, inp, gc, gr)
        updates, os2 = tx.update(grads, st.opt_state, st.params)
        p2 = jax.tree.map(lambda a, u: a + u, st.params, updates)
        ema2 = ema_update(st.ema_params, p2)
        return TrainState(params=p2, opt_state=os2, ema_params=ema2,
                          loss_normalizer=new_norm, step=st.step + 1), losses

    fn_nodonate = jax.jit(full_step)
    st = state0
    # time without donation (state threads through, not donated)
    fence(fn_nodonate(st, batch, rng))
    out = None
    t0 = time.perf_counter()
    for _ in range(20):
        out = fn_nodonate(st, batch, rng)
    fence(out)
    print(f"full-nodonate : {(time.perf_counter()-t0)/20*1e3:8.1f} ms",
          flush=True)

    mesh = make_mesh()
    step = make_train_step(model, tx, cfg, mesh=mesh)
    st = create_train_state(jax.tree.map(jnp.array, params), tx, 250.0,
                            mesh=mesh)
    db = shard_batch(jax.device_get(batch), mesh)
    st, losses = step(st, db, rng)
    float(losses["final_loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        st, losses = step(st, db, rng)
    float(losses["final_loss"])
    print(f"full (prod)   : {(time.perf_counter()-t0)/20*1e3:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
