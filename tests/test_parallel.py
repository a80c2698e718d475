"""Data-parallel correctness: the sharded train step over N devices must
produce the same update as the single-device run on the identical global
batch (XLA's derived all-reduce == the reference's DataParallel gradient
sum, up to float association)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unav_yolyolva_tpu.core.config import load_config_dict
from unav_yolyolva_tpu.models import build_model
from unav_yolyolva_tpu.parallel import make_mesh, shard_batch
from unav_yolyolva_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

T, NCLS = 32, 4


def tiny_cfg():
    return load_config_dict({
        "dataset": {"max_seq_len": T, "num_classes": NCLS,
                    "max_num_events": 4},
        "loader": {"batch_size": 4},
        "model": {
            "raw_input_dim_V": 16, "raw_input_dim_A": 8,
            "input_dim_V": 16, "input_dim_A": 16, "embd_dim": 16,
            "head_dim": 16, "n_head": 4, "use_abs_pe": True,
            "class_aware": True,
        },
        # SGD: the update is linear in the gradient, so cross-sharding
        # equivalence can be asserted tightly. (AdamW's first step is
        # lr*g/(|g|+eps), unboundedly sensitive to reduction order at g~0.)
        "opt": {"learning_rate": 1e-2, "epochs": 1, "warmup_epochs": 0,
                "warmup": False, "type": "SGD", "momentum": 0.9,
                "weight_decay": 0.0},
        "train_cfg": {"loss_weight": 1, "droppath": 0.0},
    })


def make_np_batch(b):
    rng = np.random.default_rng(0)
    return {
        "visual": rng.normal(size=(b, T, 16)).astype(np.float32),
        "audio": rng.normal(size=(b, T, 8)).astype(np.float32),
        "mask": np.ones((b, T), bool),
        "gt_segments": np.tile(
            np.float32([[3.0, 12.0], [14.0, 20.0], [0, 0], [0, 0]]),
            (b, 1, 1),
        ),
        "gt_labels": np.tile(np.int32([1, 2, 0, 0]), (b, 1)),
        "gt_valid": np.tile([True, True, False, False], (b, 1)),
    }


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_step_matches_single_device(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    cfg = tiny_cfg()
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    b = 4
    batch = make_np_batch(b)
    dummy = {
        "visual": jnp.asarray(batch["visual"]),
        "audio": jnp.asarray(batch["audio"]),
        "mask": jnp.asarray(batch["mask"]),
        "m_scores": jnp.zeros((b, T)),
        "m_start_end": jnp.zeros((b, T)),
        "m_labels": jnp.zeros((b, T, NCLS)),
    }
    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(rng, dummy)
    tx, _ = make_optimizer(params, cfg["opt"], 10)

    def run(mesh):
        # fresh copy: the jitted step donates its state buffers
        fresh = jax.tree.map(jnp.array, params)
        state = create_train_state(fresh, tx, 250.0)
        step = make_train_step(model, tx, cfg, mesh=mesh)
        db = shard_batch(batch, mesh) if mesh else batch
        state, losses = step(state, db, rng)
        return jax.device_get(state.params), {
            k: float(v) for k, v in losses.items()
        }

    p1, l1 = run(make_mesh(1))
    pn, ln = run(make_mesh(n_dev))

    np.testing.assert_allclose(
        l1["final_loss"], ln["final_loss"], rtol=1e-4
    )
    flat1 = jax.tree.leaves(p1)
    flatn = jax.tree.leaves(pn)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(flat1, flatn)
    )
    assert worst < 1e-4, f"params diverged across shardings: {worst}"


@pytest.mark.parametrize("n_dev", [4])
def test_sharded_eval_matches_single_device(n_dev):
    """Batch-sharded eval (decode + NMS on device) must produce the same
    detections as the single-device run (ref eval.py:61 DataParallel eval)."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    from unav_yolyolva_tpu.train import make_eval_step

    cfg = tiny_cfg()
    cfg["test_cfg"].update(
        {"pre_nms_topk": 50, "max_seg_num": 10, "min_score": 0.001}
    )
    cfg["model"]["test_cfg"] = cfg["test_cfg"]
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    b = 4
    batch = make_np_batch(b)
    # de-duplicate rows so per-device shards see different data
    batch["visual"] += np.random.default_rng(7).normal(
        size=batch["visual"].shape
    ).astype(np.float32)
    batch.update({
        "fps": np.full((b,), 25.0, np.float32),
        "duration": np.full((b,), 18.0, np.float32),
        "feat_stride": np.full((b,), 8.0, np.float32),
        "feat_num_frames": np.full((b,), 24.0, np.float32),
    })
    dummy = {
        "visual": jnp.asarray(batch["visual"]),
        "audio": jnp.asarray(batch["audio"]),
        "mask": jnp.asarray(batch["mask"]),
        "m_scores": jnp.zeros((b, T)),
        "m_start_end": jnp.zeros((b, T)),
        "m_labels": jnp.zeros((b, T, NCLS)),
    }
    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(rng, dummy)
    tx, _ = make_optimizer(params, cfg["opt"], 10)

    def run(mesh):
        state = create_train_state(
            jax.tree.map(jnp.array, params), tx, 250.0, mesh=mesh
        )
        step = make_eval_step(model, cfg, mesh=mesh, use_ema=True)
        db = shard_batch(batch, mesh) if mesh else batch
        dets, losses = step(state, db)
        return jax.device_get(dets), {k: float(v) for k, v in losses.items()}

    d1, l1 = run(make_mesh(1))
    dn, ln = run(make_mesh(n_dev))

    np.testing.assert_allclose(l1["final_loss"], ln["final_loss"], rtol=1e-4)
    np.testing.assert_array_equal(d1["valid"], dn["valid"])
    ok = d1["valid"]
    np.testing.assert_array_equal(d1["labels"][ok], dn["labels"][ok])
    np.testing.assert_allclose(
        d1["segments"][ok], dn["segments"][ok], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        d1["scores"][ok], dn["scores"][ok], rtol=1e-4, atol=1e-5
    )
