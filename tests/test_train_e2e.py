"""End-to-end slice: synthetic data -> jitted sharded train step -> eval with
decode/NMS/mAP -> checkpoint round-trip. Tiny config, 2-device mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unav_yolyolva_tpu.core.config import load_config_dict
from unav_yolyolva_tpu.data import UnAV100Dataset, make_batcher, synthetic
from unav_yolyolva_tpu.eval.metrics import ANETdetection
from unav_yolyolva_tpu.models import build_model
from unav_yolyolva_tpu.parallel import make_mesh
from unav_yolyolva_tpu.train import (
    create_train_state,
    load_checkpoint,
    make_eval_step,
    make_optimizer,
    make_train_step,
    save_checkpoint,
    train_one_epoch,
    valid_one_epoch,
)

T, NCLS = 64, 5


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    synth = synthetic.make_synthetic_dataset(
        str(root), num_videos=8, num_classes=NCLS, min_len=40, max_len=T,
        visual_dim=64, audio_dim=16, seed=3, events_per_video=2,
    )
    cfg = load_config_dict({
        "dataset": {
            "json_file": synth["json_file"],
            "feat_folder": synth["feat_folder"],
            "num_classes": NCLS,
            "max_seq_len": T,
            "max_num_events": 8,
        },
        "loader": {"batch_size": 4, "num_workers": 1},
        "model": {
            "raw_input_dim_V": 64, "raw_input_dim_A": 16,
            "input_dim_V": 32, "input_dim_A": 32,
            "embd_dim": 32, "head_dim": 32,
            "use_abs_pe": True, "class_aware": True,
        },
        "opt": {"learning_rate": 1e-3, "epochs": 1, "warmup_epochs": 1},
        "train_cfg": {"loss_weight": 1, "eval_freq": 1},
        "test_cfg": {
            "pre_nms_topk": 100, "max_seg_num": 20, "min_score": 0.001,
            "nms_sigma": 0.4, "iou_threshold": 0.7,
        },
    })
    return synth, cfg


@pytest.fixture(scope="module")
def trained(setup):
    synth, cfg = setup
    mesh = make_mesh(2)

    train_ds = UnAV100Dataset(True, ("train",), **cfg["dataset"])
    train_b = make_batcher(train_ds, cfg, True, seed=1)
    model = build_model(cfg)

    rng = jax.random.PRNGKey(0)
    b, t = 4, T
    import jax.numpy as jnp

    dummy = {
        "visual": jnp.zeros((b, t, 64)), "audio": jnp.zeros((b, t, 16)),
        "mask": jnp.ones((b, t), bool), "m_scores": jnp.zeros((b, t)),
        "m_start_end": jnp.zeros((b, t)),
        "m_labels": jnp.zeros((b, t, NCLS)),
    }
    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(rng, dummy)
    tx, schedule = make_optimizer(params, cfg["opt"], len(train_b))
    state = create_train_state(params, tx, cfg["train_cfg"]["init_loss_norm"])
    train_step = make_train_step(model, tx, cfg, mesh=mesh)

    # two epochs: with per-iteration warmup the very first optimizer step
    # uses lr=0 (reference scheduler semantics), so params only move from
    # the second step on
    for epoch in range(2):
        state, losses = train_one_epoch(
            state, train_b, train_step, rng, epoch, mesh=mesh, print_freq=1,
            schedule=schedule,
        )
    return cfg, model, state, losses, mesh


def test_train_updates_state(trained):
    cfg, model, state, losses, mesh = trained
    assert int(jax.device_get(state.step)) == 2  # 2 epochs x 1 batch
    assert np.isfinite(losses.get("final_loss", np.nan))
    # loss normalizer moved off its init
    assert float(jax.device_get(state.loss_normalizer)) != 250.0
    # EMA differs from params now
    p = jax.tree.leaves(state.params)[0]
    e = jax.tree.leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))


def test_eval_produces_map(trained):
    cfg, model, state, _, mesh = trained
    val_ds = UnAV100Dataset(False, ("validation",), **cfg["dataset"])
    val_b = make_batcher(val_ds, cfg, False)
    ev = ANETdetection(
        val_ds.json_file, "validation",
        tiou_thresholds=np.linspace(0.1, 0.9, 9), num_workers=1,
    )
    eval_step = make_eval_step(model, cfg, use_ema=True)
    mAP, losses = valid_one_epoch(
        state, val_b, eval_step, 0, evaluator=ev, print_freq=100,
    )
    assert 0.0 <= mAP <= 1.0
    assert np.isfinite(float(losses["final_loss"]))


def test_eval_without_losses_same_detections(trained):
    """with_losses=False (the reference's inference protocol; loss path
    DCE'd) must produce EXACTLY the detections of the default step."""
    cfg, model, state, _, mesh = trained
    val_ds = UnAV100Dataset(False, ("validation",), **cfg["dataset"])
    val_b = make_batcher(val_ds, cfg, False)
    batch = next(iter(val_b))
    db = {
        k: jnp.asarray(v) for k, v in batch.items() if k != "video_id"
    }
    full = make_eval_step(model, cfg, use_ema=True)
    lean = make_eval_step(model, cfg, use_ema=True, with_losses=False)
    dets_f, losses_f = full(state, db)
    dets_l, losses_l = lean(state, db)
    assert losses_l == {}
    assert np.isfinite(float(losses_f["final_loss"]))
    for k in dets_f:
        np.testing.assert_array_equal(
            np.asarray(dets_f[k]), np.asarray(dets_l[k]), err_msg=k
        )


def test_checkpoint_roundtrip(trained, tmp_path):
    cfg, model, state, _, mesh = trained
    folder = str(tmp_path / "ckpt")
    d = save_checkpoint(state, epoch=0, folder=folder, is_best=False,
                        file_name="epoch_000")
    restored = load_checkpoint(d, state)
    assert restored["epoch"] == 0
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored["state"].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # best checkpoint drops optimizer state
    d2 = save_checkpoint(state, epoch=0, folder=folder, is_best=True)
    assert not os.path.exists(os.path.join(d2, "opt_state.msgpack"))
    restored2 = load_checkpoint(d2, state)
    for a, b in zip(jax.tree.leaves(state.ema_params),
                    jax.tree.leaves(restored2["state"].ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_atomicity(trained, tmp_path):
    """Overwriting saves leave no staging debris, and a partially-written
    (crashed) save is never selected by find_latest_checkpoint."""
    import json

    from unav_yolyolva_tpu.train.checkpoint import find_latest_checkpoint

    cfg, model, state, _, mesh = trained
    folder = str(tmp_path / "ckpt")
    save_checkpoint(state, epoch=0, folder=folder, is_best=True)
    save_checkpoint(state, epoch=1, folder=folder, is_best=True)  # overwrite
    assert sorted(os.listdir(folder)) == ["model_best"]
    restored = load_checkpoint(os.path.join(folder, "model_best"), state)
    assert restored["epoch"] == 1

    # simulate a crash mid-save: a complete staging dir that never got
    # renamed, plus a torn dir with no meta.json
    tmp_dir = os.path.join(folder, "zz_epoch_005.tmp")
    os.makedirs(tmp_dir)
    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        json.dump({"epoch": 5}, f)
    os.makedirs(os.path.join(folder, "zz_epoch_006"))  # no meta.json yet
    picked = find_latest_checkpoint(folder)
    assert picked == os.path.join(folder, "model_best")

    # crash in the swap window between the two renames: <name> gone,
    # only <name>.old (the last COMPLETE checkpoint) left behind —
    # find_latest_checkpoint must restore and select it
    os.rename(os.path.join(folder, "model_best"),
              os.path.join(folder, "model_best.old"))
    picked = find_latest_checkpoint(folder)
    assert picked == os.path.join(folder, "model_best")
    assert os.path.exists(os.path.join(folder, "model_best", "meta.json"))
    restored = load_checkpoint(picked, state)
    assert restored["epoch"] == 1


def test_decay_mask_rules(trained):
    from unav_yolyolva_tpu.train.optim import decay_mask

    cfg, model, state, _, _ = trained
    mask = decay_mask(state.params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]

    def find(substrs, leaf):
        for path, v in flat:
            names = [p.key for p in path if hasattr(p, "key")]
            if all(any(s in n for n in names) for s in substrs) and names[-1] == leaf:
                return v
        raise KeyError((substrs, leaf))

    # alignment: everything but bias decays (incl. pos embeds + LN scales)
    assert find(["alignment", "pos_embed_video"], "pos_embed_video") is True
    assert find(["alignment", "norm_video"], "scale") is True
    assert find(["alignment", "norm_video"], "bias") is False
    # contrastive scales never decay
    assert find(["contrastive"], "logit_scale_inter") is False
    # backbone convs decay, channel-LN does not
    assert find(["backbone", "embd_V_0"], "kernel") is True
    assert find(["backbone", "embd_norm_V_0"], "weight") is False
    # reg head per-level scales no decay
    assert find(["reg_head", "scale_0"], "scale") is False
