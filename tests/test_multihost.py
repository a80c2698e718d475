"""Multi-host data parallelism: 2 real processes over DCN-style gloo.

Spawns two jax.distributed CPU processes (4 virtual devices each, one
8-device global mesh) that train one epoch through the production path —
per-process Batcher row slicing, shard_batch via
make_array_from_process_local_data, the sharded train step — and asserts
both processes agree AND match a single-process 8-device run on the same
global batches (SURVEY §2: "multi-host DP over DCN via
jax.distributed.initialize + the same pjit program"; exceeds the
reference's single-host DataParallel ceiling, /root/reference/train.py:119).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from unav_yolyolva_tpu.core.config import load_config_dict

T = 64


def shared_cfg(root: str):
    """Config shared by the workers and the single-process baseline."""
    return load_config_dict({
        "dataset": {
            "json_file": os.path.join(root, "annotations.json"),
            "feat_folder": os.path.join(root, "features"),
            "num_classes": 5,
            "max_seq_len": T,
            "max_num_events": 8,
            # deterministic loading: the random-crop RNG stream is consumed
            # per process, so stochastic aug would make the 2-process run
            # see (legitimately) different crops than the 1-process run
            "crop_ratio": None,
        },
        # global batch 8 -> 4 rows per process -> 1 row per device
        "loader": {"batch_size": 8, "num_workers": 1},
        "model": {
            "raw_input_dim_V": 64, "raw_input_dim_A": 16,
            "input_dim_V": 32, "input_dim_A": 32,
            "embd_dim": 32, "head_dim": 32,
            "use_abs_pe": True, "class_aware": True,
        },
        # SGD + droppath 0 so cross-process equivalence is tight (same
        # rationale as tests/test_parallel.py)
        "opt": {"learning_rate": 1e-2, "epochs": 1, "warmup_epochs": 0,
                "warmup": False, "type": "SGD", "momentum": 0.9,
                "weight_decay": 0.0},
        "train_cfg": {"loss_weight": 1, "droppath": 0.0},
        "test_cfg": {
            "pre_nms_topk": 100, "max_seg_num": 20, "min_score": 0.001,
            "nms_sigma": 0.4, "iou_threshold": 0.7,
        },
    })


def eval_cfg(root: str):
    """Eval-phase config: batch 12 over the 8-device mesh, so full batches
    pad 12->16 and the partial final batch pads 2->16 (same compiled
    shape)."""
    cfg = shared_cfg(root)
    cfg["loader"]["batch_size"] = 12
    return cfg


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from unav_yolyolva_tpu.data import synthetic

    root = tmp_path_factory.mktemp("mh")
    # 28 videos -> 14 train (one full global train batch) / 14 val: with
    # the eval batch of 12 the val epoch is one full batch + a 2-video
    # PARTIAL batch, which must be padded to the AOT-compiled b_star=16
    # (not the next mesh multiple, 8) — the regression the round-3 review
    # found
    synthetic.make_synthetic_dataset(
        str(root), num_videos=28, num_classes=5, min_len=40, max_len=T,
        visual_dim=64, audio_dim=16, seed=5, events_per_video=2,
    )
    return str(root)


@pytest.fixture(scope="module")
def worker_results(synth_root, tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("mh_out")
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs, outs = [], []
    for pid in range(2):
        out = os.path.join(str(out_dir), f"p{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port),
             synth_root, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [json.load(open(o)) for o in outs]


@pytest.fixture(scope="module")
def single_process_baseline(synth_root):
    """Same epoch on one process with 8 local devices."""
    import jax
    import jax.numpy as jnp

    from unav_yolyolva_tpu.data import UnAV100Dataset, make_batcher
    from unav_yolyolva_tpu.models import build_model
    from unav_yolyolva_tpu.parallel import make_mesh
    from unav_yolyolva_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
        train_one_epoch,
    )

    from unav_yolyolva_tpu.eval.metrics import ANETdetection
    from unav_yolyolva_tpu.train import make_eval_step, valid_one_epoch

    cfg = shared_cfg(synth_root)
    mesh = make_mesh()
    ds = UnAV100Dataset(True, ("train",), **cfg["dataset"])
    batcher = make_batcher(ds, cfg, True, seed=7)
    model = build_model(cfg)
    dummy = {
        "visual": jnp.zeros((2, T, 64)), "audio": jnp.zeros((2, T, 16)),
        "mask": jnp.ones((2, T), bool), "m_scores": jnp.zeros((2, T)),
        "m_start_end": jnp.zeros((2, T)),
        "m_labels": jnp.zeros((2, T, 5)),
    }
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(rng, dummy)
    tx, schedule = make_optimizer(params, cfg["opt"], len(batcher))
    state = create_train_state(params, tx, cfg["train_cfg"]["init_loss_norm"],
                               mesh=mesh)
    train_step = make_train_step(model, tx, cfg, mesh=mesh)
    state, losses = train_one_epoch(
        state, batcher, train_step, rng, 0, mesh=mesh, print_freq=1000,
        schedule=schedule,
    )
    ecfg = eval_cfg(synth_root)
    val_ds = UnAV100Dataset(False, ("validation",), **ecfg["dataset"])
    val_batcher = make_batcher(val_ds, ecfg, False)
    eval_step = make_eval_step(model, ecfg, mesh=mesh, use_ema=True)
    evaluator = ANETdetection(
        cfg["dataset"]["json_file"], "validation",
        tiou_thresholds=np.linspace(0.1, 0.9, 9), num_workers=1,
    )
    mAP, _ = valid_one_epoch(
        state, val_batcher, eval_step, 0, mesh=mesh, evaluator=evaluator,
        print_freq=1000,
    )
    return {
        "losses": {k: float(v) for k, v in losses.items()},
        "step": int(jax.device_get(state.step)),
        "param_sum": float(
            sum(float(jnp.sum(x)) for x in jax.tree.leaves(state.params))
        ),
        "mAP": float(mAP),
    }


def test_processes_agree(worker_results):
    r0, r1 = worker_results
    assert r0["step"] == r1["step"] > 0
    for k, v in r0["losses"].items():
        np.testing.assert_allclose(r1["losses"][k], v, rtol=1e-5, err_msg=k)
    np.testing.assert_allclose(r1["param_sum"], r0["param_sum"], rtol=1e-5)
    np.testing.assert_allclose(r1["mAP"], r0["mAP"], rtol=1e-9)


def test_matches_single_process(worker_results, single_process_baseline):
    r0 = worker_results[0]
    base = single_process_baseline
    assert r0["step"] == base["step"]
    for k, v in base["losses"].items():
        np.testing.assert_allclose(
            r0["losses"][k], v, rtol=1e-4, atol=1e-6, err_msg=k
        )
    np.testing.assert_allclose(
        r0["param_sum"], base["param_sum"], rtol=1e-4
    )
    # eval end-to-end: same mAP through the multi-host replicated-dets
    # harvest as through the single-process batch-sharded one
    np.testing.assert_allclose(r0["mAP"], base["mAP"], atol=1e-4)
