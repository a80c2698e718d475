"""Worker process for the multi-host DP test (tests/test_multihost.py).

Run as:  python tests/_multihost_worker.py <pid> <nproc> <port> <root> <out>

Joins a jax.distributed cluster of <nproc> CPU processes (4 virtual
devices each), builds the shared synthetic dataset at <root>, trains ONE
epoch through the production path — make_batcher (per-process row
slicing) -> train_one_epoch -> _device_batch -> shard_batch
(make_array_from_process_local_data) -> sharded train step — and writes
the resulting losses + step count to <out> as JSON.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    pid, nproc, port, root, out = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
        sys.argv[4], sys.argv[5],
    )
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid,
    )
    assert jax.process_count() == nproc

    import jax.numpy as jnp

    from tests.test_multihost import shared_cfg
    from unav_yolyolva_tpu.data import UnAV100Dataset, make_batcher
    from unav_yolyolva_tpu.models import build_model
    from unav_yolyolva_tpu.parallel import make_mesh
    from unav_yolyolva_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
        train_one_epoch,
    )

    cfg = shared_cfg(root)
    mesh = make_mesh()  # all 8 global devices
    ds = UnAV100Dataset(True, ("train",), **cfg["dataset"])
    batcher = make_batcher(ds, cfg, True, seed=7)

    model = build_model(cfg)
    t = cfg["dataset"]["max_seq_len"]
    dummy = {
        "visual": jnp.zeros((2, t, 64)), "audio": jnp.zeros((2, t, 16)),
        "mask": jnp.ones((2, t), bool), "m_scores": jnp.zeros((2, t)),
        "m_start_end": jnp.zeros((2, t)),
        "m_labels": jnp.zeros((2, t, cfg["dataset"]["num_classes"])),
    }
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(rng, dummy)
    tx, schedule = make_optimizer(params, cfg["opt"], len(batcher))
    state = create_train_state(params, tx, cfg["train_cfg"]["init_loss_norm"],
                               mesh=mesh)
    train_step = make_train_step(model, tx, cfg, mesh=mesh)
    # production multi-host hardening: AOT-compile + barrier so both
    # processes enter the first collective's rendezvous together
    from unav_yolyolva_tpu.train import (
        make_eval_step,
        precompile_eval_step,
        precompile_train_step,
        valid_one_epoch,
    )

    train_step = precompile_train_step(train_step, state, cfg, mesh, rng)

    state, losses = train_one_epoch(
        state, batcher, train_step, rng, 0, mesh=mesh, print_freq=1000,
        schedule=schedule,
    )

    # multi-host EVAL: global batches on every process, padded + locally
    # sliced by _device_batch, detections replicated for the harvest; the
    # final 2-video batch exercises the pad path
    from tests.test_multihost import eval_cfg
    from unav_yolyolva_tpu.eval.metrics import ANETdetection

    # eval batch 12: full batches pad 12->16 and the final 2-video batch
    # pads 2->16 — the SAME AOT-compiled shape, proving the fixed-shape
    # contract across processes
    ecfg = eval_cfg(root)
    val_ds = UnAV100Dataset(False, ("validation",), **ecfg["dataset"])
    # mesh passed => per-process eval IO: this process loads only its own
    # row block of every padded batch (round-4: de-duplicated eval IO)
    val_batcher = make_batcher(val_ds, ecfg, False, mesh=mesh)
    assert val_batcher.rows_local, "2-proc eval must take the local-IO path"
    eval_step = make_eval_step(model, ecfg, mesh=mesh, use_ema=True)
    eval_step = precompile_eval_step(eval_step, state, ecfg, mesh)
    import numpy as np

    evaluator = ANETdetection(
        cfg["dataset"]["json_file"], "validation",
        tiou_thresholds=np.linspace(0.1, 0.9, 9), num_workers=1,
    )
    mAP, _ = valid_one_epoch(
        state, val_batcher, eval_step, 0, mesh=mesh, evaluator=evaluator,
        print_freq=1000,
    )

    result = {
        "losses": {k: float(v) for k, v in losses.items()},
        "step": int(jax.device_get(state.step)),
        "param_sum": float(
            sum(float(jnp.sum(x)) for x in jax.tree.leaves(state.params))
        ),
        "mAP": float(mAP),
    }
    with open(out, "w") as f:
        json.dump(result, f)
    print(f"worker {pid} done: {result}", flush=True)


if __name__ == "__main__":
    main()
