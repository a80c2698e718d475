"""Training CLI.

Mirrors the reference entry point (`/root/reference/train.py`):
    python train.py <config.yaml> [--output NAME] [--resume CKPT_DIR]
Builds datasets/batchers, the flax model + optax optimizer, then runs the
jitted data-parallel train step over a jax.sharding.Mesh, evaluating every
eval_freq epochs and checkpointing the best mAP model.
"""

from __future__ import annotations

import argparse
import datetime
import os
import time
from pprint import pprint

import jax


def main(args):
    from unav_yolyolva_tpu.core import load_config
    from unav_yolyolva_tpu.data import UnAV100Dataset, make_batcher
    from unav_yolyolva_tpu.eval.metrics import ANETdetection
    from unav_yolyolva_tpu.models import build_model
    from unav_yolyolva_tpu.parallel import make_mesh
    from unav_yolyolva_tpu.train import (
        create_train_state,
        load_checkpoint,
        make_eval_step,
        precompile_eval_step,
        precompile_train_step,
        make_optimizer,
        make_train_step,
        save_checkpoint,
        train_one_epoch,
        valid_one_epoch,
    )
    from unav_yolyolva_tpu.utils import fix_random_seed

    # multi-host data parallelism: same jitted program over DCN. Explicit
    # env triple (any host), or automatic detection on managed clusters
    # (Cloud TPU pods / SLURM / OMPI) via JAX_DISTRIBUTED_AUTO=1.
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    elif os.environ.get("JAX_DISTRIBUTED_AUTO"):
        jax.distributed.initialize()
    # on a multi-host run only process 0 writes checkpoints/logs; every
    # process trains the same jitted program over the global mesh
    is_main = jax.process_index() == 0

    if not os.path.isfile(args.config):
        raise ValueError("Config file does not exist.")
    cfg = load_config(args.config)
    if is_main:
        pprint(cfg)

    # ckpt folder named from key hyperparams + timestamp (train.py:52-72)
    m = cfg["model"]
    model_name = (
        f"tpu_{cfg['opt']['epochs']}_epochs"
        f"_inter_{m['inter_contr_weight']}_intra_{m['intra_contr_weight']}"
        f"_score_v_{m['score_V_weight']}_score_a_{m['score_A_weight']}"
        f"_batch_{cfg['loader']['batch_size']}"
    )
    os.makedirs(cfg["output_folder"], exist_ok=True)
    ts = int(time.time())
    if jax.process_count() > 1:
        # all processes must agree on the timestamped folder name (shared
        # filesystem assumed for multi-host checkpoints, as is standard)
        import numpy as _np
        from jax.experimental import multihost_utils

        ts = int(multihost_utils.broadcast_one_to_all(_np.int64(ts)))
    suffix = args.output or str(
        datetime.datetime.fromtimestamp(ts)
    ).replace(" ", "_")
    ckpt_folder = os.path.join(cfg["output_folder"], f"{model_name}_{suffix}")
    os.makedirs(ckpt_folder, exist_ok=True)

    tb_writer = None
    if is_main:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_writer = SummaryWriter(os.path.join(ckpt_folder, "logs"))
        except Exception:
            pass

    rng = fix_random_seed(cfg["init_rand_seed"])

    mesh = make_mesh(cfg["tpu"]["num_devices"])
    num_shards = mesh.devices.size
    assert cfg["loader"]["batch_size"] % num_shards == 0, (
        f"batch_size {cfg['loader']['batch_size']} must divide over "
        f"{num_shards} data-parallel shards"
    )
    # LR scaled by number of data-parallel shards (train.py:80)
    cfg["opt"]["learning_rate"] *= num_shards

    train_dataset = UnAV100Dataset(True, cfg["train_split"], **cfg["dataset"])
    cfg["train_cfg"]["head_empty_cls"] = train_dataset.get_attributes()[
        "empty_label_ids"
    ]
    cfg["model"]["train_cfg"] = cfg["train_cfg"]
    train_batcher = make_batcher(
        train_dataset, cfg, True, seed=cfg["init_rand_seed"] & 0x7FFFFFFF
    )

    det_eval, val_batcher = None, None
    if cfg["train_cfg"]["evaluate"]:
        val_dataset = UnAV100Dataset(False, cfg["val_split"], **cfg["dataset"])
        # mesh passed so multi-host eval loads only this process's rows
        val_batcher = make_batcher(val_dataset, cfg, False, mesh=mesh)
        det_eval = ANETdetection(
            val_dataset.json_file,
            val_dataset.split[0],
            tiou_thresholds=val_dataset.get_attributes()["tiou_thresholds"],
        )

    model = build_model(cfg)

    # init params with a dummy batch shaped like the real ones
    import numpy as np
    import jax.numpy as jnp

    b, t = cfg["loader"]["batch_size"], cfg["dataset"]["max_seq_len"]
    dummy = {
        "visual": jnp.zeros((b, t, cfg["model"].get("raw_input_dim_V", 2048))),
        "audio": jnp.zeros((b, t, cfg["model"].get("raw_input_dim_A", 128))),
        "mask": jnp.ones((b, t), bool),
        "m_scores": jnp.zeros((b, t)),
        "m_start_end": jnp.zeros((b, t)),
        "m_labels": jnp.zeros((b, t, cfg["model"]["num_classes"])),
    }
    init_key = jax.random.fold_in(rng, 0)
    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(init_key, dummy)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"Model parameters: {n_params / 1e6:.2f}M on {num_shards} device(s)")

    tx, schedule = make_optimizer(
        params, cfg["opt"], len(train_batcher),
        clip_grad_l2norm=cfg["train_cfg"]["clip_grad_l2norm"],
        local_batch=cfg["loader"]["batch_size"] // num_shards,
    )
    state = create_train_state(params, tx, cfg["train_cfg"]["init_loss_norm"],
                               mesh=mesh)

    start_epoch = 0
    resumed_best_mAP = 0.0
    if args.resume:
        restored = load_checkpoint(args.resume, state)
        state, start_epoch = restored["state"], restored["epoch"] + 1
        # restore the best-so-far mAP so the first post-resume eval cannot
        # clobber a better pre-resume model_best
        resumed_best_mAP = float(restored["meta"].get("best_mAP", 0.0))
        print(f"=> loaded checkpoint '{args.resume}' (epoch {start_epoch - 1},"
              f" best mAP so far {resumed_best_mAP:.4f})")

    if is_main:
        with open(os.path.join(ckpt_folder, "config.txt"), "w") as fid:
            pprint(cfg, stream=fid)

    # wandb experiment logging, gated exactly like the reference
    # (train.py:181-189: enabled unless a debugger is attached) and
    # additionally on wandb being importable in this environment
    from unav_yolyolva_tpu.utils import debugger_is_active

    wandb_run = None
    if is_main and not debugger_is_active():
        try:
            import wandb

            wandb_run = wandb.init(
                project="DEL_UnAV",
                group="training_alignment_contrastive_yolyolVA_tpu",
                name=model_name,
                config=vars(args),
            )
        except Exception:
            wandb_run = None

    train_step = make_train_step(model, tx, cfg, mesh=mesh)
    eval_step = make_eval_step(model, cfg, mesh=mesh, use_ema=True)
    # multi-host: AOT-compile + barrier before the first executed collective
    # (no-ops on a single process) — see train/step.py:precompile_train_step
    train_step = precompile_train_step(train_step, state, cfg, mesh, rng)
    if cfg["train_cfg"]["evaluate"]:
        eval_step = precompile_eval_step(eval_step, state, cfg, mesh)

    # early_stop_epochs overrides the full schedule length (ref train.py:195)
    max_epochs = cfg["opt"].get(
        "early_stop_epochs", cfg["opt"]["epochs"] + cfg["opt"]["warmup_epochs"]
    )
    best_mAP = resumed_best_mAP
    print(f"\nStart training model {cfg['model_name']} ...")
    for epoch in range(start_epoch, max_epochs):
        state, train_stats = train_one_epoch(
            state, train_batcher, train_step, rng, epoch,
            mesh=mesh, tb_writer=tb_writer, print_freq=args.print_freq,
            schedule=schedule,
        )
        if (epoch + 1) % cfg["train_cfg"]["eval_freq"] == 0 or (
            epoch == max_epochs - 1
        ):
            if cfg["train_cfg"]["evaluate"]:
                t0 = time.time()
                avg_mAP, val_losses = valid_one_epoch(
                    state, val_batcher, eval_step, epoch,
                    mesh=mesh, evaluator=det_eval, tb_writer=tb_writer,
                    print_freq=args.print_freq,
                )
                print(f"evaluation done! Total time: {time.time() - t0:0.2f} sec")
                if avg_mAP > best_mAP:
                    best_mAP = avg_mAP
                    if is_main:
                        save_checkpoint(state, epoch, ckpt_folder,
                                        is_best=True,
                                        extra_meta={"best_mAP": best_mAP})
                if wandb_run is not None:
                    wandb_run.log(
                        {"val_epoch_mAP": avg_mAP}, step=epoch
                    )
        if wandb_run is not None:
            wandb_run.log(
                {f"train_epoch_{k}": v for k, v in train_stats.items()},
                step=epoch,
            )
        if is_main and (
            (epoch == max_epochs - 1)
            or (args.ckpt_freq > 0 and epoch % args.ckpt_freq == 0
                and epoch > 0)
        ):
            save_checkpoint(
                state, epoch, ckpt_folder, file_name=f"epoch_{epoch:03d}"
            )

    # reload the best checkpoint and re-evaluate it (ref train.py:274-300).
    # Quirk parity: the reference loads `state_dict` (the RAW weights, not the
    # EMA) for this final pass, unlike eval.py which always uses the EMA.
    best_dir = os.path.join(ckpt_folder, "model_best")
    do_final = cfg["train_cfg"]["evaluate"] and os.path.isdir(best_dir)
    if jax.process_count() > 1:
        # the decision must be COLLECTIVE: a process that skipped while
        # others entered the sharded eval would deadlock the collectives.
        # Process 0 (the checkpoint writer) decides.
        import numpy as _np
        from jax.experimental import multihost_utils

        do_final = bool(
            multihost_utils.broadcast_one_to_all(_np.int32(do_final))
        )
    if do_final:
        print("Loading the best model ...")
        restored = load_checkpoint(best_dir, state)
        final_eval_step = make_eval_step(model, cfg, mesh=mesh, use_ema=False)
        final_eval_step = precompile_eval_step(
            final_eval_step, restored["state"], cfg, mesh
        )
        print(f"\nStart evaluating model {cfg['model_name']} ...")
        t0 = time.time()
        valid_one_epoch(
            restored["state"], val_batcher, final_eval_step,
            restored["epoch"], mesh=mesh, evaluator=det_eval,
            tb_writer=tb_writer, print_freq=args.print_freq,
        )
        print(f"evaluation done! Total time: {time.time() - t0:0.2f} sec")

    print(f"Best mAP: {best_mAP:0.4f}")
    if tb_writer is not None:
        tb_writer.close()
    if wandb_run is not None:
        wandb_run.finish()
    print("All done!")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Train the TPU-native audio-visual event localizer"
    )
    parser.add_argument("config", metavar="DIR", help="path to a config file")
    parser.add_argument("-p", "--print-freq", default=20, type=int)
    parser.add_argument("-c", "--ckpt-freq", default=20, type=int)
    parser.add_argument("--output", default="", type=str)
    parser.add_argument("--resume", default=None, type=str, metavar="PATH")
    main(parser.parse_args())
