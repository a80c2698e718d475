"""Evaluation CLI.

Mirrors the reference entry point (`/root/reference/eval.py`):
    python eval.py <config.yaml> <ckpt_dir_or_folder> [--topk K] [--saveonly]
Loads the EMA weights from the checkpoint and runs the jitted eval step
(forward + decode + on-device Soft-NMS) over the test split, reporting
per-tIoU and average mAP.
"""

from __future__ import annotations

import argparse
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
        make_optimizer,
        valid_one_epoch,
    )
    from unav_yolyolva_tpu.train.checkpoint import find_latest_checkpoint
    from unav_yolyolva_tpu.utils import fix_random_seed

    # multi-host eval over DCN: same env protocol as train.py
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    elif os.environ.get("JAX_DISTRIBUTED_AUTO"):
        jax.distributed.initialize()

    if not os.path.isfile(args.config):
        raise ValueError("Config file does not exist.")
    cfg = load_config(args.config)
    assert len(cfg["test_split"]) > 0, "Test set must be specified!"

    torch_ckpt = None
    if args.ckpt.endswith(".pth.tar"):
        # a reference PyTorch checkpoint: convert its EMA weights in place
        assert os.path.isfile(args.ckpt), "CKPT file does not exist!"
        torch_ckpt = args.ckpt
        ckpt_dir = None
    else:
        # find_latest_checkpoint returns the folder itself when it IS a
        # checkpoint dir (contains meta.json), else the newest inside
        ckpt_dir = find_latest_checkpoint(args.ckpt)
        assert ckpt_dir is not None, "no checkpoint found"

    if args.topk > 0:
        cfg["test_cfg"]["max_seg_num"] = args.topk
        cfg["model"]["test_cfg"] = cfg["test_cfg"]
    pprint(cfg)

    rng = fix_random_seed(0)

    # batch-sharded DP eval over the device mesh (ref eval.py:61 DataParallel)
    mesh = make_mesh(cfg["tpu"]["num_devices"])

    val_dataset = UnAV100Dataset(False, cfg["test_split"], **cfg["dataset"])
    if len(val_dataset) == 0:
        raise ValueError(
            f"test_split {cfg['test_split']} matched no videos in "
            f"{cfg['dataset']['json_file']} — check the 'subset' fields."
        )
    # mesh passed so multi-host eval loads only this process's rows
    val_batcher = make_batcher(val_dataset, cfg, False, mesh=mesh)

    model = build_model(cfg)
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
    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(rng, dummy)
    tx, _ = make_optimizer(params, cfg["opt"], 1)
    state = create_train_state(params, tx, cfg["train_cfg"]["init_loss_norm"],
                               mesh=mesh)

    if torch_ckpt is not None:
        print(f"=> converting reference checkpoint '{torch_ckpt}' (EMA weights)")
        import torch
        from unav_yolyolva_tpu.utils.torch_convert import (
            torch_state_dict_to_params,
        )

        ckpt = torch.load(torch_ckpt, map_location="cpu")
        sd = ckpt.get("state_dict_ema", ckpt.get("state_dict"))
        converted = torch_state_dict_to_params(
            sd, arch=tuple(cfg["model"]["backbone_arch"])
        )
        state = state.replace(ema_params=converted)
    else:
        print(f"=> loading checkpoint '{ckpt_dir}' (EMA weights)")
        state = load_checkpoint(ckpt_dir, state)["state"]

    det_eval, output_file = None, None
    if not args.saveonly:
        det_eval = ANETdetection(
            val_dataset.json_file,
            val_dataset.split[0],
            tiou_thresholds=val_dataset.get_attributes()["tiou_thresholds"],
        )
    else:
        out_root = ckpt_dir or os.path.dirname(torch_ckpt)
        output_file = os.path.join(out_root, "eval_results.pkl")

    # detections only, like the reference's eval.py (no val losses) — the
    # loss path incl. contrastive-pair selection is DCE'd by XLA
    eval_step = make_eval_step(model, cfg, mesh=mesh, use_ema=True,
                               with_losses=False)
    # multi-host: AOT-compile + barrier before the first executed collective
    # (no-op on a single process)
    from unav_yolyolva_tpu.train import precompile_eval_step

    eval_step = precompile_eval_step(eval_step, state, cfg, mesh)
    print(f"\nStart testing model {cfg['model_name']} ...")
    start = time.time()
    mAP, _ = valid_one_epoch(
        state, val_batcher, eval_step, -1,
        mesh=mesh, evaluator=det_eval, output_file=output_file,
        ext_score_file=cfg["test_cfg"]["ext_score_file"],
        print_freq=args.print_freq,
    )
    print(f"All done! Total time: {time.time() - start:0.2f} sec")
    return mAP


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Evaluate the TPU-native audio-visual event localizer"
    )
    parser.add_argument("config", type=str)
    parser.add_argument("ckpt", type=str)
    parser.add_argument("--topk", default=-1, type=int)
    parser.add_argument("--saveonly", action="store_true")
    parser.add_argument("--print-freq", default=10, type=int)
    main(parser.parse_args())
