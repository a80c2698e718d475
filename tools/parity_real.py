"""Real-data mAP parity runbook: reference (PyTorch CPU) vs this framework.

The ONE unproven claim of the synthetic-parity chain (converter ->
numerical parity -> eval-tail parity -> golden fixture) is real UnAV-100
mAP against the released checkpoint (BASELINE.md step 0; checkpoint link
/root/reference/README.md:44). The dataset features and the released
`.pth.tar` are not in this environment, so this tool stands ready: the
moment both are available, ONE command produces the side-by-side
per-tIoU mAP tables and a pass/fail verdict.

    python tools/parity_real.py \
        --json-file  /data/unav100/annotations.json \
        --feat-folder /data/unav100/features \
        --ckpt       /data/ckpts/model_best.pth.tar \
        [--split test] [--tolerance 0.003] [--ref-batch 8] [--skip-reference]

What it runs:
  (a) the REFERENCE pipeline on CPU — its actual model, inference(),
      batched_nms (via the functional nms_1d_cpu stand-in backed by
      native/nms1d.c), postprocessing() and pandas ANETdetection
      (/root/reference/eval.py:22-122 semantics, driven directly so no
      CUDA/DataParallel is required);
  (b) OUR eval CLI (eval.py main()) on the same config + checkpoint —
      the exact covered-by-CI path (tests/test_eval_cli.py), converting
      the torch EMA weights in place;
then diffs the per-tIoU mAP tables and the averages.

Exit code 0 iff every per-tIoU delta and the average delta are within
--tolerance (absolute mAP points, default 0.003 = 0.3 points).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

import numpy as np


def run_reference(args) -> dict:
    """Reference model + eval tail on CPU; returns per-tIoU + avg mAP."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from _reference_shim import install

    install()
    sys.path.insert(0, REFERENCE)
    try:
        from libs.core import load_config as ref_load
        from libs.datasets import make_data_loader, make_dataset
        from libs.modeling import make_multimodal_meta_arch
        from libs.utils.metrics import ANETdetection

        cfg = ref_load(os.path.join(REFERENCE,
                                    "configs/avel_unav100_eval.yaml"))
        cfg["dataset"]["json_file"] = args.json_file
        cfg["dataset"]["feat_folder"] = args.feat_folder
        cfg["test_split"] = [args.split]
        cfg["loader"]["batch_size"] = args.ref_batch
        cfg["loader"]["num_workers"] = max(1, args.ref_workers)

        # exactly /root/reference/eval.py:53-57 (loader kwargs unpacked
        # from BOTH the loader and dataset sections)
        dataset = make_dataset(
            cfg["dataset_name"], False, cfg["test_split"], **cfg["dataset"]
        )
        loader = make_data_loader(
            dataset, False, None, **cfg["loader"], **cfg["dataset"]
        )
        model = make_multimodal_meta_arch(cfg["model_name"], **cfg["model"])
        ckpt = torch.load(args.ckpt, map_location="cpu")
        sd = ckpt.get("state_dict_ema", ckpt.get("state_dict"))
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}
        missing, unexpected = model.load_state_dict(sd, strict=False)
        if missing:
            print(f"# reference load: {len(missing)} missing keys "
                  f"(first: {missing[:3]})")
        if unexpected:
            print(f"# reference load: {len(unexpected)} unexpected keys "
                  f"(first: {unexpected[:3]})")
        model.eval()

        results = {"video-id": [], "t-start": [], "t-end": [], "label": [],
                   "score": []}
        with torch.no_grad():
            for it, video_list in enumerate(loader):
                output, _ = model(video_list)
                output["video_id"] = video_list["video_id"]
                for vi in range(len(output["video_id"])):
                    n = output["segments"][vi].shape[0]
                    if n == 0:
                        continue
                    results["video-id"].extend([output["video_id"][vi]] * n)
                    results["t-start"].append(output["segments"][vi][:, 0])
                    results["t-end"].append(output["segments"][vi][:, 1])
                    results["label"].append(output["labels"][vi])
                    results["score"].append(output["scores"][vi])
                if it % 10 == 0:
                    print(f"# reference eval: batch {it}/{len(loader)}")
        for k in ("t-start", "t-end", "label", "score"):
            results[k] = torch.cat(results[k]).cpu().numpy()

        det_eval = ANETdetection(
            args.json_file, args.split,
            tiou_thresholds=np.linspace(0.1, 0.9, 9),
        )
        per_tiou, avg = det_eval.evaluate(results, verbose=True)
        return {
            "tiou": [round(float(t), 2) for t in det_eval.tiou_thresholds],
            "per_tiou_mAP": [float(x) for x in np.asarray(per_tiou)],
            "avg_mAP": float(avg),
        }
    finally:
        sys.path.remove(REFERENCE)


def run_ours(args, workdir: str) -> dict:
    """Our eval CLI (--saveonly) + our evaluator; per-tIoU + avg mAP."""
    import yaml

    import eval as eval_cli
    from unav_yolyolva_tpu.eval.metrics import ANETdetection

    cfg_yaml = os.path.join(workdir, "parity_eval_cfg.yaml")
    with open(cfg_yaml, "w") as f:
        yaml.safe_dump({
            "test_split": [args.split],
            "dataset": {
                "json_file": args.json_file,
                "feat_folder": args.feat_folder,
            },
            "loader": {"batch_size": args.batch},
        }, f)

    # run through the CLI's .pth.tar conversion branch with --saveonly so
    # we get the raw rows, then evaluate for the per-tIoU table
    ckpt_copy = os.path.join(workdir, os.path.basename(args.ckpt))
    if not os.path.exists(ckpt_copy):
        import shutil

        shutil.copyfile(args.ckpt, ckpt_copy)
    ns = argparse.Namespace(config=cfg_yaml, ckpt=ckpt_copy, topk=-1,
                            saveonly=True, print_freq=10)
    eval_cli.main(ns)
    import pickle

    with open(os.path.join(workdir, "eval_results.pkl"), "rb") as f:
        results = pickle.load(f)

    det_eval = ANETdetection(
        args.json_file, args.split, tiou_thresholds=np.linspace(0.1, 0.9, 9),
    )
    per_tiou, avg = det_eval.evaluate(results, verbose=True)
    return {
        "tiou": [round(float(t), 2) for t in np.linspace(0.1, 0.9, 9)],
        "per_tiou_mAP": [float(x) for x in np.asarray(per_tiou)],
        "avg_mAP": float(avg),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-file", required=True)
    ap.add_argument("--feat-folder", required=True)
    ap.add_argument("--ckpt", required=True,
                    help="released reference checkpoint (.pth.tar)")
    ap.add_argument("--split", default="test")
    ap.add_argument("--tolerance", type=float, default=0.003,
                    help="max |delta| per tIoU and for the average")
    ap.add_argument("--batch", type=int, default=64,
                    help="our eval batch size")
    ap.add_argument("--ref-batch", type=int, default=8,
                    help="reference CPU eval batch size")
    ap.add_argument("--ref-workers", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/parity_real")
    ap.add_argument("--skip-reference", action="store_true",
                    help="only run ours (e.g. reference numbers known)")
    ap.add_argument("--ref-result", default=None,
                    help="JSON file with a prior run_reference output "
                         "to diff against instead of re-running")
    args = ap.parse_args()

    for path in (args.json_file, args.feat_folder, args.ckpt):
        if not os.path.exists(path):
            raise SystemExit(f"missing input: {path}")
    os.makedirs(args.workdir, exist_ok=True)

    ours = run_ours(args, args.workdir)
    with open(os.path.join(args.workdir, "ours.json"), "w") as f:
        json.dump(ours, f, indent=1)
    print(f"\n# ours: avg mAP {ours['avg_mAP']:.4f}")

    if args.skip_reference and not args.ref_result:
        print(json.dumps({"ours": ours}))
        return 0

    if args.ref_result:
        with open(args.ref_result) as f:
            ref = json.load(f)
    else:
        ref = run_reference(args)
        with open(os.path.join(args.workdir, "reference.json"), "w") as f:
            json.dump(ref, f, indent=1)
    print(f"# reference: avg mAP {ref['avg_mAP']:.4f}")

    deltas = [abs(a - b) for a, b in
              zip(ours["per_tiou_mAP"], ref["per_tiou_mAP"])]
    avg_delta = abs(ours["avg_mAP"] - ref["avg_mAP"])
    ok = max(deltas + [avg_delta]) <= args.tolerance
    report = {
        "ok": ok,
        "tolerance": args.tolerance,
        "avg_mAP": {"ours": ours["avg_mAP"], "reference": ref["avg_mAP"],
                    "delta": avg_delta},
        "per_tiou": [
            {"tiou": t, "ours": a, "reference": b, "delta": abs(a - b)}
            for t, a, b in zip(ours["tiou"], ours["per_tiou_mAP"],
                               ref["per_tiou_mAP"])
        ],
    }
    print(json.dumps(report, indent=1))
    with open(os.path.join(args.workdir, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
