"""Measure the PyTorch-CPU eval throughput of the REFERENCE implementation.

Runs the actual reference code from /root/reference (imported, not copied)
on synthetic eval batches matching its collate output, and records
videos/sec into BASELINE_MEASURED.json — the denominator for bench.py's
vs_baseline ratio (BASELINE.json north star: >10x PyTorch-CPU eval
throughput).

Shims applied so the reference imports in this environment:
  * mmengine.model.BaseModule -> torch.nn.Module (only symbol it uses)
  * its C++ nms_1d_cpu extension is compiled on the fly with
    torch.utils.cpp_extension.load from the reference csrc.

Usage: python tools/bench_reference_cpu.py [--batch 64] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def install_shims():
    import torch.nn as nn

    class BaseModule(nn.Module):
        """mmengine.model.BaseModule stand-in: nn.Module + init_cfg arg."""

        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

    mmengine = types.ModuleType("mmengine")
    mmengine_model = types.ModuleType("mmengine.model")
    mmengine_model.BaseModule = BaseModule
    mmengine.model = mmengine_model
    sys.modules["mmengine"] = mmengine
    sys.modules["mmengine.model"] = mmengine_model

    # build the reference's C++ NMS extension in-process
    from torch.utils.cpp_extension import load

    os.makedirs("/tmp/ref_nms_build", exist_ok=True)
    ext = load(
        name="nms_1d_cpu",
        sources=[os.path.join(REFERENCE, "libs/utils/csrc/nms_cpu.cpp")],
        build_directory="/tmp/ref_nms_build",
        verbose=False,
    )
    sys.modules["nms_1d_cpu"] = ext


def make_fake_batch(batch_size: int, t: int, num_classes: int):
    """A batch shaped exactly like the reference collate output
    (data_utils.py:214-229)."""
    import torch

    g = torch.Generator().manual_seed(0)
    num_pts = t + t // 2 + t // 4 + t // 8 + t // 16 + t // 32
    points = []
    reg_ranges = [(0, 4), (4, 8), (8, 16), (16, 32), (32, 64), (64, 10000)]
    for lvl, (lo, hi) in enumerate(reg_ranges):
        stride = 2 ** lvl
        ts = torch.arange(0, t, stride, dtype=torch.float32)[:, None]
        pts = torch.cat(
            [ts, torch.full_like(ts, lo), torch.full_like(ts, hi),
             torch.full_like(ts, stride)], dim=1
        )
        points.append(pts[None].repeat(batch_size, 1, 1))

    m_labels = torch.zeros(batch_size, t, num_classes)
    m_labels[:, 10:40, 3] = 1
    scores = torch.zeros(batch_size, t)
    scores[:, 10:40] = 1
    start_end = torch.zeros(batch_size, t)
    start_end[:, 10:41] = 1
    gt_cls = torch.zeros(batch_size, num_pts, num_classes)
    gt_cls[:, 20:30, 3] = 1
    gt_offsets = torch.zeros(batch_size, num_pts, num_classes, 2)
    gt_offsets[:, 20:30, 3, :] = 1.0

    return {
        "visual": torch.randn(batch_size, 2048, t, generator=g),
        "audio": torch.randn(batch_size, 128, t, generator=g),
        "mask": torch.ones(batch_size, 1, t, dtype=torch.bool),
        "scores": scores,
        "start_end": start_end,
        "m_labels": m_labels,
        "gt_offsets": gt_offsets,
        "gt_cls_labels": gt_cls,
        "video_id": [f"v{i}" for i in range(batch_size)],
        "fps": [25.0] * batch_size,
        "duration": [70.0] * batch_size,
        "feat_stride": [8] * batch_size,
        "feat_num_frames": [24] * batch_size,
        "points": points,
    }


def bench_train(model, cfg, batch_size: int, iters: int):
    """The reference train step: forward (train mode) -> final_loss.backward()
    -> grad clip -> AdamW step -> EMA update (train_utils.py:278-301)."""
    import torch
    from libs.utils import make_optimizer as ref_make_optimizer
    from libs.utils.train_utils import ModelEma

    model.train()
    optimizer = ref_make_optimizer(model, cfg["opt"])
    ema = ModelEma(model)
    batch = make_fake_batch(batch_size, 224, cfg["model"]["num_classes"])

    def step():
        optimizer.zero_grad(set_to_none=True)
        losses = model(batch)
        losses["final_loss"].backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        optimizer.step()
        ema.update(model)

    t0 = time.perf_counter()
    step()
    print(f"train warmup step: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    cps = batch_size * iters / dt
    print(f"reference PyTorch-CPU train: {cps:.3f} clips/s "
          f"({dt / iters:.1f} s / step of {batch_size})")
    model.eval()
    return cps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch threads (0 = default)")
    ap.add_argument("--train", action="store_true",
                    help="also measure the train step (batch 8, the "
                    "reference train protocol)")
    ap.add_argument("--train-batch", type=int, default=8)
    args = ap.parse_args()

    import torch

    if args.threads > 0:
        torch.set_num_threads(args.threads)

    install_shims()
    sys.path.insert(0, REFERENCE)
    from libs.core import load_config
    from libs.modeling import make_multimodal_meta_arch

    cfg = load_config(os.path.join(REFERENCE, "configs/avel_unav100_eval.yaml"))
    model = make_multimodal_meta_arch(cfg["model_name"], **cfg["model"])
    model.eval()
    n_params = sum(p.numel() for p in model.parameters())
    print(f"reference model: {n_params / 1e6:.1f}M params "
          f"(incl. dead modules), torch {torch.__version__}, "
          f"{torch.get_num_threads()} threads")

    batch = make_fake_batch(args.batch, 224, cfg["model"]["num_classes"])
    with torch.no_grad():
        t0 = time.perf_counter()
        _ = model(batch)
        warm = time.perf_counter() - t0
        print(f"warmup batch: {warm:.1f}s")
        t0 = time.perf_counter()
        for _ in range(args.iters):
            _ = model(batch)
        dt = (time.perf_counter() - t0)
    vps = args.batch * args.iters / dt
    print(f"reference PyTorch-CPU eval: {vps:.3f} videos/s "
          f"({dt / args.iters:.1f} s / batch of {args.batch})")

    out_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    payload = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            payload = json.load(f)
    payload.update({
        "pytorch_cpu_eval_videos_per_sec": round(vps, 4),
        "batch_size": args.batch,
        "iters": args.iters,
        "torch_threads": torch.get_num_threads(),
        "host_cpus": os.cpu_count(),
        "note": (
            "Reference (/root/reference) eval forward+decode+SoftNMS on "
            "synthetic T=224 batches, this host's CPU. Measured by "
            "tools/bench_reference_cpu.py."
        ),
    })
    if args.train:
        cps = bench_train(model, cfg, args.train_batch, args.iters)
        payload.update({
            "pytorch_cpu_train_clips_per_sec": round(cps, 4),
            "train_batch_size": args.train_batch,
            "train_note": (
                "Reference train step (fwd train-mode + backward + clip + "
                "AdamW + EMA) on synthetic T=224 batches, this host's CPU."
            ),
        })
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
