"""Roofline / speed-of-light analysis for the flagship eval and train steps.

Computes, WITHOUT needing the chip:
  * analytic FLOPs for one step (XLA cost_analysis on a CPU lowering of
    the exact production program + the Pallas kernels' trace-time records
    — same accounting as bench.py);
  * a lower-bound HBM byte count (params read once + input/output
    activations of every major stage, assuming perfect fusion inside
    stages — a deliberate UNDER-estimate, so the SOL time is a true
    floor);
  * arithmetic intensity and the v5e roofline verdict (compute- vs
    bandwidth-bound) per dtype;
  * speed-of-light step time  SOL = max(F / peak_flops, B / peak_bw)
    and the throughput ceiling it implies.

Pass a measured videos/s (from bench.py) to get the fraction-of-SOL:

    python tools/roofline.py [--batch 64] [--dtype bfloat16]
                             [--measured-vps 1608]

v5e single chip: 197 bf16 TFLOP/s (99 fp32 via 2-pass), 819 GB/s HBM.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16 = 197e12
V5E_FP32 = V5E_BF16 / 2
V5E_BW = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--measured-vps", type=float, default=None)
    ap.add_argument("--train", action="store_true",
                    help="analyze the train step instead of eval")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from unav_yolyolva_tpu.core.config import load_config_dict
    from unav_yolyolva_tpu.models import build_model
    from unav_yolyolva_tpu.ops import pallas_fusion
    from unav_yolyolva_tpu.train import (
        create_train_state, make_eval_step, make_optimizer, make_train_step,
    )

    b, t, c = args.batch, 224, 100
    cfg = load_config_dict({
        "dataset": {"max_seq_len": t, "num_classes": c,
                    "max_num_events": 64},
        "loader": {"batch_size": b},
        "model": {"use_abs_pe": True, "class_aware": True,
                  "intra_contr_weight": 1.0, "inter_contr_weight": 0.001,
                  "score_V_weight": 0.001, "score_A_weight": 0.001},
        "opt": {"learning_rate": 1e-4, "epochs": 40, "warmup_epochs": 5},
        "train_cfg": {"loss_weight": 1},
        "test_cfg": {"pre_nms_topk": 2000, "max_seg_num": 100,
                     "min_score": 0.001, "multiclass_nms": True,
                     "nms_sigma": 0.4, "iou_threshold": 0.7},
        "tpu": {"compute_dtype": args.dtype},
    })
    model = build_model(cfg)

    # force the TPU production trace on this CPU lowering so the Pallas
    # records fire exactly as they would on-chip
    import unav_yolyolva_tpu.models.blocks as blocks
    import unav_yolyolva_tpu.models.heads as heads

    blocks.FUSED_MHCA = "always"
    heads.PACKED_HEADS = "auto"
    os.environ.pop("UNAV_FUSED_CSP", None)

    init_inputs = {
        "visual": jnp.zeros((b, t, 2048)), "audio": jnp.zeros((b, t, 128)),
        "mask": jnp.ones((b, t), bool), "m_scores": jnp.zeros((b, t)),
        "m_start_end": jnp.zeros((b, t)), "m_labels": jnp.zeros((b, t, c)),
    }
    rng = jax.random.PRNGKey(0)
    pshape = jax.eval_shape(
        lambda: model.init({"params": rng, "droppath": rng}, init_inputs,
                           train=False)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), pshape)
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(pshape))
    tx, _ = make_optimizer(params, cfg["opt"], 1)
    state = create_train_state(params, tx, 250)

    batch = {
        "visual": jnp.zeros((b, t, 2048)), "audio": jnp.zeros((b, t, 128)),
        "mask": jnp.ones((b, t), bool),
        "gt_segments": jnp.zeros((b, 64, 2)),
        "gt_labels": jnp.zeros((b, 64), jnp.int32),
        "gt_valid": jnp.zeros((b, 64), bool),
        "fps": jnp.full((b,), 25.0), "duration": jnp.full((b,), 70.0),
        "feat_stride": jnp.full((b,), 8.0),
        "feat_num_frames": jnp.full((b,), 24.0),
    }

    pallas_fusion.TRACED_FLOPS.clear()
    if args.train:
        step = make_train_step(model, tx, cfg)
        compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    else:
        step = make_eval_step(model, cfg, use_ema=True, with_losses=False)
        compiled = step.precompile(state, batch).compiled
    kernel_flops = sum(pallas_fusion.TRACED_FLOPS)
    cost = compiled.cost_analysis()
    xla_flops = float(cost.get("flops", 0.0)) if cost else 0.0
    flops = xla_flops + kernel_flops

    # HBM floor: params once (+grads/opt-state traffic for train),
    # raw inputs, and the big inter-stage activations (B,T,512-wide
    # pyramid) twice (write+read). Perfect-fusion assumption => floor.
    dt_bytes = 2 if args.dtype == "bfloat16" else 4
    act_elems = 0
    for lvl in range(6):
        act_elems += b * (t // 2 ** lvl) * 512 * 2   # V+A pyramid
    act_elems *= 4                                   # backbone+fusion+cat+heads
    inputs_bytes = b * t * (2048 + 128) * 4
    params_bytes = n_params * 4
    if args.train:
        hbm = (3 * params_bytes            # params + grad write + grad read
               + 8 * params_bytes          # adam m/v read+write
               + inputs_bytes
               + 2 * act_elems * dt_bytes * 2)   # fwd + residual saves
    else:
        hbm = params_bytes + inputs_bytes + 2 * act_elems * dt_bytes

    peak = V5E_BF16 if args.dtype == "bfloat16" else V5E_FP32
    t_comp = flops / peak
    t_bw = hbm / V5E_BW
    sol = max(t_comp, t_bw)
    bound = "compute" if t_comp >= t_bw else "bandwidth"
    unit = "clips" if args.train else "videos"

    print(f"step={'train' if args.train else 'eval'} B={b} dtype={args.dtype}")
    print(f"params                : {n_params/1e6:8.2f} M")
    print(f"FLOPs/step            : {flops/1e12:8.3f} TFLOP "
          f"(XLA {xla_flops/1e12:.3f} + kernels {kernel_flops/1e12:.3f})")
    print(f"FLOPs/{unit[:-1]:<15}: {flops/b/1e9:8.2f} GFLOP")
    print(f"HBM floor/step        : {hbm/1e9:8.3f} GB")
    print(f"arithmetic intensity  : {flops/hbm:8.1f} FLOP/byte "
          f"(v5e knee {peak/V5E_BW:.0f})")
    print(f"SOL step time         : {sol*1e3:8.2f} ms  [{bound}-bound: "
          f"compute {t_comp*1e3:.2f} ms, bw {t_bw*1e3:.2f} ms]")
    print(f"SOL throughput        : {b/sol:8.0f} {unit}/s")
    if args.measured_vps:
        eff = (b / args.measured_vps) and args.measured_vps / (b / sol)
        print(f"measured              : {args.measured_vps:8.0f} {unit}/s "
              f"= {100*eff:.1f}% of SOL")


if __name__ == "__main__":
    main()
