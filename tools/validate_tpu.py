"""On-device correctness gate: kernels-on vs pure-XLA at flagship shapes.

CPU tests prove the Pallas kernels in interpret mode; this tool proves
them COMPILED on the real chip, where Mosaic lowering is a different
code path. It builds the flagship model (embd 512 — the geometry where
the CSP kernel, fused MHCA, and packed heads all activate), runs the
production eval step and one train step twice — default knobs vs
UNAV_FUSED_MHCA/UNAV_FUSED_CSP/UNAV_PACKED_HEADS all "never" — and
asserts detections and losses agree.

Run whenever kernels change:  python tools/validate_tpu.py [--batch 8]
Exit code 0 = gate passed.

The gate runs under jax.default_matmul_precision("highest") (override
with --precision). Detection rows are DISCONTINUOUS in the scores: an
untrained model's score spread (~4e-3) is the same magnitude as the
TPU's default bf16-pass matmul noise (~1.5e-2 absolute on the logits,
measured at B=64), so under default precision Soft-NMS selection order
— and therefore the row-wise comparison — is essentially random between
two numerically-equivalent programs (29% label mismatch observed while
every LOSS agreed to <1e-4). True-fp32 multiplies shrink the
path-to-path noise ~4 orders of magnitude below the score spread, making
the elementwise detection assertion meaningful. The losses are smooth
aggregates and gate fine at either precision. The precision context
applies inside the Pallas kernels too (their jnp.dot calls are traced
under the same flag).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _flagship(batch_size):
    from unav_yolyolva_tpu.core.config import load_config_dict

    return load_config_dict({
        "dataset": {"max_seq_len": 224, "num_classes": 100,
                    "max_num_events": 64},
        "loader": {"batch_size": batch_size},
        "model": {
            "use_abs_pe": True, "class_aware": True,
            "intra_contr_weight": 1.0, "inter_contr_weight": 0.001,
            "score_V_weight": 0.001, "score_A_weight": 0.001,
        },
        "opt": {"learning_rate": 1e-4, "epochs": 40, "warmup_epochs": 5},
        "train_cfg": {"loss_weight": 1},
        "test_cfg": {
            "pre_nms_topk": 2000, "max_seg_num": 100, "min_score": 0.001,
            "multiclass_nms": True, "nms_sigma": 0.4, "iou_threshold": 0.7,
        },
    })


def _batch(b, t, c):
    host = np.random.default_rng(0)
    n_ev = 64
    return {
        "visual": host.normal(size=(b, t, 2048)).astype(np.float32),
        "audio": host.normal(size=(b, t, 128)).astype(np.float32),
        "mask": np.ones((b, t), bool),
        "gt_segments": np.tile(
            np.float32([[10.0, 60.0], [80.0, 120.0]] + [[0, 0]] * (n_ev - 2)),
            (b, 1, 1),
        ),
        "gt_labels": np.tile(
            np.concatenate([np.int32([3, 7]), np.zeros(n_ev - 2, np.int32)]),
            (b, 1),
        ),
        "gt_valid": np.tile(
            np.asarray([True, True] + [False] * (n_ev - 2)), (b, 1)
        ),
        "fps": np.full((b,), 25.0, np.float32),
        "duration": np.full((b,), 70.0, np.float32),
        "feat_stride": np.full((b,), 8.0, np.float32),
        "feat_num_frames": np.full((b,), 24.0, np.float32),
    }


def _set_knobs(on: bool):
    import unav_yolyolva_tpu.models.blocks as blocks
    import unav_yolyolva_tpu.models.heads as heads

    blocks.FUSED_MHCA = "auto" if on else "never"
    heads.PACKED_HEADS = "auto" if on else "never"
    os.environ["UNAV_FUSED_CSP"] = "auto" if on else "never"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--precision", default="highest",
                    choices=["default", "high", "highest"],
                    help="matmul precision for BOTH paths (see module "
                    "docstring for why 'highest' is the gate default)")
    args = ap.parse_args()

    import jax

    if args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from unav_yolyolva_tpu.models import build_model
    from unav_yolyolva_tpu.train import (
        create_train_state, make_eval_step, make_optimizer, make_train_step,
    )

    print("device:", jax.devices()[0].device_kind)
    b, t, c = args.batch, 224, 100
    cfg = _flagship(b)
    model = build_model(cfg)
    batch = _batch(b, t, c)

    init_inputs = {
        "visual": jnp.zeros((b, t, 2048)),
        "audio": jnp.zeros((b, t, 128)),
        "mask": jnp.ones((b, t), bool),
        "m_scores": jnp.zeros((b, t)),
        "m_start_end": jnp.zeros((b, t)),
        "m_labels": jnp.zeros((b, t, c)),
    }
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda k, d: model.init({"params": k, "droppath": k}, d, train=False)
    )(rng, init_inputs)
    host_params = jax.device_get(params)
    db = jax.device_put(batch)
    jax.block_until_ready(list(db.values()))

    outs = {}
    for mode in ("xla", "kernels"):
        _set_knobs(mode == "kernels")
        # the train step donates its state, so each mode gets a fresh one
        p = jax.device_put(host_params)
        tx, _ = make_optimizer(p, cfg["opt"], 1)
        state = create_train_state(p, tx, 250)
        eval_step = make_eval_step(model, cfg, use_ema=True,
                                   with_losses=True)
        dets, losses = eval_step(state, db)
        dets = jax.device_get(dets)
        losses = jax.device_get(losses)
        entry = {"dets": dets, "eval_losses": losses}
        train_step = make_train_step(model, tx, cfg)
        # host copy BEFORE the call — the step donates (invalidates) state
        old_first = np.asarray(
            jax.device_get(jax.tree.leaves(state.params)[0]), np.float64
        )
        new_state, tr_losses = train_step(state, db, jax.random.PRNGKey(1))
        entry["train_losses"] = jax.device_get(tr_losses)
        new_first = np.asarray(
            jax.device_get(jax.tree.leaves(new_state.params)[0]), np.float64
        )
        entry["delta"] = float(np.mean(np.abs(new_first - old_first)))
        outs[mode] = entry
        print(f"[{mode}] eval final_loss="
              f"{float(losses.get('final_loss', np.nan)):.6f} "
              f"train final_loss="
              f"{float(entry['train_losses'].get('final_loss', np.nan)):.6f}")

    a, k = outs["xla"], outs["kernels"]
    fails = []

    def close(name, x, y, rtol, atol):
        x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
        err = np.max(np.abs(x - y) / (np.abs(x) + atol)) if x.size else 0.0
        ok = np.allclose(x, y, rtol=rtol, atol=atol)
        print(f"  {name:<28} max_rel_err={err:.3e}  {'ok' if ok else 'FAIL'}")
        if not ok:
            fails.append(name)

    print("eval detections:")
    np.testing.assert_array_equal(a["dets"]["valid"], k["dets"]["valid"])
    valid = a["dets"]["valid"].astype(bool)
    lab_mismatch = (a["dets"]["labels"][valid]
                    != k["dets"]["labels"][valid]).mean()
    print(f"  label mismatch rate: {lab_mismatch:.4f}")
    if lab_mismatch > 0.002:
        fails.append("labels")
    close("segments", a["dets"]["segments"][valid],
          k["dets"]["segments"][valid], 1e-3, 1e-3)
    close("scores", a["dets"]["scores"][valid],
          k["dets"]["scores"][valid], 1e-3, 1e-4)
    print("losses:")
    for key in a["eval_losses"]:
        close(f"eval.{key}", a["eval_losses"][key], k["eval_losses"][key],
              1e-3, 1e-5)
    for key in a["train_losses"]:
        close(f"train.{key}", a["train_losses"][key], k["train_losses"][key],
              1e-3, 1e-5)
    close("param_update_mean_abs", a["delta"], k["delta"], 1e-2, 1e-9)

    if fails:
        print("GATE FAILED:", fails)
        sys.exit(1)
    print("GATE PASSED: kernels == XLA on", jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
