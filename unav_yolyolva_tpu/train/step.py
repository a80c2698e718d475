"""Jitted train / eval steps.

One compiled program per step covering (reference equivalents in brackets):
  * on-device dense target construction (DataLoader-worker label assignment,
    unav100.py:173-252 + collate extras, data_utils.py:141-162)
  * model forward + loss (PtTransformer.forward/losses)
  * backward, global-norm clip, AdamW update, per-step LR schedule,
    EMA update, loss-normalizer EMA (train_one_epoch body,
    train_utils.py:278-301)

The eval step additionally decodes proposals and runs Soft-NMS on device
(inference + postprocessing, meta_archs.py:688-875), returning fixed-shape
detections; the host only converts them to the mAP evaluator's row format.

Data parallelism: steps are jitted with NamedShardings — batch sharded over
the mesh's data axis, state replicated; XLA derives the gradient all-reduce.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.assign import assign_labels_batch, frame_targets_batch
from ..geometry.points import concat_points, generate_points
from ..eval.decode import decode_single_video, postprocess_batch
from ..models.meta_arch import compute_losses
from .ema import ema_update
from .state import TrainState


def build_targets(batch: Dict, points_cat: jnp.ndarray, seq_len: int,
                  num_classes: int, class_aware: bool):
    """Device-side dense targets from padded GT events."""
    m_scores, m_start_end, m_labels = frame_targets_batch(
        batch["gt_segments"], batch["gt_labels"], batch["gt_valid"],
        seq_len, num_classes,
    )
    gt_cls, gt_reg = assign_labels_batch(
        points_cat, batch["gt_segments"], batch["gt_labels"],
        batch["gt_valid"], num_classes, class_aware,
    )
    return m_scores, m_start_end, m_labels, gt_cls, gt_reg


def _model_inputs(batch, m_scores, m_start_end, m_labels):
    return {
        "visual": batch["visual"],
        "audio": batch["audio"],
        "mask": batch["mask"],
        "m_scores": m_scores,
        "m_start_end": m_start_end,
        "m_labels": m_labels,
    }


def _loss_kwargs(cfg: Dict) -> Dict:
    """Shared between the train and eval step builders so the two can
    never drift to differently-weighted losses."""
    mcfg = cfg["model"]
    return dict(
        class_aware=mcfg["class_aware"],
        loss_weight=cfg["train_cfg"]["loss_weight"],
        inter_weight=mcfg["inter_contr_weight"],
        intra_weight=mcfg["intra_contr_weight"],
        score_v_weight=mcfg["score_V_weight"],
        score_a_weight=mcfg["score_A_weight"],
        label_smoothing=cfg["train_cfg"]["label_smoothing"],
    )


def make_train_step(
    model,
    tx,
    cfg: Dict,
    mesh=None,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics)."""
    from ..ops.pallas_fusion import set_fused_mesh

    set_fused_mesh(mesh)  # Mosaic kernels need shard_map on >1 device
    mcfg = cfg["model"]
    seq_len = mcfg["max_seq_len"]
    num_classes = mcfg["num_classes"]
    class_aware = mcfg["class_aware"]
    reg_range = mcfg["regression_range"]
    scale = mcfg["scale_factor"]
    points_cat = jnp.asarray(concat_points(generate_points(seq_len, reg_range, scale)))

    loss_kwargs = _loss_kwargs(cfg)

    def step(state: TrainState, batch: Dict, rng) -> tuple:
        m_scores, m_start_end, m_labels, gt_cls, gt_reg = build_targets(
            batch, points_cat, seq_len, num_classes, class_aware
        )
        inputs = _model_inputs(batch, m_scores, m_start_end, m_labels)
        droppath_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out = model.apply(
                params, inputs, train=True, rngs={"droppath": droppath_rng}
            )
            losses, new_norm = compute_losses(
                out, gt_cls, gt_reg, state.loss_normalizer, **loss_kwargs
            )
            return losses["final_loss"], (losses, new_norm)

        grads, (losses, new_norm) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_ema = ema_update(state.ema_params, new_params)
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            loss_normalizer=new_norm,
            step=state.step + 1,
        )
        return new_state, losses

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(
    model, cfg: Dict, mesh=None, use_ema: bool = True,
    with_losses: bool = True,
) -> Callable:
    """Returns eval_step(state, batch) -> (detections, losses).

    Detections: dict of fixed-shape arrays (segs seconds, scores, labels,
    valid). Compiles once per eval sequence-length bucket.

    with_losses=False returns an empty loss dict and matches the
    reference's inference protocol (its eval.py computes detections only,
    eval.py:66-122) — XLA then dead-code-eliminates the entire loss path
    INCLUDING the alignment module's contrastive-pair selection machinery,
    which is overhead-bound on TPU (measured ~7 ms of a 41 ms eval step at
    B=64 bf16). valid_one_epoch keeps the default (True) so val-loss
    curves stay available during training.
    """
    from ..ops.pallas_fusion import set_fused_mesh

    set_fused_mesh(mesh)  # Mosaic kernels need shard_map on >1 device
    mcfg = cfg["model"]
    num_classes = mcfg["num_classes"]
    class_aware = mcfg["class_aware"]
    reg_range = mcfg["regression_range"]
    scale = mcfg["scale_factor"]
    test_cfg = cfg["test_cfg"]

    loss_kwargs = _loss_kwargs(cfg)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        # state replicated, batch sharded on the leading axis; detections
        # come back batch-sharded, losses replicated (the mAP harvest runs
        # on host). Multi-host: detections are REPLICATED instead — a
        # device-side all-gather over DCN (they are small: max_seg_num rows
        # per video) so every process can harvest the full batch and the
        # single-host host-side code runs unchanged.
        dets_sharding = repl if jax.process_count() > 1 else data
        jit_kwargs = dict(
            in_shardings=(repl, data),
            out_shardings=(dets_sharding, repl),
        )
    else:
        jit_kwargs = {}

    @functools.partial(jax.jit, static_argnums=(2,), **jit_kwargs)
    def step(state: TrainState, batch: Dict, seq_len: int):
        points = generate_points(seq_len, reg_range, scale)
        points_cat = jnp.asarray(np.concatenate(points, 0))
        m_scores, m_start_end, m_labels, gt_cls, gt_reg = build_targets(
            batch, points_cat, seq_len, num_classes, class_aware
        )
        inputs = _model_inputs(batch, m_scores, m_start_end, m_labels)
        params = state.ema_params if use_ema else state.params
        out = model.apply(params, inputs, train=False)
        if with_losses:
            losses, _ = compute_losses(
                out, gt_cls, gt_reg, state.loss_normalizer, **loss_kwargs
            )
        else:
            losses = {}

        points_j = [jnp.asarray(p) for p in points]

        def decode_one(cls_logits, offsets, masks):
            return decode_single_video(
                cls_logits, offsets, masks, points_j,
                pre_nms_thresh=test_cfg["pre_nms_thresh"],
                pre_nms_topk=test_cfg["pre_nms_topk"],
                duration_thresh=test_cfg["duration_thresh"],
                class_aware=class_aware,
                max_candidates=cfg.get("tpu", {}).get("nms_max_candidates", 0),
                approx_topk=cfg.get("tpu", {}).get("approx_topk", False),
            )

        segs, scores, cls_idx, valid = jax.vmap(decode_one)(
            out["cls_logits"], out["offsets"], out["masks"]
        )
        segs, scores, cls_idx, valid = postprocess_batch(
            segs, scores, cls_idx, valid,
            num_classes=num_classes, test_cfg=test_cfg,
            fps=batch["fps"], duration=batch["duration"],
            feat_stride=batch["feat_stride"],
            num_frames=batch["feat_num_frames"],
        )
        dets = {
            "segments": segs, "scores": scores,
            "labels": cls_idx, "valid": valid,
        }
        return dets, losses

    def eval_step(state, batch):
        return step(state, batch, int(batch["visual"].shape[1]))

    def precompile(state, batch):
        """AOT-compile for `batch`'s shapes/shardings; returns a callable
        with the (state, batch) signature (the executable is exposed as
        `.compiled` for cost analysis). See precompile_train_step."""
        compiled = step.lower(state, batch, int(batch["visual"].shape[1])).compile()

        def run(s, b):
            return compiled(s, b)

        run.compiled = compiled
        return run

    eval_step.precompile = precompile
    return eval_step


def _dummy_local_batch(cfg: Dict, *, with_eval_meta: bool) -> Dict:
    """Zero batch with this process's LOCAL row count and the exact dtypes
    the Batcher's collate produces (data/pipeline.py:collate)."""
    n_proc = jax.process_count()
    lb = cfg["loader"]["batch_size"] // max(n_proc, 1)
    t = cfg["dataset"]["max_seq_len"]
    ne = cfg["dataset"].get("max_num_events", 64)
    dv = cfg["model"].get("raw_input_dim_V", 2048)
    da = cfg["model"].get("raw_input_dim_A", 128)
    batch = {
        "visual": np.zeros((lb, t, dv), np.float32),
        "audio": np.zeros((lb, t, da), np.float32),
        "mask": np.ones((lb, t), bool),
        "gt_segments": np.zeros((lb, ne, 2), np.float32),
        "gt_labels": np.zeros((lb, ne), np.int32),
        "gt_valid": np.zeros((lb, ne), bool),
    }
    if with_eval_meta:
        for k in ("fps", "duration", "feat_stride", "feat_num_frames"):
            batch[k] = np.ones((lb,), np.float32)
    return batch


def precompile_train_step(train_step, state, cfg: Dict, mesh, rng):
    """Multi-host hardening: AOT-compile the sharded train step, then meet
    at a coordination-service barrier BEFORE the first execution.

    The first executed collective initializes the backend's communication
    context under a hard rendezvous timeout (30 s on CPU/gloo); per-process
    compile-time skew can exceed it. Compiling first and syncing makes every
    process enter that rendezvous together. Returns the compiled executable
    (same (state, batch, rng) call signature; single-process: returns
    train_step unchanged).
    """
    if jax.process_count() <= 1:
        return train_step
    from ..parallel.sync import barrier
    from .loop import ARRAY_KEYS_TRAIN, _device_batch

    db0 = _device_batch(
        _dummy_local_batch(cfg, with_eval_meta=False), ARRAY_KEYS_TRAIN, mesh
    )
    compiled = train_step.lower(state, db0, rng).compile()
    barrier("train_step_compiled")

    def run(s, b, r):
        return compiled(s, b, r)

    return run


def precompile_eval_step(eval_step, state, cfg: Dict, mesh):
    """Same compile-then-sync hardening for the eval step (multi-host); the
    dummy batch takes the EVAL path through _device_batch (global rows,
    pad + local slice). Single-process: returns eval_step unchanged."""
    n_proc = jax.process_count()
    if n_proc <= 1:
        return eval_step
    from ..parallel.sync import barrier
    from .loop import ARRAY_KEYS_EVAL, _device_batch

    # compile for the ONE fixed eval shape valid_one_epoch pads every
    # batch to: ceil(global batch_size / n_dev) * n_dev
    n_dev = mesh.devices.size
    bsz = cfg["loader"]["batch_size"]
    b_star = -(-bsz // n_dev) * n_dev
    local = _dummy_local_batch(cfg, with_eval_meta=True)
    lb = local["visual"].shape[0]
    reps = -(-b_star // max(lb, 1))
    global_batch = {
        k: np.concatenate([v] * reps, axis=0)[:b_star]
        for k, v in local.items()
    }
    db0 = _device_batch(global_batch, ARRAY_KEYS_EVAL, mesh, allow_pad=True,
                        pad_to=b_star)
    compiled = eval_step.precompile(state, db0)
    barrier("eval_step_compiled")
    return compiled
