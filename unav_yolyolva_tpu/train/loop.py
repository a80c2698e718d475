"""Epoch-level train / validation loops.

Equivalents of train_one_epoch / valid_one_epoch
(`/root/reference/libs/utils/train_utils.py:255-466`). The inner step is a
single donated jit (step.py); the loop only feeds sharded batches and logs.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..parallel.mesh import shard_batch
from ..utils.meters import AverageMeter

ARRAY_KEYS_TRAIN = (
    "visual", "audio", "mask", "gt_segments", "gt_labels", "gt_valid",
)
ARRAY_KEYS_EVAL = ARRAY_KEYS_TRAIN + (
    "fps", "duration", "feat_stride", "feat_num_frames",
)


def _device_batch(batch: Dict, keys, mesh=None, allow_pad: bool = False,
                  pad_to: int = 0, rows_local: bool = False) -> Dict:
    """Move a numpy batch onto the mesh, batch axis sharded.

    Single-process: the batch is global. Multi-process (multi-host DP):
    the TRAIN batcher already yields process-local rows (pipeline.py);
    the EVAL batcher does too when built with its mesh (rows_local=True —
    here the local rows are only padded up to this process's block size),
    and otherwise yields the full global batch on every process, which is
    padded and sliced to this process's contiguous row block before
    shard_batch assembles the global jax.Array.

    `pad_to` (eval only): pad the batch axis to this FIXED global size
    rather than the next mesh multiple, so the final partial batch reuses
    the one compiled shape (mandatory with an AOT-compiled multi-host
    step, which rejects any other batch dim).
    """
    sub = {k: batch[k] for k in keys}
    if mesh is None:
        return sub
    n_proc = jax.process_count()
    n_dev = mesh.devices.size
    b = sub["visual"].shape[0]

    if rows_local and n_proc > 1:
        # eval rows already local (Batcher pad_to path): pad the LOCAL
        # block to its fixed size; shard_batch assembles the global array
        lb = pad_to // n_proc
        if b != lb:
            assert allow_pad and b < lb
            pad = lb - b
            sub = {
                k: np.concatenate(
                    [v, np.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
                )
                for k, v in sub.items()
            }
        return shard_batch(sub, mesh)

    if n_proc > 1 and not allow_pad:
        # train path: rows are already local; local batch must divide over
        # this process's devices
        n_local = n_dev // n_proc
        if b % n_local:
            raise ValueError(
                f"local train batch {b} not divisible by {n_local} local "
                f"devices; refusing to zero-pad a training batch"
            )
        return shard_batch(sub, mesh)

    target = max(pad_to, -(-b // n_dev) * n_dev)
    if b != target:
        # zero-padding the batch axis is only legal on the EVAL path
        # (the harvest loop iterates batch["video_id"] — real count
        # only — so padded rows never reach the results). Training on
        # all-zero rows would silently dilute gradients: error instead.
        if not allow_pad:
            raise ValueError(
                f"train batch size {b} not divisible by mesh size "
                f"{n_dev}; refusing to zero-pad a training batch"
            )
        pad = target - b
        sub = {
            k: np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
            )
            for k, v in sub.items()
        }
    if n_proc > 1:
        lb = sub["visual"].shape[0] // n_proc
        lo = jax.process_index() * lb
        sub = {k: v[lo : lo + lb] for k, v in sub.items()}
    return shard_batch(sub, mesh)


def train_one_epoch(
    state,
    batcher,
    train_step: Callable,
    rng,
    epoch: int,
    *,
    mesh=None,
    tb_writer=None,
    print_freq: int = 20,
    schedule: Optional[Callable] = None,
) -> tuple:
    batch_time = AverageMeter()
    trackers: Dict[str, AverageMeter] = {}
    num_iters = len(batcher)
    batcher.set_epoch(epoch)
    print(f"\n[Train]: Epoch {epoch:d} started")
    start = time.time()
    last_losses = {}
    losses = None
    it = tracked_it = -1
    for it, batch in enumerate(batcher):
        db = _device_batch(batch, ARRAY_KEYS_TRAIN, mesh)
        state, losses = train_step(state, db, rng)

        if it != 0 and it % print_freq == 0:
            jax.block_until_ready(losses)
            batch_time.update((time.time() - start) / print_freq)
            start = time.time()
            last_losses = {k: float(v) for k, v in losses.items()}
            for k, v in last_losses.items():
                trackers.setdefault(k, AverageMeter()).update(v)
            tracked_it = it
            step_i = int(jax.device_get(state.step))
            lr = float(schedule(step_i - 1)) if schedule else float("nan")
            if tb_writer is not None:
                tb_writer.add_scalar("train/learning_rate", lr, step_i)
                for k, v in last_losses.items():
                    tb_writer.add_scalar(f"train/{k}", v, step_i)
            fl = trackers.get("final_loss")
            line = (
                f"Epoch: [{epoch:03d}][{it:05d}/{num_iters:05d}]\t"
                f"Time {batch_time.val:.2f} ({batch_time.avg:.2f})"
            )
            if fl:
                line += f"\tLoss {fl.val:.2f} ({fl.avg:.2f})"
            print(line)
    if losses is not None and tracked_it != it:
        # fold the final step into the epoch averages — unless the loop's
        # print block just did (last iteration on a print_freq multiple),
        # which would double-count it
        jax.block_until_ready(losses)
        last_losses = {k: float(v) for k, v in losses.items()}
        for k, v in last_losses.items():
            trackers.setdefault(k, AverageMeter()).update(v)
    elif losses is None:
        jax.block_until_ready(state.params)
    print(f"[Train]: Epoch {epoch:d} finished")
    # epoch stats are the tracker AVERAGES (sampled every print_freq steps
    # plus the final step), matching the reference's epoch-averaged
    # AverageMeter semantics (train_utils.py:291-298) rather than the last
    # printed value
    epoch_losses = {k: m.avg for k, m in trackers.items()} or last_losses
    return state, epoch_losses


def valid_one_epoch(
    state,
    batcher,
    eval_step: Callable,
    epoch: int,
    *,
    mesh=None,
    evaluator=None,
    output_file: Optional[str] = None,
    ext_score_file: Optional[str] = None,
    tb_writer=None,
    print_freq: int = 20,
) -> tuple:
    assert (evaluator is not None) or (output_file is not None)
    results = {
        "video-id": [], "t-start": [], "t-end": [], "label": [], "score": [],
    }
    batch_time = AverageMeter()
    start = time.time()
    losses = {}
    loss_samples = []   # tiny device scalars; fetched once at epoch end

    def harvest(video_ids, dets):
        dets = jax.device_get(dets)  # fast: copy already started async
        for vi, vid in enumerate(video_ids):
            ok = dets["valid"][vi]
            n = int(ok.sum())
            if n == 0:
                continue
            results["video-id"].extend([vid] * n)
            results["t-start"].append(dets["segments"][vi, ok, 0])
            results["t-end"].append(dets["segments"][vi, ok, 1])
            results["label"].append(dets["labels"][vi, ok])
            results["score"].append(dets["scores"][vi, ok])

    # Pipelined eval: dispatch batch i+1 (and start its detections' async
    # device->host copy) BEFORE harvesting batch i, so the host fetch
    # overlaps the next batch's on-device compute instead of serializing a
    # full round-trip per batch. (The reference's loop blocks per batch.)
    # NB: on a non-divisible final batch the zero-padded rows contribute
    # nothing to the val losses: cls/reg/score losses are masked sums and
    # the contrastive pair masks pad rows via row_valid (meta_arch.py);
    # mAP is likewise unaffected (padded rows are never harvested).
    # ONE compiled eval shape: every batch (incl. a partial final one) is
    # padded to the same fixed global size; with an AOT-compiled multi-host
    # step any other batch dim would be rejected outright
    pad_to = 0
    if mesh is not None:
        n_dev = mesh.devices.size
        pad_to = -(-getattr(batcher, "batch_size", 0) // n_dev) * n_dev
    rows_local = getattr(batcher, "rows_local", False)
    if rows_local:
        # the batcher sliced rows against ITS padded size; they must agree
        assert batcher.pad_to == pad_to, (
            f"batcher pad_to {batcher.pad_to} != loop pad_to {pad_to}"
        )
    pending = None
    for it, batch in enumerate(batcher):
        db = _device_batch(batch, ARRAY_KEYS_EVAL, mesh, allow_pad=True,
                           pad_to=pad_to, rows_local=rows_local)
        dets, losses = eval_step(state, db)
        if losses:
            loss_samples.append(losses)
        for leaf in jax.tree.leaves(dets):
            try:
                leaf.copy_to_host_async()
            except Exception:
                break
        if pending is not None:
            harvest(*pending)
        pending = (batch["video_id"], dets)
        if it != 0 and it % print_freq == 0:
            batch_time.update((time.time() - start) / print_freq)
            start = time.time()
            print(
                f"Test: [{it:05d}/{len(batcher):05d}]\t"
                f"Time {batch_time.val:.2f} ({batch_time.avg:.2f})"
            )
    if pending is not None:
        harvest(*pending)

    for k in ("t-start", "t-end", "label", "score"):
        results[k] = (
            np.concatenate(results[k]) if results[k] else np.zeros((0,))
        )

    if evaluator is not None:
        if ext_score_file:
            from ..eval.postprocessing import postprocess_results

            results = postprocess_results(results, ext_score_file)
        _, mAP = evaluator.evaluate(results, verbose=True)
    else:
        # multi-host: every process holds the identical (replicated)
        # detections — only process 0 writes, or concurrent writers race
        # on the same shared-FS path and corrupt the pickle
        if jax.process_index() == 0:
            import pickle

            with open(output_file, "wb") as f:
                pickle.dump(results, f)
        mAP = 0.0

    if loss_samples:
        # epoch-AVERAGED val losses (fetched once — per-batch device_get
        # would fence the pipelined dispatch), not the final batch's,
        # which is the zero-padded partial one and the most diluted
        fetched = jax.device_get(loss_samples)
        losses = {
            k: float(np.mean([d[k] for d in fetched]))
            for k in fetched[0]
        }
    if tb_writer is not None:
        tb_writer.add_scalar("validation/mAP", mAP, epoch)
    return mAP, losses
