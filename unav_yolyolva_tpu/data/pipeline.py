"""Fixed-shape batching pipeline feeding the jitted step.

Replaces the reference's torch DataLoader + collate_fcn
(`/root/reference/libs/datasets/datasets.py:28-46`,
`/root/reference/libs/datasets/data_utils.py:123-229`) with a prefetching
iterator producing numpy batches of STATIC shape:

  visual      (B, T, 2048) zero-padded
  audio       (B, T, 128)
  mask        (B, T) bool
  gt_segments (B, N_max, 2) feature-grid coords
  gt_labels   (B, N_max) int32
  gt_valid    (B, N_max) bool
  fps / duration / feat_stride / feat_num_frames (B,)
  video_id    list[str] (host-only)

Per-frame aux targets and dense point labels are computed ON DEVICE from
gt_* inside the step (geometry/assign.py) — the reference's collate extras
and worker-side label assignment loops have no host-side counterpart here.

T policy matches the reference: training always pads to max_seq_len; eval
pads every batch to max_seq_len (reference collate rounds short eval batches
UP to max_seq_len, data_utils.py:171-173) — one compiled shape for all-short
batches. Batches containing an input LONGER than max_seq_len round up to the
next max_div_factor multiple (data_utils.py:174-176), one compile per length
bucket; the model handles the extra length via interpolated PE
(models/backbone.py) and the width-seq_len resampled guide view
(models/fusion.py) — the reference itself CRASHES on such inputs (its guide
width is architecturally hard-wired, multimodal_backbones.py:549,152;
UnAV-100's 60 s cap means its data never reaches that). See PARITY.md.
"""

from __future__ import annotations

import random
import threading
import queue as queue_mod
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..geometry.points import eval_seq_len
from .dataset import UnAV100Dataset


def pad_to(arr: np.ndarray, length: int) -> np.ndarray:
    if arr.shape[0] >= length:
        return arr[:length]
    pad = np.zeros((length - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def collate(
    items: List[Dict],
    *,
    max_seq_len: int,
    max_num_events: int,
    training: bool,
    max_div_factor: int = 1,
) -> Dict:
    lens = np.asarray([it["visual"].shape[0] for it in items])
    max_len = int(lens.max())
    if training:
        assert max_len <= max_seq_len, "train inputs must fit max_seq_len"
        t = max_seq_len
    else:
        # eval pads EVERY batch to max_seq_len (ref data_utils.py:171-173
        # rounds short batches UP to max_seq_len; the fusion guide width is
        # hard-wired to it) — so batches of only-short videos all share ONE
        # compiled shape. Batches containing a LONGER video round up to the
        # next max_div_factor multiple instead (ref data_utils.py:174-176;
        # geometry.points.eval_seq_len), one extra compile per length
        # bucket. The reference itself CRASHES on such inputs (its guide
        # projection width is architectural); the model runs them through
        # the width-seq_len resampled guide view (models/fusion.py) +
        # interpolated PE (models/backbone.py) — see PARITY.md.
        t = eval_seq_len(max_len, max_seq_len, max_div_factor)

    b = len(items)
    visual = np.stack([pad_to(it["visual"], t) for it in items])
    audio = np.stack([pad_to(it["audio"], t) for it in items])
    mask = np.arange(t)[None, :] < lens[:, None]

    segs = np.zeros((b, max_num_events, 2), np.float32)
    labels = np.zeros((b, max_num_events), np.int32)
    valid = np.zeros((b, max_num_events), bool)
    for i, it in enumerate(items):
        if it["segments"] is None:
            continue
        n = min(len(it["segments"]), max_num_events)
        segs[i, :n] = it["segments"][:n]
        labels[i, :n] = it["labels"][:n]
        valid[i, :n] = True

    return {
        "visual": visual,
        "audio": audio,
        "mask": mask,
        "gt_segments": segs,
        "gt_labels": labels,
        "gt_valid": valid,
        "fps": np.asarray([it["fps"] for it in items], np.float32),
        "duration": np.asarray([it["duration"] for it in items], np.float32),
        "feat_stride": np.asarray(
            [it["feat_stride"] for it in items], np.float32
        ),
        "feat_num_frames": np.asarray(
            [it["feat_num_frames"] for it in items], np.float32
        ),
        "video_id": [it["video_id"] for it in items],
    }


class Batcher:
    """Shuffling, prefetching batch iterator.

    IO and padding run on background threads (numpy releases the GIL for
    np.load) so the accelerator step overlaps with input loading — the
    TPU-side analogue of the reference's worker processes + prefetch_factor.
    """

    def __init__(
        self,
        dataset: UnAV100Dataset,
        batch_size: int,
        *,
        max_num_events: int = 64,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_threads: int = 2,
        prefetch: int = 4,
        process_index: int = 0,
        process_count: int = 1,
        pad_to: int = 0,
        max_div_factor: int = 1,
    ):
        """`batch_size` is the GLOBAL batch. With process_count > 1
        (multi-host DP), every process forms the same deterministic global
        batch order (shared seed/epoch) but loads and collates ONLY its own
        contiguous row block [pid*local_b, (pid+1)*local_b) — the layout
        parallel.mesh.shard_batch assembles into the global jax.Array.
        Per-process slicing requires drop_last (all batches full).

        The non-drop_last (eval) path slices per process too when `pad_to`
        (the FIXED padded global batch size, ceil(batch/n_dev)*n_dev) is
        given: each process loads only the rows of ITS block of the padded
        batch — ~1/N of the npy reads instead of every process loading the
        full global batch — and yields local arrays plus the full global
        `video_id` list (the detections come back replicated, so every
        process harvests all rows). Without `pad_to` eval keeps global
        batches, sliced downstream (single-process, and any caller that
        cannot know the mesh).
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.process_index = process_index
        self.process_count = process_count
        self.pad_to = pad_to
        if process_count > 1 and drop_last:
            assert batch_size % process_count == 0, (
                f"global batch {batch_size} must divide over "
                f"{process_count} processes"
            )
        # eval-side per-process IO slicing (multi-host only)
        self.rows_local = (
            process_count > 1 and not drop_last and pad_to > 0
        )
        if self.rows_local:
            assert pad_to % process_count == 0, (
                f"padded eval batch {pad_to} must divide over "
                f"{process_count} processes"
            )
        self.max_num_events = max_num_events
        self.max_div_factor = max_div_factor
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _index_batches(self) -> List[List[int]]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
            if self.process_count > 1:
                # this process's contiguous row block of every global batch
                lb = self.batch_size // self.process_count
                lo = self.process_index * lb
                batches = [b[lo : lo + lb] for b in batches]
        return batches

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()
        out_q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # bounded put that re-checks `stop`: an early consumer exit
            # (break mid-epoch, exception) must never strand a producer
            # blocked forever in Queue.put holding a full batch
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def produce(thread_id: int):
            rng = random.Random(
                (self.seed + self.epoch) * 7919 + thread_id
            )
            try:
                for bi in range(thread_id, len(batches), self.num_threads):
                    if stop.is_set():
                        return
                    idxs = batches[bi]
                    load_idxs = idxs
                    if self.rows_local:
                        lb = self.pad_to // self.process_count
                        lo = self.process_index * lb
                        load_idxs = idxs[lo : lo + lb]
                    if load_idxs:
                        items = [
                            self.dataset.load_item(j, rng)
                            for j in load_idxs
                        ]
                        batch = collate(
                            items,
                            max_seq_len=self.dataset.max_seq_len,
                            max_num_events=self.max_num_events,
                            training=self.dataset.is_training,
                            max_div_factor=self.max_div_factor,
                        )
                    else:
                        # this process's block of the padded batch is all
                        # padding (a short final batch): emit one zeroed
                        # template row — same semantics as the rows
                        # _device_batch zero-pads (mask all-False, never
                        # harvested); dims come from one template read
                        tmpl = collate(
                            [self.dataset.load_item(idxs[0], rng)],
                            max_seq_len=self.dataset.max_seq_len,
                            max_num_events=self.max_num_events,
                            training=self.dataset.is_training,
                            max_div_factor=self.max_div_factor,
                        )
                        batch = {
                            k: (np.zeros_like(v)
                                if isinstance(v, np.ndarray) else v)
                            for k, v in tmpl.items()
                        }
                    if self.rows_local:
                        # harvest needs ALL real rows' ids (detections are
                        # replicated across processes) — metadata only, no
                        # feature IO
                        batch["video_id"] = [
                            self.dataset.records[j].id for j in idxs
                        ]
                    if not put_or_stop((bi, batch)):
                        return
            except BaseException as e:  # propagate: a silently dead
                # producer would deadlock the consumer in out_q.get()
                put_or_stop((-1, e))

        threads = [
            threading.Thread(target=produce, args=(i,), daemon=True)
            for i in range(self.num_threads)
        ]
        for th in threads:
            th.start()

        pending: Dict[int, Dict] = {}
        next_bi = 0
        try:
            while next_bi < len(batches):
                while next_bi not in pending:
                    bi, batch = out_q.get()
                    if bi == -1:  # a producer raised — re-raise here
                        raise batch
                    pending[bi] = batch
                yield pending.pop(next_bi)
                next_bi += 1
        finally:
            stop.set()
            # producers wake from put_or_stop within 0.1 s; a generous join
            # bound keeps shutdown deterministic without masking a hang
            for th in threads:
                th.join(timeout=2.0)


def make_batcher(dataset, cfg: Dict, is_training: bool, seed: int = 0,
                 mesh=None) -> Batcher:
    # multi-host DP: the train batcher loads only this process's rows; the
    # eval batcher does too when the caller passes its mesh (needed to know
    # the fixed padded global batch size — without it eval falls back to
    # global batches, sliced downstream). jax import deferred — the
    # pipeline itself is numpy-only.
    process_index, process_count, pad_to = 0, 1, 0
    if is_training or mesh is not None:
        import jax

        process_index, process_count = jax.process_index(), jax.process_count()
    if not is_training and mesh is not None and process_count > 1:
        n_dev = mesh.devices.size
        pad_to = -(-cfg["loader"]["batch_size"] // n_dev) * n_dev
    # largest pyramid stride = the eval round-up quantum for over-length
    # inputs (reference unav100.py:84-89)
    mdf = cfg["model"]["scale_factor"] ** cfg["model"]["backbone_arch"][-1]
    return Batcher(
        dataset,
        cfg["loader"]["batch_size"],
        max_num_events=cfg["dataset"].get("max_num_events", 64),
        max_div_factor=mdf,
        shuffle=is_training,
        drop_last=is_training,
        seed=seed,
        num_threads=min(4, cfg["loader"].get("num_workers", 2) or 1),
        prefetch=cfg["loader"].get("prefetch", 4),
        process_index=process_index,
        process_count=process_count,
        pad_to=pad_to,
    )
