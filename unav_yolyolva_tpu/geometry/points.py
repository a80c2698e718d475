"""Temporal "point" (anchor) generation for the 1D FCOS-style detector.

Equivalent of the reference PointGenerator
(`/root/reference/libs/datasets/loc_generators.py:26-103`), but as a pure
host-side function producing a static (P, 4) array for a given sequence
length. Each row is (t, reg_range_lo, reg_range_hi, stride). Because shapes
are static under XLA, the points for a given T are compile-time constants
closed over by the jitted step — there is no buffering/slicing machinery.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def pyramid_strides(scale_factor: int, num_levels: int) -> List[int]:
    """FPN strides [1, s, s^2, ...] (reference unav100.py:80)."""
    return [scale_factor ** i for i in range(num_levels)]


def eval_seq_len(feat_len: int, max_seq_len: int, max_div_factor: int) -> int:
    """Padded sequence length used at eval time.

    Reference semantics (loc_generators.py:87-95, data_utils.py:171-176):
    lengths up to max_seq_len pad to max_seq_len; longer ones round up to the
    next multiple of the max pyramid stride.
    """
    if feat_len <= max_seq_len:
        return max_seq_len
    return (feat_len + max_div_factor - 1) // max_div_factor * max_div_factor


def generate_points(
    seq_len: int,
    regression_range: Sequence[Tuple[float, float]],
    scale_factor: int = 2,
    use_offset: bool = False,
) -> List[np.ndarray]:
    """Per-level point grids for a sequence of length `seq_len`.

    Returns a list of float32 arrays [(T_l, 4)] with T_l = seq_len / stride_l.
    Matches PointGenerator._generate_points + forward slicing
    (loc_generators.py:61-103) for the in-buffer case.
    """
    num_levels = len(regression_range)
    strides = pyramid_strides(scale_factor, num_levels)
    out = []
    for level, stride in enumerate(strides):
        assert seq_len % stride == 0, (
            f"seq_len {seq_len} not divisible by stride {stride}"
        )
        t = np.arange(0, seq_len, stride, dtype=np.float32)
        if use_offset:
            t = t + 0.5 * stride
        lo, hi = regression_range[level]
        pts = np.stack(
            [
                t,
                np.full_like(t, lo),
                np.full_like(t, hi),
                np.full_like(t, stride),
            ],
            axis=1,
        )
        out.append(pts)
    return out


def concat_points(points: List[np.ndarray]) -> np.ndarray:
    """Concatenate per-level points into one (P, 4) array."""
    return np.concatenate(points, axis=0)


def level_sizes(seq_len: int, scale_factor: int, num_levels: int) -> List[int]:
    return [seq_len // (scale_factor ** i) for i in range(num_levels)]
