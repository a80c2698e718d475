from .points import generate_points, eval_seq_len, pyramid_strides
from .assign import assign_labels, frame_targets

__all__ = [
    "generate_points",
    "eval_seq_len",
    "pyramid_strides",
    "assign_labels",
    "frame_targets",
]
