from .annotations import load_annotation_db, find_empty_classes
from .dataset import UnAV100Dataset, truncate_feats
from .pipeline import Batcher, make_batcher
from . import synthetic

__all__ = [
    "load_annotation_db",
    "find_empty_classes",
    "UnAV100Dataset",
    "truncate_feats",
    "Batcher",
    "make_batcher",
    "synthetic",
]
