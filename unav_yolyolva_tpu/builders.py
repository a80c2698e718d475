"""Builder functions mirroring the reference's public factory API
(`/root/reference/libs/datasets/datasets.py:21-50`,
`/root/reference/libs/modeling/models.py:25-35`), so users of the reference
find the same entry points here.
"""

from __future__ import annotations

from typing import Dict, Sequence

from .core.registry import (
    BACKBONES,
    DATASETS,
    DEPENDENCY_BLOCKS,
    GENERATORS,
    META_ARCHS,
)
from .geometry import points as _points

# point "generator" registry entry: the functional equivalent of the
# reference PointGenerator (loc_generators.py:26-103)
GENERATORS._entries.setdefault("point", _points.generate_points)


def make_dataset(name: str, is_training: bool, split: Sequence[str], **kwargs):
    return DATASETS.build(name, is_training, split, **kwargs)


def make_data_loader(dataset, is_training: bool, cfg: Dict, seed: int = 0):
    from .data.pipeline import make_batcher

    return make_batcher(dataset, cfg, is_training, seed=seed)


def make_generator(name: str, **kwargs):
    return GENERATORS.get(name)


def make_multimodal_backbone(name: str, **kwargs):
    return BACKBONES.build(name, **kwargs)


def make_multimodal_meta_arch(name: str, **kwargs):
    return META_ARCHS.build(name, **kwargs)


def make_dependency_block(name: str, **kwargs):
    return DEPENDENCY_BLOCKS.build(name, **kwargs)
