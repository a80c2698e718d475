from .blocks import (
    MaskedConv1D,
    ChannelLayerNorm,
    MaskedMHCA,
    TransformerBlock,
    AffineDropPath,
    LearnableScale,
)
from .backbone import ConvTransformerBackbone
from .alignment import Alignment
from .fusion import FusionModule
from .heads import ClsHead, RegHead
from .meta_arch import LocPointTransformer, build_model
from .dependency import DependencyBlock

__all__ = [
    "MaskedConv1D",
    "ChannelLayerNorm",
    "MaskedMHCA",
    "TransformerBlock",
    "AffineDropPath",
    "LearnableScale",
    "ConvTransformerBackbone",
    "Alignment",
    "FusionModule",
    "ClsHead",
    "RegHead",
    "LocPointTransformer",
    "DependencyBlock",
    "build_model",
]
