from .losses import (
    sigmoid_focal_loss,
    focal_loss_score,
    ctr_diou_loss_1d,
)
from .masked import (
    masked_conv1d_out_mask,
    channel_layer_norm,
    sinusoid_encoding,
)

__all__ = [
    "sigmoid_focal_loss",
    "focal_loss_score",
    "ctr_diou_loss_1d",
    "masked_conv1d_out_mask",
    "channel_layer_norm",
    "sinusoid_encoding",
]
