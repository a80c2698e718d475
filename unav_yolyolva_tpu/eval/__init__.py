from .decode import decode_predictions, postprocess_batch
from .metrics import ANETdetection

__all__ = ["decode_predictions", "postprocess_batch", "ANETdetection"]
