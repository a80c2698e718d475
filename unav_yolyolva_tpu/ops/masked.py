"""Pure-function building blocks for masked 1D sequence processing.

Layout convention across the framework: activations are (B, T, C)
(channels-last), so C maps onto TPU lanes and T onto sublanes. The reference
uses (B, C, T); the data pipeline transposes once at ingestion.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def masked_conv1d_out_mask(mask: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Mask propagation through a strided conv.

    The reference downsamples the boolean mask with nearest-neighbour
    interpolation to T//stride (blocks.py:45-52), which for integer factors
    equals taking every stride-th element starting at index 0.

    mask: (B, T) bool -> (B, T//stride) bool
    """
    if stride == 1:
        return mask
    return mask[:, ::stride]


def channel_layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the channel (last) dimension with biased variance.

    Matches reference LayerNorm (blocks.py:64-103), which normalizes the C
    axis of (B, C, T) with E[(x-mu)^2] (no Bessel correction).
    """
    mu = jnp.mean(x, axis=-1, keepdims=True)
    res = x - mu
    sigma = jnp.mean(res * res, axis=-1, keepdims=True)
    out = res * jnp.reciprocal(jnp.sqrt(sigma + eps))
    return out * weight + bias


def sinusoid_encoding(n_position: int, d_hid: int) -> np.ndarray:
    """Standard sin/cos positional table, shape (T, C) float32.

    Matches get_sinusoid_encoding (blocks.py:106-117); the caller scales by
    1/sqrt(C) at the use site as in the reference backbone.
    """
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    dim = np.arange(d_hid, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2.0 * (dim // 2) / d_hid)
    table = np.empty((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


def interpolate_pe_linear(pe: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """Linear interpolation of a positional table (T, C) -> (new_len, C).

    Matches F.interpolate(..., mode='linear', align_corners=False) used for
    over-length eval sequences (multimodal_backbones.py:794-797).
    """
    t_in = pe.shape[0]
    if t_in == new_len:
        return pe
    scale = t_in / new_len
    # align_corners=False source coordinates
    src = (jnp.arange(new_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, t_in - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    w = (src - lo.astype(jnp.float32))[:, None]
    return pe[lo] * (1.0 - w) + pe[hi] * w


def resample_time_linear(x: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """Linear resampling of the time axis of (B, T, C) -> (B, new_len, C).

    Same half-pixel-center coordinates as interpolate_pe_linear
    (= F.interpolate mode='linear', align_corners=False). Used by the
    over-length-eval guide view (models/fusion.py): inputs longer than
    max_seq_len are a path the reference CRASHES on (its guide projection
    in_features is hard-wired to max_seq_len,
    /root/reference/libs/modeling/multimodal_backbones.py:549,152), so this
    is a documented tpu-side extension, exact identity at T == new_len.
    """
    t_in = x.shape[1]
    if t_in == new_len:
        return x
    scale = t_in / new_len
    src = (jnp.arange(new_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, t_in - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    w = (src - lo.astype(jnp.float32))[None, :, None]
    return (
        jnp.take(x, lo, axis=1) * (1.0 - w) + jnp.take(x, hi, axis=1) * w
    ).astype(x.dtype)


def resample_mask_nearest(mask: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """Nearest-neighbour resampling of a (B, T) bool mask to (B, new_len) —
    the validity counterpart of resample_time_linear."""
    t_in = mask.shape[1]
    if t_in == new_len:
        return mask
    src = jnp.clip(
        ((jnp.arange(new_len, dtype=jnp.float32) + 0.5) * (t_in / new_len))
        .astype(jnp.int32),
        0, t_in - 1,
    )
    return jnp.take(mask, src, axis=1)


def adaptive_avg_pool1d(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Adaptive average pooling over the T axis of (..., T, C).

    Matches nn.AdaptiveAvgPool1d bin boundaries: bin i covers
    [floor(i*T/out), ceil((i+1)*T/out)). Note the reference's
    `MaskedAdaptiveMaxPool1d` (multimodal_backbones.py:358-365) subclasses
    AdaptiveAvgPool1d, so despite its name it AVERAGES and ignores the mask —
    replicated faithfully.
    """
    t_in = x.shape[-2]
    if t_in % out_size == 0:
        k = t_in // out_size
        new_shape = x.shape[:-2] + (out_size, k, x.shape[-1])
        return jnp.mean(x.reshape(new_shape), axis=-2)
    # general (rarely hit: pyramid lengths are multiples of 4)
    outs = []
    for i in range(out_size):
        lo = (i * t_in) // out_size
        hi = -(-((i + 1) * t_in) // out_size)
        outs.append(jnp.mean(x[..., lo:hi, :], axis=-2))
    return jnp.stack(outs, axis=-2)
