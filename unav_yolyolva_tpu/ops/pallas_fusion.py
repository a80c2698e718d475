"""Fused MaskedMHCA forward as a Pallas TPU kernel.

One MaskedMHCA (models/blocks.py:MaskedMHCA, reference blocks.py:119-245)
executes ~20 XLA ops: 3 depthwise convs, 3 channel-LayerNorms, 4 dense
projections, masked softmax, and several mask multiplies/converts. Profiling
on v5e shows the CSP/MHCA stack is bound by this NON-matmul work (bf16 gave
no speedup on a CSP layer), i.e. by HBM round-trips between small fusions.
This kernel runs the whole block — dwconv -> LN -> q/k/v dense -> masked
softmax attention -> output dense — per batch-block entirely in VMEM: the
only HBM traffic is x in / out once plus the weights.

Forward-only (no custom VJP): the model uses it on the eval path
(train=False) and on TPU only; training and CPU take the XLA module path,
which stays the numerical reference. `interpret=True` runs anywhere for
equivalence tests.

Weight packing (built by the wrapper from the flax param tree):
    dw  (3, 3, C)   depthwise taps for q/k/v           [which, tap, C]
    lnw (3, C), lnb (3, C)                              LayerNorm affine
    dwt (4, C, C)   dense kernels q/k/v/proj            [which, in, out]
    dbs (4, C)      dense biases
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _mhca_kernel(x1_ref, x2_ref, m_ref, dw_ref, lnw_ref, lnb_ref,
                 dwt_ref, dbs_ref, out_ref, *, heads: int, eps: float):
    x1 = x1_ref[:]                     # (R, T, C) compute dtype
    x2 = x2_ref[:]
    m = m_ref[:]                       # (R, T, 1) float32 {0,1}
    r, t, c = x1.shape
    d = c // heads
    scale = 1.0 / math.sqrt(d)
    dtype = x1.dtype
    mm = m.astype(dtype)               # (R, T, 1)

    def dwconv_ln(x, which):
        # depthwise conv k=3, zero padding (MaskedConv1D), output re-masked
        w = dw_ref[which].astype(dtype)              # (3, C)
        zero = jnp.zeros_like(x[:, :1])
        left = jnp.concatenate([zero, x[:, :-1]], axis=1)
        right = jnp.concatenate([x[:, 1:], zero], axis=1)
        y = left * w[0] + x * w[1] + right * w[2]
        y = y * mm
        # channel LayerNorm, fp32 stats (ChannelLayerNorm)
        yf = y.astype(jnp.float32)
        mu = jnp.mean(yf, axis=-1, keepdims=True)
        res = yf - mu
        var = jnp.mean(res * res, axis=-1, keepdims=True)
        out = res * jax.lax.rsqrt(var + eps)
        out = out * lnw_ref[which] + lnb_ref[which]
        return out.astype(dtype)

    def dense(x, which):
        w = dwt_ref[which].astype(dtype)             # (C, C)
        b = dbs_ref[which].astype(dtype)             # (C,)
        y = jnp.dot(x.reshape(r * t, c), w,
                    preferred_element_type=jnp.float32)
        return (y.astype(dtype) + b).reshape(r, t, c)

    q = dense(dwconv_ln(x2, 0), 0) * jnp.asarray(scale, dtype)
    k = dense(dwconv_ln(x1, 1), 1)
    v = dense(dwconv_ln(x1, 2), 2) * mm

    # Attention per head via STATIC lane slices: Mosaic rejects the
    # (R,T,H,D)->transpose->(R*H,T,D) shape cast, but D-wide lane slices,
    # single-batch-dim matmuls, and a minor-dim concat all lower cleanly.
    neg_inf = jnp.finfo(jnp.float32).min
    key_ok = jnp.transpose(m, (0, 2, 1)) > 0.0          # (R, 1, T)
    any_kv = jnp.max(m, axis=1, keepdims=True) > 0.0    # (R, 1, 1)
    outs = []
    for h_i in range(heads):
        sl = slice(h_i * d, (h_i + 1) * d)
        att = jnp.einsum("rtd,rsd->rts", q[:, :, sl], k[:, :, sl],
                         preferred_element_type=jnp.float32)   # (R, T, T)
        att = jnp.where(key_ok, att, neg_inf)
        att = jnp.where(any_kv, att, 0.0)
        att = jax.nn.softmax(att, axis=-1)
        att = att * any_kv.astype(att.dtype)
        outs.append(
            jnp.einsum("rts,rsd->rtd", att.astype(dtype), v[:, :, sl],
                       preferred_element_type=jnp.float32).astype(dtype)
        )
    out = dense(jnp.concatenate(outs, axis=-1), 3) * mm
    out_ref[:] = out


def _pick_rows(b: int, t: int, c: int, itemsize: int) -> int:
    """Largest batch block R (divisor of b) whose working set fits VMEM.

    Budget ~10 MB: ~8 activation-sized (R,T,C) buffers (x1/x2 double-
    buffered by the pipeline + q/k/v/out) plus the fp32 attention matrix
    (R, H, T, T); weights are grid-invariant and counted separately.
    """
    budget = 10 * 1024 * 1024
    r = b
    while r > 1:
        act = 8 * r * t * c * itemsize
        att = 2 * r * 4 * t * t * 4  # fp32 logits + softmax temp
        if act + att <= budget and b % r == 0:
            return r
        r //= 2
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("heads", "eps", "interpret"),
)
def mhca_fused(
    x1: Array,      # (B, T, C) k/v source
    x2: Array,      # (B, T, C) q source
    mask: Array,    # (B, T) bool
    dw: Array,      # (3, 3, C)
    lnw: Array,     # (3, C)
    lnb: Array,     # (3, C)
    dwt: Array,     # (4, C, C)
    dbs: Array,     # (4, C)
    *,
    heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> Array:
    b, t, c = x1.shape
    # (B, T, 1): the trailing two block dims must match the array dims (or
    # be tile multiples) — a 2D (R, T) mask block with small R violates the
    # sublane constraint
    m = mask.astype(jnp.float32)[..., None]
    r = _pick_rows(b, t, c, x1.dtype.itemsize)
    grid = (b // r,)

    row_spec = pl.BlockSpec((r, t, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((r, t, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    def w_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_mhca_kernel, heads=heads, eps=eps),
        grid=grid,
        in_specs=[
            row_spec, row_spec, mask_spec,
            w_spec(dw.shape), w_spec(lnw.shape), w_spec(lnb.shape),
            w_spec(dwt.shape), w_spec(dbs.shape),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x1.dtype),
        interpret=interpret,
    )(x1, x2, m, dw, lnw, lnb, dwt, dbs)


def pack_mhca_params(p) -> Tuple[Array, ...]:
    """Pack a MaskedMHCA param subtree (models/blocks.py param names) into
    the kernel's weight arrays. Depthwise conv kernels are flax Conv
    (k, in/groups=1, C) -> (k, C); dense kernels are (C, C)."""
    dw = jnp.stack([
        p["query_conv"]["conv"]["kernel"][:, 0, :],
        p["key_conv"]["conv"]["kernel"][:, 0, :],
        p["value_conv"]["conv"]["kernel"][:, 0, :],
    ])
    lnw = jnp.stack([
        p["query_norm"]["weight"], p["key_norm"]["weight"],
        p["value_norm"]["weight"],
    ])
    lnb = jnp.stack([
        p["query_norm"]["bias"], p["key_norm"]["bias"],
        p["value_norm"]["bias"],
    ])
    dwt = jnp.stack([
        p["query"]["kernel"], p["key"]["kernel"], p["value"]["kernel"],
        p["proj"]["kernel"],
    ])
    dbs = jnp.stack([
        p["query"]["bias"], p["key"]["bias"], p["value"]["bias"],
        p["proj"]["bias"],
    ])
    return dw, lnw, lnb, dwt, dbs
