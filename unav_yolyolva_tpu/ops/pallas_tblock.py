"""Fused TransformerBlock (stem self-attention) as a Pallas TPU kernel.

One stride-1 TransformerBlock (models/blocks.py:TransformerBlock, reference
blocks.py:247-323) runs LN -> LN -> MaskedMHCA -> droppath-scaled residual
add -> LN -> 4x MLP (dense/GELU/dense) -> droppath-scaled residual add.
With only the inner MHCA fused (round 3), the surrounding LayerNorms, the
residual adds and the MLP still cost ~10 HBM round-trips per block, and the
backbone stem runs FOUR such blocks per step at (B, 224, 512)
(models/backbone.py:102-110). This kernel runs the WHOLE block per batch
block in VMEM: HBM traffic is x in / out once, plus weights.

MEASURED OUTCOME (v5e, B=64 T=224 C=512 bf16, tools/bench_tblock.py):
eval fwd 1.42 ms fused vs 1.44 ms default (XLA block + inner fused MHCA)
vs 1.40 ms plain XLA — neutral; train fwd+bwd 3.89 ms fused vs 3.75 ms
default vs 4.05 ms plain — the default path WINS by ~4%. XLA already
fuses the surrounding LN/residual/MLP elementwise glue into the matmuls,
and the block is MXU-compute-bound (tools/roofline.py), so eliminating
the remaining HBM round-trips buys nothing, while the recompute backward
pays its recompute. The path is therefore OPT-IN
(UNAV_FUSED_TBLOCK=always), kept as a tested, numerically-pinned
alternative and as the substrate for any future cross-block fusion.

Train path: jax.custom_vjp whose backward is a second Pallas kernel that
recomputes the block per batch block and walks the chain in reverse — the
kernel body is jax.vjp of the same `_tblock_compute` the forward runs (the
ops/pallas_csp.py recompute-backward pattern), so gradients are the
gradients of the XLA composition the parity suite pins. Weight grads are
accumulated across grid steps in fp32 VMEM-resident output blocks.

Stochastic depth (AffineDropPath) keeps exact RNG parity with the XLA
module path: the flax module draws the SAME per-sample droppath masks from
the SAME rng stream (models/blocks.py AffineDropPath multiplier mode) and
hands the kernel two dense per-sample multipliers (B, 1, C) =
scale * drop_mask / keep_prob — inside the kernel they are plain
broadcasts, outside them flax AD recovers d(scale) through the product.

Weight packing (pack_tblock_params, from the flax param tree):
    LNW3 (3, C), LNB3 (3, C)      ln11 / ln12 / ln2 affine
    dw (3, 3, C), lnw (3, C), lnb (3, C), dwt (4, C, C), dbs (4, C)
                                  the attn MaskedMHCA (pack_mhca_params)
    w1 (C, H), b1 (1, H)          mlp_fc1   (H = 4C)
    w2 (H, C), b2 (1, C)          mlp_fc2
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fusion import (TRACED_FLOPS, _mhca_compute, batch_block_spec,
                            replicated_spec, shard_over_batch)

Array = jnp.ndarray

TBLOCK_VMEM_LIMIT = 100 * 1024 * 1024

# Mosaic has no erf/erfc primitive (jax.nn.gelu(approximate=False) fails to
# lower on real TPUs), so the kernel carries XLA's own f32 erf rational
# approximation (openxla xla/hlo/builder/lib/math.cc ErfImpl32: clamp to
# [-4, 4], odd rational in x^2) — measured <= 7 ulp from jax.lax.erf on
# device, so the fused block stays within the XLA-path parity tolerances.
_ERF_ALPHA = (0.00022905065861350646, 0.0034082910107109506,
              0.050955695062380861, 0.18520832239976145, 1.128379143519084)
_ERF_BETA = (-1.1791602954361697e-7, 0.000023547966471313185,
             0.0010179625278914885, 0.014070470171167667,
             0.11098505178285362, 0.49746925110067538, 1.0)


def _horner(coeffs, x):
    acc = jnp.full_like(x, coeffs[0])
    for c in coeffs[1:]:
        acc = acc * x + c
    return acc


def _erf_f32(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    return x * _horner(_ERF_ALPHA, x2) / _horner(_ERF_BETA, x2)


def _gelu_exact(x):
    """erf-form GELU (the module path's nn.gelu(approximate=False)),
    erf evaluated in fp32 via the XLA-equivalent rational."""
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + _erf_f32(xf * 0.7071067811865475))
    return out.astype(x.dtype)


def _tblock_compute(x, mm, mult_a, mult_m, LNW3, LNB3, dw, lnw, lnb, dwt,
                    dbs, w1, b1, w2, b2, *, heads: int, eps: float,
                    cdtype):
    """Value-level TransformerBlock (stride 1, no pos_embd).

    Mirrors models/blocks.py:TransformerBlock's dtype semantics exactly:
    x / mm / the droppath multipliers and the RESIDUAL STREAM are fp32
    (under a bf16 policy the module's residual adds promote to fp32
    because the AffineDropPath scale param is fp32 and the pos-encoded
    stem input arrives fp32); the LN outputs, the MHCA block, and the MLP
    matmuls run in `cdtype` (the module compute dtype). mult_a/mult_m are
    (R, 1, C) = scale * droppath_mask / keep (ones when path_pdrop == 0).
    """
    r, t, c = x.shape
    f32 = jnp.float32
    mm_c = mm.astype(cdtype)

    def ln(z, w, b):
        zf = z.astype(f32)
        mu = jnp.mean(zf, axis=-1, keepdims=True)
        res = zf - mu
        var = jnp.mean(res * res, axis=-1, keepdims=True)
        out = res * jax.lax.rsqrt(var + eps)
        return (out * w + b).astype(cdtype)

    h1 = ln(x, LNW3[0], LNB3[0])        # ln11 -> k/v source
    h2 = ln(x, LNW3[1], LNB3[1])        # ln12 -> q source
    attn = _mhca_compute(h1, h2, mm_c, dw, lnw, lnb, dwt, dbs,
                         heads=heads, eps=eps)
    out = x * mm + attn.astype(f32) * mult_a

    h = ln(out, LNW3[2], LNB3[2])
    y = jnp.dot(h.reshape(r * t, c), w1.astype(cdtype),
                preferred_element_type=f32)
    y = y.astype(cdtype) + b1.astype(cdtype)
    y = _gelu_exact(y)
    y = jnp.dot(y, w2.astype(cdtype), preferred_element_type=f32)
    y = (y.astype(cdtype) + b2.astype(cdtype)).reshape(r, t, c) * mm_c
    return out + y.astype(f32) * mult_m


def tblock_reference(x, mask, mult_a, mult_m, *weights, heads: int,
                     eps: float = 1e-5, cdtype=jnp.float32):
    """The kernel's math in plain jnp (one XLA program) — test oracle."""
    mm = mask.astype(jnp.float32)[..., None]
    return _tblock_compute(x.astype(jnp.float32), mm,
                           mult_a.astype(jnp.float32),
                           mult_m.astype(jnp.float32), *weights,
                           heads=heads, eps=eps, cdtype=cdtype)


def _tblock_kernel(x_ref, m_ref, ma_ref, mmlp_ref, *refs, heads: int,
                   eps: float, cdtype):
    w_refs, out_ref = refs[:-1], refs[-1]
    out_ref[:] = _tblock_compute(
        x_ref[:], m_ref[:], ma_ref[:], mmlp_ref[:],
        *[w[:] for w in w_refs], heads=heads, eps=eps, cdtype=cdtype,
    )


def _pick_rows_tb(b: int, t: int, c: int, hidden: int, heads: int,
                  itemsize: int) -> int:
    """Largest batch block R (divisor of b) within a conservative VMEM
    budget. Liveness: the MHCA working set (~8 (t, c) activations + the
    fp32 per-head attention matrix, pallas_fusion._pick_rows) plus the
    block's own LN outputs / residuals (~6 more (t, c)) and the MLP hidden
    (t, hidden) with its fp32 matmul accumulator; doubled for the measured
    Mosaic stack factor (pallas_fusion._pick_rows_bwd)."""
    budget = 48 * 1024 * 1024
    r = b
    while r > 1:
        act = 14 * r * t * c * itemsize
        mlp = r * t * hidden * itemsize + r * t * hidden * (4 - itemsize)
        att = 2 * r * heads * t * t * 4
        if 2 * (act + mlp + att) <= budget and b % r == 0:
            return r
        r //= 2
    return 1


def _tblock_fwd_call(x, m, ma, mmlp, *weights, heads, eps, cdtype,
                     interpret):
    b, t, c = x.shape
    hidden = weights[7].shape[-1]       # w1 (C, H)
    r = _pick_rows_tb(b, t, c, hidden, heads, x.dtype.itemsize)
    grid = (b // r,)

    row_spec = batch_block_spec(r, t, c)
    w_spec = replicated_spec

    return pl.pallas_call(
        functools.partial(_tblock_kernel, heads=heads, eps=eps,
                          cdtype=cdtype),
        grid=grid,
        in_specs=[
            row_spec, batch_block_spec(r, t, 1),
            batch_block_spec(r, 1, c), batch_block_spec(r, 1, c),
        ] + [w_spec(w.shape) for w in weights],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=TBLOCK_VMEM_LIMIT,
        ),
    )(x, m, ma, mmlp, *weights)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _tblock_diff(heads, cdtype, interpret, x, m, ma, mmlp, *weights):
    return _tblock_fwd_call(x, m, ma, mmlp, *weights, heads=heads,
                            eps=1e-5, cdtype=cdtype, interpret=interpret)


def _tblock_diff_fwd(heads, cdtype, interpret, x, m, ma, mmlp, *weights):
    out = _tblock_fwd_call(x, m, ma, mmlp, *weights, heads=heads,
                           eps=1e-5, cdtype=cdtype, interpret=interpret)
    return out, (x, m, ma, mmlp, weights)


def _tblock_bwd_kernel(*refs, n_weights: int, heads: int, eps: float,
                       cdtype):
    """Recompute-backward of the whole block for one batch block: the body
    is jax.vjp of `_tblock_compute`, so recompute + reverse walk stay
    VMEM-resident (ops/pallas_csp._csp_bwd_kernel pattern). Weight grads
    accumulate across grid steps in fp32."""
    i = pl.program_id(0)
    x_ref, m_ref, ma_ref, mmlp_ref = refs[:4]
    w_refs = refs[4:4 + n_weights]
    gout_ref = refs[4 + n_weights]
    dx_ref, dma_ref, dmmlp_ref = refs[5 + n_weights:8 + n_weights]
    gw_refs = refs[8 + n_weights:]

    x = x_ref[:]
    mm = m_ref[:]
    weights = [w[:] for w in w_refs]

    def f(x_, ma_, mmlp_, *ws):
        return _tblock_compute(x_, mm, ma_, mmlp_, *ws, heads=heads,
                               eps=eps, cdtype=cdtype)

    _, vjp = jax.vjp(f, x, ma_ref[:], mmlp_ref[:], *weights)
    grads = vjp(gout_ref[:])
    dx_ref[:] = grads[0]
    dma_ref[:] = grads[1]
    dmmlp_ref[:] = grads[2]
    for ref, gr in zip(gw_refs, grads[3:]):
        gr32 = gr.astype(jnp.float32)

        @pl.when(i == 0)
        def _(ref=ref, gr32=gr32):
            ref[:] = gr32

        @pl.when(i > 0)
        def _(ref=ref, gr32=gr32):
            ref[:] = ref[:] + gr32


def _pick_rows_tb_bwd(b: int, t: int, c: int, hidden: int, heads: int,
                      itemsize: int) -> int:
    """VMEM model for the recompute backward: AD keeps the forward's
    residuals (3 block-level LN internals in fp32, the MHCA recompute's
    ~22-buffer liveness, the MLP hidden pre/post GELU) alive alongside the
    backward temporaries; ~30 (t, c) activations + 3 fp32 (t, c) LN yhats
    + 2 (t, hidden) MLP buffers with an fp32 accumulator + 2x the fp32
    per-head attention matrices; 2x measured Mosaic stack factor."""
    budget = 44 * 1024 * 1024
    r = b
    while r > 1:
        act = 30 * r * t * c * itemsize + 6 * r * t * c * 4
        mlp = 2 * r * t * hidden * itemsize + r * t * hidden * (4 - itemsize)
        att = 4 * r * heads * t * t * 4
        if 2 * (act + mlp + att) <= budget and b % r == 0:
            return r
        r //= 2
    return 1


def _tblock_diff_bwd(heads, cdtype, interpret, res, gout):
    x, m, ma, mmlp, weights = res
    b, t, c = x.shape
    hidden = weights[7].shape[-1]
    r = _pick_rows_tb_bwd(b, t, c, hidden, heads, x.dtype.itemsize)
    grid = (b // r,)

    row_spec = batch_block_spec(r, t, c)
    mult_spec = batch_block_spec(r, 1, c)
    w_spec = replicated_spec

    in_specs = (
        [row_spec, batch_block_spec(r, t, 1), mult_spec, mult_spec]
        + [w_spec(w.shape) for w in weights]
        + [row_spec]
    )
    out_specs = (row_spec, mult_spec, mult_spec) + tuple(
        w_spec(w.shape) for w in weights
    )
    out_shapes = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct(ma.shape, ma.dtype),
        jax.ShapeDtypeStruct(mmlp.shape, mmlp.dtype),
    ) + tuple(
        jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights
    )

    outs = pl.pallas_call(
        functools.partial(_tblock_bwd_kernel, n_weights=len(weights),
                          heads=heads, eps=1e-5, cdtype=cdtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=TBLOCK_VMEM_LIMIT,
        ),
    )(x, m, ma, mmlp, *weights, gout)
    dx, dma, dmmlp = outs[0], outs[1], outs[2]
    gws = tuple(gw.astype(w.dtype) for gw, w in zip(outs[3:], weights))
    return (dx, jnp.zeros_like(m), dma, dmmlp) + gws


_tblock_diff.defvjp(_tblock_diff_fwd, _tblock_diff_bwd)


def _record_tblock_flops(b, t, c, hidden, train):
    """Analytic FLOPs (pallas_fusion.TRACED_FLOPS convention)."""
    mhca_dense = 8 * b * t * c * c
    mhca_attn = 4 * b * t * t * c
    mhca = 18 * b * t * c + mhca_dense + mhca_attn
    mlp = 4 * b * t * c * hidden
    fwd = mhca + mlp
    total = fwd
    if train:
        # recompute + ~2x matmul work for input/weight grads
        total += fwd + 2 * (mhca_dense + mhca_attn + mlp)
    TRACED_FLOPS.append(float(total))


def tblock_fused(
    x: Array,        # (B, T, C) — promoted to fp32 (residual stream)
    mask: Array,     # (B, T) bool
    mult_a: Array,   # (B, 1, C) attn-branch multiplier (scale * droppath)
    mult_m: Array,   # (B, 1, C) mlp-branch multiplier
    *weights: Array,
    heads: int,
    cdtype=jnp.float32,
    train: bool = False,
    interpret: bool = False,
) -> Array:
    """Fused stride-1 TransformerBlock (self-attention stem form).
    Returns fp32 — the module path's residual-stream dtype."""
    b, t, c = x.shape
    _record_tblock_flops(b, t, c, weights[7].shape[-1], train)
    f32 = jnp.float32
    x = x.astype(f32)
    m = mask.astype(f32)[..., None]
    mult_a = mult_a.astype(f32)
    mult_m = mult_m.astype(f32)

    def call(x_, m_, ma_, mm_, *ws):
        if train:
            return _tblock_diff(heads, cdtype, interpret,
                                x_, m_, ma_, mm_, *ws)
        return _tblock_fwd_call(x_, m_, ma_, mm_, *ws, heads=heads,
                                eps=1e-5, cdtype=cdtype,
                                interpret=interpret)

    call = shard_over_batch(call, b, n_data=4, n_repl=len(weights))
    return call(x, m, mult_a, mult_m, *weights)


def pack_tblock_params(p) -> Tuple[Array, ...]:
    """Pack a TransformerBlock param subtree (models/blocks.py names) into
    the kernel weight arrays."""
    from .pallas_fusion import pack_mhca_params

    lnw3 = jnp.stack([
        p["ln11"]["weight"], p["ln12"]["weight"], p["ln2"]["weight"],
    ])
    lnb3 = jnp.stack([
        p["ln11"]["bias"], p["ln12"]["bias"], p["ln2"]["bias"],
    ])
    dw, lnw, lnb, dwt, dbs = pack_mhca_params(p["attn"])
    return (
        lnw3, lnb3, dw, lnw, lnb, dwt, dbs,
        p["mlp_fc1"]["kernel"], p["mlp_fc1"]["bias"][None],
        p["mlp_fc2"]["kernel"], p["mlp_fc2"]["bias"][None],
    )
