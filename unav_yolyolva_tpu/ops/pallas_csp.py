"""Fused MaxSigmoidCSPLayer forward as a Pallas TPU kernel.

One CSP layer (models/fusion.py:MaxSigmoidCSPLayer, reference
backbones.py:199-256) executes ~80 XLA ops: a 1x1 main conv, THREE chained
MaskedMHCA blocks (each itself ~20 ops), the max-sigmoid guide attention,
a k=3 projection conv, and a 1x1 final conv over the 6-part concat.
Profiling on v5e shows the small pyramid levels are pure overhead: a
T=7 layer costs ~2 ms against ~3.9 ms for T=224 (tools/profile_forward.py)
— the work shrinks 32x but the time doesn't. This kernel runs the WHOLE
layer per batch block in VMEM; the only HBM traffic is x/guide in, out
once, plus the weights.

Train path: jax.custom_vjp whose backward is a SECOND Pallas kernel that
recomputes the layer per batch block and walks the chain in reverse
(flash-attention style): the kernel body is jax.vjp of the same
`_csp_compute` the forward kernel runs, so recompute + backward stay
VMEM-resident and the gradients are the gradients of the XLA composition
the parity suite pins (same graph, Mosaic numerics). Weight grads are
accumulated across grid steps in fp32 VMEM-resident output blocks, like
the fused MHCA backward (pallas_fusion._mhca_bwd_kernel). Set
UNAV_CSP_BWD=xla to fall back to the round-3 backward (vjp of the XLA
composition with only the MHCA sub-blocks kernelized).

Sequence lengths that are not sublane multiples (T=7/14/28 levels) are
zero-padded to the next multiple of 8 by the wrapper; every op in the
layer is mask-correct under zero padding (proven in tests against the
unpadded XLA module).

Weight packing (pack_csp_params, from the flax param tree):
    wmain  (Cin, 2*mid), bmain (1, 2*mid)       main 1x1 conv
    DW (3,3,3,mid)  LNW/LNB (3,3,mid)           3 MaskedMHCA blocks
    DWT (3,4,mid,mid)  DBS (3,4,mid)            (pack_mhca_params x3)
    wg (Fg, emb), bg (1, emb)                   guide_fc
    battn (1, H)                                per-head attention bias
    wproj (3, mid, mid), bproj (1, mid)         k=3 projection conv
    wfinal (6*mid, Cout), bfinal (1, Cout)      final 1x1 conv
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fusion import (_mhca_compute, batch_block_spec,
                            replicated_spec)

Array = jnp.ndarray

CSP_VMEM_LIMIT = 100 * 1024 * 1024


def _csp_compute(x, g, mm, wmain, bmain, DW, LNW, LNB, DWT, DBS,
                 wg, bg, battn, wproj, bproj, wfinal, bfinal,
                 *, attn_heads: int, mhca_heads: int, eps: float,
                 mhca_fn=None):
    """Value-level CSP layer; mm is the (R, T, 1) mask in compute dtype.
    Mirrors models/fusion.py:MaxSigmoidCSPLayer exactly (same op order and
    fp32 islands), so the kernel and the XLA reference share this body.
    `mhca_fn(x, mm, dw, lnw, lnb, dwt, dbs)` overrides how the three MHCA
    blocks run (the backward recompute plugs in the fused MHCA custom-VJP
    kernels here)."""
    r, t, cin = x.shape
    dtype = x.dtype
    mid = DWT.shape[-1]
    f32 = jnp.float32

    def matmul(a, w, b):
        c_in = a.shape[-1]
        y = jnp.dot(a.reshape(-1, c_in), w.astype(dtype),
                    preferred_element_type=f32)
        y = y.astype(dtype) + b.astype(dtype)
        return y.reshape(r, t, -1)

    # main 1x1 conv -> split (MaskedConv1D masks the OUTPUT only)
    y = matmul(x, wmain, bmain) * mm
    parts = [y[..., :mid], y[..., mid:]]

    # three chained MaskedMHCA blocks
    if mhca_fn is None:
        def mhca_fn(h, mm_, *ws):
            return _mhca_compute(h, h, mm_, *ws, heads=mhca_heads, eps=eps)
    for bi in range(3):
        out = mhca_fn(parts[-1], mm, DW[bi], LNW[bi], LNB[bi],
                      DWT[bi], DBS[bi])
        parts.append(out)

    # max-sigmoid guide attention (embed == mid => no embed conv,
    # models/fusion.py:186-189)
    p = parts[-1]
    ng = g.shape[1]
    gp = jnp.dot(g.reshape(-1, g.shape[-1]), wg.astype(dtype),
                 preferred_element_type=f32).astype(dtype)
    gp = (gp + bg.astype(dtype)).reshape(r, ng, -1)     # (R, Ng, emb)
    emb = gp.shape[-1]
    hc = emb // attn_heads
    och = mid // attn_heads
    battn_f = battn.astype(f32)

    # k=3 projection conv (full conv, bias; input already masked)
    zero = jnp.zeros_like(p[:, :1])
    left = jnp.concatenate([zero, p[:, :-1]], axis=1)
    right = jnp.concatenate([p[:, 1:], zero], axis=1)

    def pmat(a, w):
        return jnp.dot(a.reshape(-1, mid), w.astype(dtype),
                       preferred_element_type=f32)

    pc = pmat(left, wproj[0]) + pmat(p, wproj[1]) + pmat(right, wproj[2])
    pc = (pc.astype(dtype) + bproj.astype(dtype)).reshape(r, t, mid) * mm

    # per-head gate via static lane slices (same Mosaic constraint as the
    # MHCA kernel: no reshape-transpose head split)
    gated = []
    for h in range(attn_heads):
        e_h = p[:, :, h * hc:(h + 1) * hc]
        g_h = gp[:, :, h * hc:(h + 1) * hc]
        sc = jnp.einsum("rtc,rnc->rtn", e_h, g_h,
                        preferred_element_type=f32)     # (R, T, Ng)
        mx = jnp.max(sc, axis=-1, keepdims=True) / math.sqrt(hc)
        gate = jax.nn.sigmoid(mx + battn_f[0, h]).astype(dtype)
        gated.append(pc[:, :, h * och:(h + 1) * och] * gate)
    parts.append(jnp.concatenate(gated, axis=-1))

    cat = jnp.concatenate(parts, axis=-1)               # (R, T, 6*mid)
    return matmul(cat, wfinal, bfinal) * mm


def _csp_kernel(x_ref, g_ref, m_ref, wmain_ref, bmain_ref, DW_ref, LNW_ref,
                LNB_ref, DWT_ref, DBS_ref, wg_ref, bg_ref, battn_ref,
                wproj_ref, bproj_ref, wfinal_ref, bfinal_ref, out_ref, *,
                attn_heads: int, mhca_heads: int, eps: float):
    x = x_ref[:]
    mm = m_ref[:].astype(x.dtype)
    out_ref[:] = _csp_compute(
        x, g_ref[:], mm, wmain_ref[:], bmain_ref[:], DW_ref[:], LNW_ref[:],
        LNB_ref[:], DWT_ref[:], DBS_ref[:], wg_ref[:], bg_ref[:],
        battn_ref[:], wproj_ref[:], bproj_ref[:], wfinal_ref[:],
        bfinal_ref[:], attn_heads=attn_heads, mhca_heads=mhca_heads,
        eps=eps,
    )


def _pick_rows_csp(b: int, t: int, cin: int, mid: int, ng: int, fg: int,
                   emb: int, cout: int, itemsize: int) -> int:
    """Largest batch block R (divisor of b) within a conservative VMEM
    budget.

    Per-row components (all x R):
      * pipeline windows, DOUBLE-buffered: x in (t*cin), guide in (ng*fg —
        the guide token width fg is the train seq len 224, NOT this
        level's t: at the t=8 pyramid level the guide is 28x larger than
        t*ng), mask, out (t*cout);
      * kernel liveness: the projected guide gp (ng*emb), ~12 mid-wide
        activations, the fp32 MHCA attention matrices (t*t), and the
        fp32 per-head guide scores (t*ng);
      * under bf16, the fp32 accumulator of the largest dot
        (preferred_element_type=f32) lives alongside its bf16 copy —
        counted via the (4 - itemsize) term. A liveness model that
        missed it picked R=64 for the 2B=128, t=8, bf16 TRAIN pass and
        Mosaic measured 119.6 MB of scoped stack against the 107 MB
        limit (bottom_up_4 VMEM OOM on v5e); fp32 picks are unchanged
        by the term, preserving every on-chip-proven fp32 block size;
    with the measured ~2x Mosaic-stack factor on the liveness part (see
    pallas_fusion._pick_rows_bwd). An even older model counted the guide
    as ng*t and picked R=64 at the t=8 level of the 2B=128 eval pass —
    164 MB of scoped VMEM on a 128 MB chip (driver bench fallback).
    """
    budget = 72 * 1024 * 1024
    windows = 2 * (t * cin + ng * fg + t + t * cout) * itemsize
    acc32 = max(ng * emb, 2 * t * mid, 6 * t * mid, t * cout) * (4 - itemsize)
    live = ((ng * emb + 12 * t * mid) * itemsize + acc32
            + (4 * t * t + t * ng) * 4)
    per_row = windows + 2 * live
    r = b
    while r > 1:
        if r * per_row <= budget and b % r == 0:
            return r
        r //= 2
    return 1


def _csp_fwd_call(x, g, m, *weights, attn_heads, mhca_heads, eps,
                  interpret):
    b, t, cin = x.shape
    mid = weights[6].shape[-1]          # DBS (3, 4, mid)
    cout = weights[12].shape[-1]        # wfinal (6mid, cout)
    emb = weights[7].shape[-1]          # wg (Fg, emb)
    r = _pick_rows_csp(b, t, cin, mid, g.shape[1], g.shape[2], emb, cout,
                       x.dtype.itemsize)
    grid = (b // r,)

    def row_spec(c):
        return batch_block_spec(r, t, c)

    w_spec = replicated_spec
    g_spec = batch_block_spec(r, *g.shape[1:])
    m_spec = batch_block_spec(r, t, 1)

    return pl.pallas_call(
        functools.partial(_csp_kernel, attn_heads=attn_heads,
                          mhca_heads=mhca_heads, eps=eps),
        grid=grid,
        in_specs=[row_spec(cin), g_spec, m_spec]
        + [w_spec(w.shape) for w in weights],
        out_specs=row_spec(cout),
        out_shape=jax.ShapeDtypeStruct((b, t, cout), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=CSP_VMEM_LIMIT,
        ),
    )(x, g, m, *weights)


def csp_reference(x, g, m, *weights, attn_heads, mhca_heads, eps=1e-5):
    """The same math as the kernel in plain jnp (one XLA program). Used as
    the custom-VJP backward (grads == the XLA module path's grads) and as
    the test oracle."""
    mm = m.astype(x.dtype)
    return _csp_compute(x, g, mm, *weights, attn_heads=attn_heads,
                        mhca_heads=mhca_heads, eps=eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _csp_diff(attn_heads, mhca_heads, interpret, x, g, m, *weights):
    return _csp_fwd_call(x, g, m, *weights, attn_heads=attn_heads,
                         mhca_heads=mhca_heads, eps=1e-5,
                         interpret=interpret)


def _csp_diff_fwd(attn_heads, mhca_heads, interpret, x, g, m, *weights):
    out = _csp_fwd_call(x, g, m, *weights, attn_heads=attn_heads,
                        mhca_heads=mhca_heads, eps=1e-5,
                        interpret=interpret)
    return out, (x, g, m, weights)


def _csp_bwd_kernel(*refs, n_weights: int, attn_heads: int,
                    mhca_heads: int, eps: float):
    """Recompute-backward of the whole CSP layer for one batch block.

    The body is jax.vjp of the SAME `_csp_compute` the forward kernel
    runs: the recompute forward and the full reverse walk (final conv ->
    guide gate -> k=3 proj -> 3 MHCA blocks -> main conv) trace into one
    Mosaic kernel, so every residual lives in VMEM. Weight grads are
    accumulated across grid steps in fp32 (constant index_map =>
    revisited blocks), exactly like pallas_fusion._mhca_bwd_kernel."""
    i = pl.program_id(0)
    x_ref, g_ref, m_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3:3 + n_weights]
    gout_ref = refs[3 + n_weights]
    dx_ref, dg_ref = refs[4 + n_weights], refs[5 + n_weights]
    gw_refs = refs[6 + n_weights:]

    x = x_ref[:]
    g = g_ref[:]
    mm = m_ref[:].astype(x.dtype)
    weights = [w[:] for w in w_refs]

    def f(x_, g_, *ws):
        return _csp_compute(x_, g_, mm, *ws, attn_heads=attn_heads,
                            mhca_heads=mhca_heads, eps=eps)

    _, vjp = jax.vjp(f, x, g, *weights)
    grads = vjp(gout_ref[:])
    dx_ref[:] = grads[0]
    dg_ref[:] = grads[1]
    for ref, gr in zip(gw_refs, grads[2:]):
        gr32 = gr.astype(jnp.float32)

        @pl.when(i == 0)
        def _(ref=ref, gr32=gr32):
            ref[:] = gr32

        @pl.when(i > 0)
        def _(ref=ref, gr32=gr32):
            ref[:] = ref[:] + gr32


def _pick_rows_csp_bwd(b: int, t: int, cin: int, mid: int, ng: int,
                       fg: int, emb: int, cout: int, itemsize: int,
                       attn_heads: int, mhca_heads: int) -> int:
    """Largest batch block R (divisor of b) for the recompute-backward
    kernel. Far heavier liveness than the forward: AD keeps the forward
    residuals (6 CSP parts, per-MHCA q/k/v/LN internals, the per-head
    fp32 attention matrices of all 3 blocks, the fp32 guide scores of
    every gate head) alive alongside the backward temporaries. Counts
    ~40 (t, mid) activation-sized buffers + x/dx, out-grads, guide pairs,
    plus the fp32 (t, t) and (t, ng) matrices; the measured ~2x Mosaic
    stack factor from pallas_fusion._pick_rows_bwd applies. Under bf16
    the fp32 accumulators ride the 4-byte terms already."""
    budget = 60 * 1024 * 1024
    windows = 2 * (2 * t * cin + 2 * ng * fg + t + 2 * t * cout) * itemsize
    live = ((40 * t * mid + 2 * ng * emb + 2 * t * cin + 2 * t * cout)
            * itemsize
            + (3 * 2 * mhca_heads * t * t + 2 * attn_heads * t * ng
               + 8 * t * mid) * 4)
    per_row = windows + 2 * live
    r = b
    while r > 1:
        if r * per_row <= budget and b % r == 0:
            return r
        r //= 2
    return 1


def _csp_bwd_xla(attn_heads, mhca_heads, interpret, res, gout):
    """Round-3 fallback backward (UNAV_CSP_BWD=xla): vjp of the XLA
    composition, with the three MHCA blocks routed through the fused MHCA
    custom-VJP kernel pair (pallas_fusion) — the recompute forward and
    the MHCA grads run as Pallas kernels, only the thin glue (main/final
    convs, guide attention, k=3 proj) is XLA. Replays that glue once more
    than plain AD, which is why the kernel backward above replaced it."""
    from .pallas_fusion import _mhca_diff

    x, g, m, weights = res

    def mhca_fn(h, mm_, dw, lnw, lnb, dwt, dbs):
        return _mhca_diff(h, h, mm_.astype(jnp.float32), dw, lnw, lnb,
                          dwt, dbs, mhca_heads, 1e-5, interpret)

    def f(x_, g_, *ws):
        mm = m.astype(x_.dtype)
        return _csp_compute(x_, g_, mm, *ws, attn_heads=attn_heads,
                            mhca_heads=mhca_heads, eps=1e-5,
                            mhca_fn=mhca_fn)

    _, vjp = jax.vjp(f, x, g, *weights)
    grads = vjp(gout)
    return (grads[0], grads[1], jnp.zeros_like(m)) + tuple(grads[2:])


def _csp_diff_bwd(attn_heads, mhca_heads, interpret, res, gout):
    import os

    if os.environ.get("UNAV_CSP_BWD") == "xla":
        return _csp_bwd_xla(attn_heads, mhca_heads, interpret, res, gout)

    x, g, m, weights = res
    b, t, cin = x.shape
    mid = weights[5].shape[-1]          # DWT (3, 4, mid, mid)
    ng, fg = g.shape[1], g.shape[2]
    emb = weights[7].shape[-1]          # wg (Fg, emb)
    cout = weights[12].shape[-1]        # wfinal (6mid, cout)
    r = _pick_rows_csp_bwd(b, t, cin, mid, ng, fg, emb, cout,
                           x.dtype.itemsize, attn_heads, mhca_heads)
    grid = (b // r,)

    w_spec = replicated_spec
    in_specs = (
        [batch_block_spec(r, t, cin),
         batch_block_spec(r, ng, fg),
         batch_block_spec(r, t, 1)]
        + [w_spec(w.shape) for w in weights]
        + [batch_block_spec(r, t, cout)]
    )
    out_specs = (
        batch_block_spec(r, t, cin),
        batch_block_spec(r, ng, fg),
    ) + tuple(w_spec(w.shape) for w in weights)
    out_shapes = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct(g.shape, g.dtype),
    ) + tuple(
        jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights
    )

    outs = pl.pallas_call(
        functools.partial(_csp_bwd_kernel, n_weights=len(weights),
                          attn_heads=attn_heads, mhca_heads=mhca_heads,
                          eps=1e-5),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=CSP_VMEM_LIMIT,
        ),
    )(x, g, m, *weights, gout)
    dx, dg = outs[0], outs[1]
    gws = tuple(gw.astype(w.dtype) for gw, w in zip(outs[2:], weights))
    return (dx, dg, jnp.zeros_like(m)) + gws


_csp_diff.defvjp(_csp_diff_fwd, _csp_diff_bwd)

# Analytic FLOPs (see pallas_fusion.TRACED_FLOPS): main + final 1x1 convs,
# 3 MHCA blocks, guide projection, per-head guide scores, k=3 proj conv.
from .pallas_fusion import TRACED_FLOPS  # noqa: E402


def _record_csp_flops(b, t, cin, mid, ng, fg, emb, cout, train):
    mhca_dense = 8 * b * t * mid * mid
    mhca_attn = 4 * b * t * t * mid
    mhca_fwd = 18 * b * t * mid + mhca_dense + mhca_attn
    dense = (2 * b * t * cin * 2 * mid          # main
             + 2 * b * ng * fg * emb            # guide_fc
             + 2 * b * t * emb * ng             # per-head scores (all heads)
             + 3 * 2 * b * t * mid * mid        # k=3 proj conv
             + 2 * b * t * 6 * mid * cout)      # final (6mid -> cout)
    fwd = 3 * mhca_fwd + dense                  # the fused forward kernel
    total = fwd
    if train:
        import os

        if os.environ.get("UNAV_CSP_BWD") == "xla":
            # fallback backward: XLA glue is visible to cost_analysis,
            # only the MHCA recompute-fwd + bwd kernels are hidden
            total += 3 * (2 * mhca_fwd + 2 * (mhca_dense + mhca_attn))
        else:
            # recompute-backward kernel: the ENTIRE backward is hidden
            # from cost_analysis — a full forward recompute plus ~2x the
            # matmul work for input/weight grads (same executed-FLOPs
            # convention as pallas_fusion._record_flops).
            total += fwd + 2 * (3 * (mhca_dense + mhca_attn) + dense)
    TRACED_FLOPS.append(float(total))


def csp_fused(
    x: Array,       # (B, T, Cin)
    guide: Array,   # (B, Ng, Fg)
    mask: Array,    # (B, T) bool
    *weights: Array,
    attn_heads: int,
    mhca_heads: int = 4,
    train: bool = False,
    interpret: bool = False,
) -> Array:
    """Fused MaxSigmoidCSPLayer. Pads T to a sublane multiple (the T=7/14/28
    pyramid levels), runs the kernel per batch block, slices back."""
    b, t, cin = x.shape
    mid = weights[6].shape[-1]
    _record_csp_flops(b, t, cin, mid, guide.shape[1], guide.shape[2],
                      weights[7].shape[-1], weights[12].shape[-1], train)

    t8 = -(-t // 8) * 8
    if t8 != t:
        x = jnp.pad(x, ((0, 0), (0, t8 - t), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, t8 - t)))
    m = mask.astype(jnp.float32)[..., None]

    def call(x_, g_, m_, *ws):
        if train:
            return _csp_diff(attn_heads, mhca_heads, interpret,
                             x_, g_, m_, *ws)
        return _csp_fwd_call(x_, g_, m_, *ws, attn_heads=attn_heads,
                             mhca_heads=mhca_heads, eps=1e-5,
                             interpret=interpret)

    # >1-device mesh: same GSPMD constraint as the MHCA kernels — guide is
    # batch-sharded too, weights replicated
    from .pallas_fusion import shard_over_batch

    call = shard_over_batch(call, b, n_data=3, n_repl=len(weights))
    out = call(x, guide, m, *weights)
    return out[:, :t] if t8 != t else out


def pack_csp_params(p) -> Tuple[Array, ...]:
    """Pack a MaxSigmoidCSPLayer param subtree into the kernel weights."""
    from .pallas_fusion import pack_mhca_params

    packs = [pack_mhca_params(p[f"block{i}"]) for i in range(3)]
    ab = p["attn_block"]
    return (
        p["main_conv"]["conv"]["kernel"][0],            # (Cin, 2mid)
        p["main_conv"]["conv"]["bias"][None],           # (1, 2mid)
        jnp.stack([pk[0] for pk in packs]),             # DW  (3,3,3,mid)
        jnp.stack([pk[1] for pk in packs]),             # LNW (3,3,mid)
        jnp.stack([pk[2] for pk in packs]),             # LNB (3,3,mid)
        jnp.stack([pk[3] for pk in packs]),             # DWT (3,4,mid,mid)
        jnp.stack([pk[4] for pk in packs]),             # DBS (3,4,mid)
        ab["guide_fc"]["kernel"],                       # (Fg, emb)
        ab["guide_fc"]["bias"][None],                   # (1, emb)
        ab["bias"][None],                               # (1, H)
        ab["project_conv"]["conv"]["kernel"],           # (3, mid, mid)
        ab["project_conv"]["conv"]["bias"][None],       # (1, mid)
        p["final_conv"]["conv"]["kernel"][0],           # (6mid, Cout)
        p["final_conv"]["conv"]["bias"][None],          # (1, Cout)
    )
