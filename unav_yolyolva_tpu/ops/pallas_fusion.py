"""Fused MaskedMHCA forward as a Pallas TPU kernel.

One MaskedMHCA (models/blocks.py:MaskedMHCA, reference blocks.py:119-245)
executes ~20 XLA ops: 3 depthwise convs, 3 channel-LayerNorms, 4 dense
projections, masked softmax, and several mask multiplies/converts. Profiling
on v5e shows the CSP/MHCA stack is bound by this NON-matmul work (bf16 gave
no speedup on a CSP layer), i.e. by HBM round-trips between small fusions.
This kernel runs the whole block — dwconv -> LN -> q/k/v dense -> masked
softmax attention -> output dense — per batch-block entirely in VMEM: the
only HBM traffic is x in / out once plus the weights.

Both paths are fused: eval uses the forward-only kernel (mhca_fused);
train uses a jax.custom_vjp pair (mhca_fused_train) whose backward is a
second Pallas kernel that recomputes the forward per batch block
(flash-attention style) and walks the chain in reverse, accumulating
weight grads in fp32 VMEM-resident output blocks. TPU only; CPU takes the
XLA module path, which stays the numerical reference. `interpret=True`
runs anywhere for equivalence tests. On a >1-device mesh the wrappers
shard_map over the batch axis (GSPMD cannot auto-partition Mosaic
kernels); the step builders register their mesh via set_fused_mesh.

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


def is_tpu_backend() -> bool:
    """True when the default backend can lower Mosaic kernels: real TPU or
    the axon TPU tunnel. NOT simply `!= "cpu"` — a GPU backend would crash
    trying to lower pltpu.VMEM BlockSpecs."""
    return jax.default_backend() in ("tpu", "axon")


def _mhca_compute(x1, x2, mm, dw, lnw, lnb, dwt, dbs, *, heads: int,
                  eps: float):
    """Value-level MaskedMHCA block: dwconv -> channel-LN -> q/k/v dense ->
    masked attention -> proj. Shared by the standalone MHCA kernel and the
    fused CSP-layer kernel (ops/pallas_csp.py). `mm` is the (R, T, 1) mask
    in the compute dtype; weights as packed by pack_mhca_params."""
    r, t, c = x1.shape
    d = c // heads
    scale = 1.0 / math.sqrt(d)
    dtype = x1.dtype

    def dwconv_ln(x, which):
        # depthwise conv k=3, zero padding (MaskedConv1D), output re-masked
        w = dw[which].astype(dtype)                  # (3, C)
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
        out = out * lnw[which] + lnb[which]
        return out.astype(dtype)

    def dense(x, which):
        w = dwt[which].astype(dtype)                 # (C, C)
        b = dbs[which].astype(dtype)                 # (C,)
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
    key_ok = jnp.transpose(mm.astype(jnp.float32), (0, 2, 1)) > 0.0  # (R,1,T)
    any_kv = jnp.max(mm.astype(jnp.float32), axis=1, keepdims=True) > 0.0
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
    return dense(jnp.concatenate(outs, axis=-1), 3) * mm


def _mhca_kernel(x1_ref, x2_ref, m_ref, dw_ref, lnw_ref, lnb_ref,
                 dwt_ref, dbs_ref, out_ref, *, heads: int, eps: float):
    x1 = x1_ref[:]                     # (R, T, C) compute dtype
    x2 = x2_ref[:]
    m = m_ref[:]                       # (R, T, 1) float32 {0,1}
    mm = m.astype(x1.dtype)            # (R, T, 1)
    out_ref[:] = _mhca_compute(
        x1, x2, mm, dw_ref[:], lnw_ref[:], lnb_ref[:], dwt_ref[:],
        dbs_ref[:], heads=heads, eps=eps,
    )


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


def batch_block_spec(r: int, *dims: int):
    """BlockSpec for a batch-tiled (R, *dims) operand resident in VMEM —
    the i-th grid program sees rows [i*R, (i+1)*R). Shared by every fused
    kernel in this module and ops/pallas_csp.py."""
    return pl.BlockSpec((r,) + dims, lambda i: (i,) + (0,) * len(dims),
                        memory_space=pltpu.VMEM)


def replicated_spec(shape):
    """BlockSpec for a weight operand replicated to every grid program."""
    nd = len(shape)
    return pl.BlockSpec(tuple(shape), lambda i: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _mhca_fwd_call(x1, x2, m, dw, lnw, lnb, dwt, dbs, *, heads, eps,
                   interpret):
    """pallas_call for the forward; m is the (B, T, 1) float32 mask (the
    trailing two block dims must match the array dims — a 2D (R, T) mask
    block with small R violates the sublane constraint)."""
    b, t, c = x1.shape
    r = _pick_rows(b, t, c, x1.dtype.itemsize)
    grid = (b // r,)

    row_spec = batch_block_spec(r, t, c)
    mask_spec = batch_block_spec(r, t, 1)
    w_spec = replicated_spec

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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(x1, x2, m, dw, lnw, lnb, dwt, dbs)


# Analytic FLOP meter. XLA's compiled cost_analysis cannot see inside a
# pallas_call, so MFU accounting would silently drop the fused kernels'
# work. Benches clear this list, trace/lower their step (tracing runs the
# Python wrappers below exactly once per call site), then add the recorded
# kernel FLOPs to the XLA count.
TRACED_FLOPS: list = []

# Multi-chip: GSPMD cannot auto-partition a Mosaic custom call — lowering
# a pallas_call inside a jit spanning >1 device raises NotImplementedError
# (jax/_src/tpu_custom_call.py: "Mosaic kernels cannot be automatically
# partitioned"). The step builders register their mesh here and the public
# wrappers below run the kernel per batch shard via shard_map (weights
# replicated; shard_map's transpose inserts the cross-shard psum for the
# weight grads — equivalence vs the single-device grads is tested on the
# virtual CPU mesh in tests/test_pallas_fusion.py).
SHARD_MESH = None


def set_fused_mesh(mesh) -> None:
    """Register the data-parallel mesh the fused kernels must shard over
    (None or a 1-device mesh disables the shard_map wrapper)."""
    global SHARD_MESH
    SHARD_MESH = (
        mesh if (mesh is not None and mesh.devices.size > 1) else None
    )


def shard_over_batch(call, b, n_data: int, n_repl: int = 0,
                     n_data_out: int = 1):
    """Wrap a Mosaic-kernel-bearing `call` in a batch-sharded shard_map
    when a >1-device mesh is registered (GSPMD cannot auto-partition a
    Pallas custom call): the first `n_data` args are batch-sharded, the
    next `n_repl` replicated; `n_data_out` outputs are batch-sharded.
    Falls through when the batch does not divide the mesh (the step
    builders enforce divisibility for train; eval pads).

    check_vma=False: pallas out_shapes carry no vma annotation; the
    transpose still inserts the cross-shard psum for the replicated
    weight operands (asserted equal to single-device grads in tests)."""
    mesh = SHARD_MESH
    if mesh is None or b % mesh.devices.size != 0:
        return call
    from jax.sharding import PartitionSpec as P

    data = P(mesh.axis_names[0])
    out_specs = (data,) * n_data_out if n_data_out > 1 else data
    return jax.shard_map(
        call,
        mesh=mesh,
        in_specs=(data,) * n_data + (P(),) * n_repl,
        out_specs=out_specs,
        check_vma=False,
    )


def _maybe_shard_map(call, b):
    """MHCA kernel form: (x1, x2, mask) batch-sharded + 5 replicated
    weight packs -> one batch-sharded output."""
    return shard_over_batch(call, b, n_data=3, n_repl=5)


def _record_flops(b: int, t: int, c: int, train: bool) -> None:
    dwconv = 18 * b * t * c                 # 3 depthwise convs, k=3
    dense = 8 * b * t * c * c               # q/k/v/proj 1x1 projections
    attn = 4 * b * t * t * c                # logits + att@v
    fwd = dwconv + dense + attn
    # train = primal fwd + bwd kernel (recomputes fwd, then ~2x the
    # matmul work for input/weight grads) — executed-FLOPs convention,
    # matching what XLA cost_analysis reports for its own ops.
    total = fwd if not train else 2 * fwd + 2 * (dense + attn)
    TRACED_FLOPS.append(float(total))


@functools.partial(jax.jit, static_argnames=("heads", "eps", "interpret"))
def _mhca_fused_jit(
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
    """Forward-only fused MHCA (eval path)."""
    m = mask.astype(jnp.float32)[..., None]
    return _mhca_fwd_call(x1, x2, m, dw, lnw, lnb, dwt, dbs,
                          heads=heads, eps=eps, interpret=interpret)


def mhca_fused(x1, x2, mask, dw, lnw, lnb, dwt, dbs, *, heads,
               eps=1e-5, interpret=False):
    """Forward-only fused MHCA (eval path); records analytic FLOPs at
    trace time (see TRACED_FLOPS)."""
    b, t, c = x1.shape
    _record_flops(b, t, c, train=False)
    call = functools.partial(_mhca_fused_jit, heads=heads, eps=eps,
                             interpret=interpret)
    return _maybe_shard_map(call, b)(x1, x2, mask, dw, lnw, lnb, dwt, dbs)


# ---------------------------------------------------------------------------
# Training path: fused forward + fused backward via jax.custom_vjp.
#
# The backward kernel recomputes the forward per batch block (flash-attention
# style — residuals are just the inputs, so the only extra HBM traffic over
# the forward is g in / dx1,dx2 out), then walks the chain in reverse:
# proj dense -> per-head attention/softmax -> q/k/v dense -> channel-LN ->
# depthwise conv. Weight grads are accumulated across grid steps in fp32
# VMEM-resident output blocks (constant index_map => revisited blocks).
# ---------------------------------------------------------------------------


def _mhca_bwd_kernel(x1_ref, x2_ref, m_ref, dw_ref, lnw_ref, lnb_ref,
                     dwt_ref, dbs_ref, g_ref,
                     dx1_ref, dx2_ref, gdw_ref, glnw_ref, glnb_ref,
                     gdwt_ref, gdbs_ref, *, heads: int, eps: float):
    i = pl.program_id(0)
    x1 = x1_ref[:]
    x2 = x2_ref[:]
    m = m_ref[:]                        # (R, T, 1) float32
    g = g_ref[:]                        # (R, T, C) upstream cotangent
    r, t, c = x1.shape
    d = c // heads
    scale = 1.0 / math.sqrt(d)
    dtype = x1.dtype
    f32 = jnp.float32
    mm = m.astype(dtype)

    # ---- recompute forward (keeping LN internals) -----------------------
    def shift_l(x):                     # y[t] = x[t-1], zero at t=0
        zero = jnp.zeros_like(x[:, :1])
        return jnp.concatenate([zero, x[:, :-1]], axis=1)

    def shift_r(x):                     # y[t] = x[t+1], zero at t=T-1
        zero = jnp.zeros_like(x[:, :1])
        return jnp.concatenate([x[:, 1:], zero], axis=1)

    def dwconv(x, which):
        w = dw_ref[which].astype(dtype)
        return (shift_l(x) * w[0] + x * w[1] + shift_r(x) * w[2]) * mm

    def ln_fwd(z, which):
        zf = z.astype(f32)
        mu = jnp.mean(zf, axis=-1, keepdims=True)
        res = zf - mu
        var = jnp.mean(res * res, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        yhat = res * inv                # fp32 (R, T, C)
        out = yhat * lnw_ref[which] + lnb_ref[which]
        return out.astype(dtype), yhat, inv

    def dense_fwd(x, which):
        w = dwt_ref[which].astype(dtype)
        b = dbs_ref[which].astype(dtype)
        y = jnp.einsum("rtc,cd->rtd", x, w, preferred_element_type=f32)
        return y.astype(dtype) + b

    zq = dwconv(x2, 0)
    yq, yhat_q, inv_q = ln_fwd(zq, 0)
    q = dense_fwd(yq, 0)
    zk = dwconv(x1, 1)
    yk, yhat_k, inv_k = ln_fwd(zk, 1)
    k = dense_fwd(yk, 1)
    zv = dwconv(x1, 2)
    yv, yhat_v, inv_v = ln_fwd(zv, 2)
    v = dense_fwd(yv, 2) * mm
    qs = q * jnp.asarray(scale, dtype)

    neg_inf = jnp.finfo(f32).min
    key_ok = jnp.transpose(m, (0, 2, 1)) > 0.0          # (R, 1, T)
    any_kv = jnp.max(m, axis=1, keepdims=True) > 0.0    # (R, 1, 1)
    any_f = any_kv.astype(f32)

    # ---- proj dense backward (out = dense(o_cat, 3) * mm) ---------------
    gp = g * mm                                          # d(dense3 out)
    wp = dwt_ref[3].astype(dtype)
    g_ocat = jnp.einsum("rto,co->rtc", gp, wp,
                        preferred_element_type=f32).astype(dtype)

    # ---- per-head attention forward + backward --------------------------
    o_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
    for h_i in range(heads):
        sl = slice(h_i * d, (h_i + 1) * d)
        q_h, k_h, v_h = qs[:, :, sl], k[:, :, sl], v[:, :, sl]
        logits = jnp.einsum("rtd,rsd->rts", q_h, k_h,
                            preferred_element_type=f32)
        logits = jnp.where(key_ok, logits, neg_inf)
        logits = jnp.where(any_kv, logits, 0.0)
        att = jax.nn.softmax(logits, axis=-1) * any_f    # fp32 (R, T, T)
        att_c = att.astype(dtype)
        o_parts.append(
            jnp.einsum("rts,rsd->rtd", att_c, v_h,
                       preferred_element_type=f32).astype(dtype)
        )
        g_oh = g_ocat[:, :, sl]
        datt = jnp.einsum("rtd,rsd->rts", g_oh, v_h,
                          preferred_element_type=f32)    # fp32
        ds = att * (datt - jnp.sum(att * datt, axis=-1, keepdims=True))
        ds_c = ds.astype(dtype)
        dq_parts.append(
            jnp.einsum("rts,rsd->rtd", ds_c, k_h,
                       preferred_element_type=f32).astype(dtype)
        )
        dk_parts.append(
            jnp.einsum("rts,rtd->rsd", ds_c, q_h,
                       preferred_element_type=f32).astype(dtype)
        )
        dv_parts.append(
            jnp.einsum("rts,rtd->rsd", att_c, g_oh,
                       preferred_element_type=f32).astype(dtype)
        )
    o_cat = jnp.concatenate(o_parts, axis=-1)
    dq_dense = jnp.concatenate(dq_parts, axis=-1) * jnp.asarray(scale, dtype)
    dk_dense = jnp.concatenate(dk_parts, axis=-1)
    dv_dense = jnp.concatenate(dv_parts, axis=-1) * mm

    # ---- dense / LN / dwconv backward helpers ---------------------------
    def dense_bwd(dy, x_in, which):
        w = dwt_ref[which].astype(dtype)
        dx = jnp.einsum("rto,co->rtc", dy, w,
                        preferred_element_type=f32).astype(dtype)
        # Mosaic matmul supports one contracting dim — collapse (r, t)
        # before the weight-grad contraction.
        gw = jnp.einsum("xc,xo->co",
                        x_in.reshape(-1, x_in.shape[-1]),
                        dy.reshape(-1, dy.shape[-1]),
                        preferred_element_type=f32)
        gb = jnp.sum(dy.astype(f32), axis=(0, 1), keepdims=True)  # (1,1,C)
        return dx, gw[None], gb

    def ln_bwd(dy, yhat, inv, which):
        dyf = dy.astype(f32)
        glnw = jnp.sum(dyf * yhat, axis=(0, 1), keepdims=True)    # (1,1,C)
        glnb = jnp.sum(dyf, axis=(0, 1), keepdims=True)
        dyhat = dyf * lnw_ref[which]
        dz = inv * (
            dyhat
            - jnp.mean(dyhat, axis=-1, keepdims=True)
            - yhat * jnp.mean(dyhat * yhat, axis=-1, keepdims=True)
        )
        return dz.astype(dtype), glnw, glnb

    def dwconv_bwd(dz, x_src, which):
        dzm = dz * mm
        w = dw_ref[which].astype(dtype)
        dx = shift_r(dzm) * w[0] + dzm * w[1] + shift_l(dzm) * w[2]
        xf, dzf = x_src.astype(f32), dzm.astype(f32)
        taps = jnp.concatenate([
            jnp.sum(shift_l(xf) * dzf, axis=(0, 1), keepdims=True),
            jnp.sum(xf * dzf, axis=(0, 1), keepdims=True),
            jnp.sum(shift_r(xf) * dzf, axis=(0, 1), keepdims=True),
        ], axis=1)                                        # (1, 3, C)
        return dx, taps

    dyq, gw_q, gb_q = dense_bwd(dq_dense, yq, 0)
    dzq, glnw_q, glnb_q = ln_bwd(dyq, yhat_q, inv_q, 0)
    dx2, taps_q = dwconv_bwd(dzq, x2, 0)

    dyk, gw_k, gb_k = dense_bwd(dk_dense, yk, 1)
    dzk, glnw_k, glnb_k = ln_bwd(dyk, yhat_k, inv_k, 1)
    dx1_k, taps_k = dwconv_bwd(dzk, x1, 1)

    dyv, gw_v, gb_v = dense_bwd(dv_dense, yv, 2)
    dzv, glnw_v, glnb_v = ln_bwd(dyv, yhat_v, inv_v, 2)
    dx1_v, taps_v = dwconv_bwd(dzv, x1, 2)

    gw_p = jnp.einsum("xc,xo->co",
                      o_cat.reshape(-1, o_cat.shape[-1]),
                      gp.reshape(-1, gp.shape[-1]),
                      preferred_element_type=f32)[None]
    gb_p = jnp.sum(gp.astype(f32), axis=(0, 1), keepdims=True)

    gdw = jnp.concatenate([taps_q, taps_k, taps_v], axis=0)      # (3,3,C)
    glnw = jnp.concatenate([glnw_q, glnw_k, glnw_v], axis=0)     # (3,1,C)
    glnb = jnp.concatenate([glnb_q, glnb_k, glnb_v], axis=0)
    gdwt = jnp.concatenate([gw_q, gw_k, gw_v, gw_p], axis=0)     # (4,C,C)
    gdbs = jnp.concatenate([gb_q, gb_k, gb_v, gb_p], axis=0)     # (4,1,C)

    dx1_ref[:] = dx1_k + dx1_v
    dx2_ref[:] = dx2

    @pl.when(i == 0)
    def _():
        gdw_ref[:] = gdw
        glnw_ref[:] = glnw
        glnb_ref[:] = glnb
        gdwt_ref[:] = gdwt
        gdbs_ref[:] = gdbs

    @pl.when(i > 0)
    def _():
        gdw_ref[:] = gdw_ref[:] + gdw
        glnw_ref[:] = glnw_ref[:] + glnw
        glnb_ref[:] = glnb_ref[:] + glnb
        gdwt_ref[:] = gdwt_ref[:] + gdwt
        gdbs_ref[:] = gdbs_ref[:] + gdbs


BWD_VMEM_LIMIT = 100 * 1024 * 1024  # Mosaic scoped-vmem cap (v5e has 128M)


def _pick_rows_bwd(b: int, t: int, c: int, itemsize: int) -> int:
    """Like _pick_rows, but ~22 live activation buffers (recompute + grads,
    three of them fp32 LN yhats) and 3 live fp32 (R,T,T) attention mats.
    Mosaic's measured stack allocation runs ~2x this liveness model (fp32
    C=512 at R=1 measured 20.4 MB vs 10.7 modeled), hence the 2x factor;
    the budget sits well under BWD_VMEM_LIMIT to leave room for the
    pipeline's double-buffered input/output blocks."""
    budget = 40 * 1024 * 1024
    r = b
    while r > 1:
        act = 16 * r * t * c * itemsize + 6 * r * t * c * 4
        att = 3 * r * t * t * 4
        if 2 * (act + att) <= budget and b % r == 0:
            return r
        r //= 2
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _mhca_diff(x1, x2, m, dw, lnw, lnb, dwt, dbs, heads, eps, interpret):
    """Differentiable fused MHCA; m is the (B, T, 1) float32 mask."""
    return _mhca_fwd_call(x1, x2, m, dw, lnw, lnb, dwt, dbs,
                          heads=heads, eps=eps, interpret=interpret)


def _mhca_diff_fwd(x1, x2, m, dw, lnw, lnb, dwt, dbs, heads, eps, interpret):
    out = _mhca_fwd_call(x1, x2, m, dw, lnw, lnb, dwt, dbs,
                         heads=heads, eps=eps, interpret=interpret)
    return out, (x1, x2, m, dw, lnw, lnb, dwt, dbs)


def _mhca_diff_bwd(heads, eps, interpret, res, g):
    x1, x2, m, dw, lnw, lnb, dwt, dbs = res
    b, t, c = x1.shape
    r = _pick_rows_bwd(b, t, c, x1.dtype.itemsize)
    grid = (b // r,)
    row_spec = batch_block_spec(r, t, c)
    mask_spec = batch_block_spec(r, t, 1)
    w_spec = replicated_spec

    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((b, t, c), x1.dtype),       # dx1
        jax.ShapeDtypeStruct((b, t, c), x2.dtype),       # dx2
        jax.ShapeDtypeStruct((3, 3, c), f32),            # gdw
        jax.ShapeDtypeStruct((3, 1, c), f32),            # glnw
        jax.ShapeDtypeStruct((3, 1, c), f32),            # glnb
        jax.ShapeDtypeStruct((4, c, c), f32),            # gdwt
        jax.ShapeDtypeStruct((4, 1, c), f32),            # gdbs
    )
    out_specs = (
        row_spec, row_spec,
        w_spec((3, 3, c)), w_spec((3, 1, c)), w_spec((3, 1, c)),
        w_spec((4, c, c)), w_spec((4, 1, c)),
    )
    dx1, dx2, gdw, glnw, glnb, gdwt, gdbs = pl.pallas_call(
        functools.partial(_mhca_bwd_kernel, heads=heads, eps=eps),
        grid=grid,
        in_specs=[
            row_spec, row_spec, mask_spec,
            w_spec(dw.shape), w_spec(lnw.shape), w_spec(lnb.shape),
            w_spec(dwt.shape), w_spec(dbs.shape),
            row_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=BWD_VMEM_LIMIT,
        ),
    )(x1, x2, m, dw, lnw, lnb, dwt, dbs, g)
    return (
        dx1, dx2, jnp.zeros_like(m),
        gdw.astype(dw.dtype),
        glnw[:, 0].astype(lnw.dtype),
        glnb[:, 0].astype(lnb.dtype),
        gdwt.astype(dwt.dtype),
        gdbs[:, 0].astype(dbs.dtype),
    )


_mhca_diff.defvjp(_mhca_diff_fwd, _mhca_diff_bwd)


def mhca_fused_train(
    x1: Array, x2: Array, mask: Array,
    dw: Array, lnw: Array, lnb: Array, dwt: Array, dbs: Array,
    *, heads: int, eps: float = 1e-5, interpret: bool = False,
) -> Array:
    """Fused MHCA with a fused Pallas backward (for the train path)."""
    b, t, c = x1.shape
    _record_flops(b, t, c, train=True)

    def call(x1, x2, mask, dw, lnw, lnb, dwt, dbs):
        m = mask.astype(jnp.float32)[..., None]
        return _mhca_diff(x1, x2, m, dw, lnw, lnb, dwt, dbs, heads, eps,
                          interpret)

    return _maybe_shard_map(call, b)(x1, x2, mask, dw, lnw, lnb, dwt, dbs)


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
