"""Primitive masked sequence-modeling blocks (flax.linen, channels-last).

TPU-first re-design of the reference primitives
(`/root/reference/libs/modeling/blocks.py`): activations are (B, T, C) so the
channel axis rides the 128-lane dimension; masks are (B, T) bool and applied
multiplicatively (XLA fuses them into the surrounding convs/matmuls instead of
materializing gather/scatter).

Initialization matches the reference distributions:
  * convs / dense: torch-default Kaiming-uniform, U(-1/sqrt(fan_in), +...)
  * all biases zero (the reference zeroes conv biases at construction or via
    backbone __init_weights__)
  * channel LayerNorm: weight 1, bias 0
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import masked_conv1d_out_mask
from ..ops.pallas_fusion import is_tpu_backend

Array = jnp.ndarray

# Fused-MHCA path selector. "auto" (default): Pallas kernel on TPU at
# profitable shapes, XLA everywhere else. Test hooks: "always" forces the
# kernel (on CPU it runs in interpret mode, so kernel-vs-XLA equivalence is
# testable without a TPU); "never" disables it. Overridable via the
# UNAV_FUSED_MHCA env var (benchmark A/B without code edits).
FUSED_MHCA = os.environ.get("UNAV_FUSED_MHCA", "auto")

# Fused whole-TransformerBlock path selector (ops/pallas_tblock.py): the
# UNAV_FUSED_TBLOCK env var is re-read at trace time (benchmark A/B without
# re-import); the module global is the test hook, like FUSED_MHCA. OPT-IN:
# only "always" enables it — measured perf-neutral vs the default
# XLA-block+fused-MHCA path on v5e (see TransformerBlock.__call__).
FUSED_TBLOCK = os.environ.get("UNAV_FUSED_TBLOCK", "auto")


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Torch Conv1d/Linear default init: kaiming_uniform(a=sqrt(5)).

    For a flax Conv kernel (k, in/groups, out) this is
    U(-1/sqrt(in/groups * k), +1/sqrt(in/groups * k)); for a Dense kernel
    (in, out), U(-1/sqrt(in), +1/sqrt(in)).
    """
    if len(shape) == 3:
        fan_in = shape[0] * shape[1]
    else:
        fan_in = shape[0]
    bound = 1.0 / math.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def trunc_normal_init(stddev: float = 0.02) -> Callable:
    """torch nn.init.trunc_normal_(std=stddev): its a=-2, b=2 bounds are
    ABSOLUTE values (±100σ at std 0.02 — effectively untruncated), while
    flax's lower/upper are in units of stddev; convert accordingly.
    Truncating at ±2σ instead would shrink the effective std ~12%."""
    return nn.initializers.truncated_normal(
        stddev=stddev, lower=-2.0 / stddev, upper=2.0 / stddev
    )


class MaskedConv1D(nn.Module):
    """1D conv that re-zeroes padded positions (blocks.py:8-61).

    kernel_size must be odd with padding k//2, so output length is T/stride.
    The mask is downsampled by taking every stride-th element (equivalent to
    the reference's nearest interpolation).
    """

    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, mask: Array) -> Tuple[Array, Array]:
        assert self.kernel_size % 2 == 1
        y = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=self.kernel_size // 2,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        out_mask = masked_conv1d_out_mask(mask, self.stride)
        y = y * out_mask[..., None].astype(y.dtype)
        return y, out_mask


class ChannelLayerNorm(nn.Module):
    """Affine LayerNorm over the channel (last) axis, biased variance
    (blocks.py:64-103). eps=1e-5.

    Statistics are always computed in float32 (bfloat16 mean/variance loses
    too much precision); the output is cast to `dtype` when set, so under a
    bfloat16 compute policy the norm is an fp32 island feeding bf16 matmuls.
    """

    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        res = xf - mu
        sigma = jnp.mean(res * res, axis=-1, keepdims=True)
        out = res * jax.lax.rsqrt(sigma + self.eps)
        out = out * weight + bias
        return out.astype(self.dtype or x.dtype)


def drop_path(x: Array, drop_prob: float, train: bool, rng) -> Array:
    """Stochastic depth per sample (blocks.py:348-361)."""
    if drop_prob == 0.0 or not train:
        return x
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep_prob + jax.random.uniform(rng, shape, x.dtype))
    return x / keep_prob * mask


class AffineDropPath(nn.Module):
    """Per-channel learnable scale (init 1e-4) + stochastic depth
    (blocks.py:375-391)."""

    num_dim: int
    drop_prob: float = 0.0
    init_scale_value: float = 1e-4

    @nn.compact
    def __call__(
        self,
        x: Optional[Array] = None,
        train: bool = False,
        multiplier_batch: Optional[int] = None,
    ) -> Array:
        scale = self.param(
            "scale",
            nn.initializers.constant(self.init_scale_value),
            (1, 1, self.num_dim),
        )
        if multiplier_batch is not None:
            # Multiplier mode for the fused TransformerBlock kernel
            # (ops/pallas_tblock.py): return the dense per-sample branch
            # multiplier scale * droppath_mask / keep as (B, 1, C),
            # drawing the SAME rng stream (same submodule scope, same
            # call count, fp32 — the apply path's scale*x promotes to
            # fp32 too) so fused and XLA paths share droppath draws.
            f = jnp.ones((multiplier_batch, 1, 1), jnp.float32)
            if self.drop_prob > 0.0 and train:
                rng = self.make_rng("droppath")
                keep = 1.0 - self.drop_prob
                mask = jnp.floor(
                    keep + jax.random.uniform(rng, f.shape, f.dtype)
                )
                f = mask / keep
            return scale.astype(jnp.float32) * f
        x = scale * x
        if self.drop_prob > 0.0 and train:
            rng = self.make_rng("droppath")
            x = drop_path(x, self.drop_prob, train, rng)
        return x


class LearnableScale(nn.Module):
    """Scalar multiplier with learnable value (blocks.py:326-344)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param(
            "scale", nn.initializers.constant(self.init_value), ()
        )
        return x * scale


class MaskedMHCA(nn.Module):
    """Multi-head conv attention with masking (blocks.py:119-245).

    Depthwise conv + channel-LN on q (from x2) and k/v (from x1), 1x1
    projections, masked softmax, output re-masked by the query mask. Serves
    as both self- and cross-attention (x1 = key/value source, x2 = query
    source). Downsampling strides (n_qx/kv_stride) are supported for parity,
    though the live model only uses stride 1.
    """

    n_embd: int
    n_head: int
    n_qx_stride: int = 1
    n_kv_stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x1: Array, x2: Array, mask: Array, train: bool = True
    ) -> Tuple[Array, Array]:
        assert self.n_embd % self.n_head == 0
        head_dim = self.n_embd // self.n_head
        scale = 1.0 / math.sqrt(head_dim)

        # Fused Pallas path (ops/pallas_fusion.py): the whole block —
        # dwconv -> LN -> q/k/v dense -> masked attention -> proj — runs
        # VMEM-resident in one kernel. Eval uses the forward-only kernel;
        # train uses the custom-VJP pair (fused forward + fused recompute
        # backward). TPU only (CPU keeps the XLA reference path — except
        # under the tests' interpret-mode override), stride 1, T a sublane
        # multiple, C a lane multiple.
        profitable = (
            x1.shape[1] % 8 == 0
            # below T=112 the kernel loses to XLA on v5e (measured: T=56
            # 1.94 ms XLA vs 2.22 ms fused) — small grids can't amortize
            # the weight prologue
            and x1.shape[1] >= 112
            and x1.shape[-1] % 128 == 0
            and is_tpu_backend()
        )
        fused_ok = (
            FUSED_MHCA != "never"
            and self.n_qx_stride == 1
            and self.n_kv_stride == 1
            and (profitable or FUSED_MHCA == "always")
        )
        if fused_ok:
            return self._fused(x1, x2, mask, train)

        def dw_kernel(stride):
            return stride + 1 if stride > 1 else 3

        q, qx_mask = MaskedConv1D(
            self.n_embd, dw_kernel(self.n_qx_stride), stride=self.n_kv_stride,
            groups=self.n_embd, use_bias=False, name="query_conv",
            dtype=self.dtype,
        )(x2, mask)
        q = ChannelLayerNorm(name="query_norm", dtype=self.dtype)(q)
        k, kv_mask = MaskedConv1D(
            self.n_embd, dw_kernel(self.n_kv_stride), stride=self.n_kv_stride,
            groups=self.n_embd, use_bias=False, name="key_conv",
            dtype=self.dtype,
        )(x1, mask)
        k = ChannelLayerNorm(name="key_norm", dtype=self.dtype)(k)
        v, _ = MaskedConv1D(
            self.n_embd, dw_kernel(self.n_kv_stride), stride=self.n_kv_stride,
            groups=self.n_embd, use_bias=False, name="value_conv",
            dtype=self.dtype,
        )(x1, mask)
        v = ChannelLayerNorm(name="value_norm", dtype=self.dtype)(v)

        dense = dict(
            kernel_init=torch_conv_kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )
        q = nn.Dense(self.n_embd, name="query", **dense)(q)
        k = nn.Dense(self.n_embd, name="key", **dense)(k)
        v = nn.Dense(self.n_embd, name="value", **dense)(v)

        b, tq, _ = q.shape
        tk = k.shape[1]
        q = q.reshape(b, tq, self.n_head, head_dim)
        k = k.reshape(b, tk, self.n_head, head_dim)
        v = v.reshape(b, tk, self.n_head, head_dim)

        att = jnp.einsum(
            "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        # prevent queries from attending to invalid kv tokens. Rows with NO
        # valid kv token at all (possible when a caller flattens frames into
        # the batch axis, e.g. the dependency block's co-occurrence branch
        # over padded frames) would softmax to NaN under a plain -inf fill;
        # zero their logits instead and kill the row after the softmax —
        # matching the reference's post-softmax multiplicative-mask branch
        # (blocks.py:231-234), whose output for such rows is exactly 0.
        neg_inf = jnp.finfo(att.dtype).min
        any_kv = jnp.any(kv_mask, axis=-1)                       # (B,)
        att = jnp.where(kv_mask[:, None, None, :], att, neg_inf)
        att = jnp.where(any_kv[:, None, None, None], att, 0.0)
        att = jax.nn.softmax(att, axis=-1)  # fp32 (accumulated fp32 above)
        att = att * any_kv[:, None, None, None].astype(att.dtype)

        v = v * kv_mask[:, :, None, None].astype(v.dtype)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", att.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)  # fp32 accum, compute-dtype storage
        out = out.reshape(b, tq, self.n_embd)
        out = nn.Dense(self.n_embd, name="proj", **dense)(out)
        out = out * qx_mask[..., None].astype(out.dtype)
        return out, qx_mask

    def _fused(
        self, x1: Array, x2: Array, mask: Array, train: bool
    ) -> Tuple[Array, Array]:
        """Pallas fused path. Declares the SAME param tree as the XLA
        path via shape-only submodule calls (their outputs are unused and
        DCE'd by XLA), then runs the packed-weight kernel: forward-only for
        eval, the custom-VJP fused-backward pair for train."""
        from ..ops.pallas_fusion import (
            mhca_fused, mhca_fused_train, pack_mhca_params,
        )

        dense = dict(
            kernel_init=torch_conv_kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )
        tiny_x, tiny_m = x1[:1, :8], mask[:1, :8]
        for name in ("query", "key", "value"):
            h, _ = MaskedConv1D(
                self.n_embd, 3, groups=self.n_embd, use_bias=False,
                name=f"{name}_conv", dtype=self.dtype,
            )(tiny_x, tiny_m)
            h = ChannelLayerNorm(name=f"{name}_norm", dtype=self.dtype)(h)
            nn.Dense(self.n_embd, name=name, **dense)(h)
        nn.Dense(self.n_embd, name="proj", **dense)(tiny_x)

        p = self.variables["params"]
        dw, lnw, lnb, dwt, dbs = pack_mhca_params(p)
        dtype = self.dtype or x1.dtype
        kernel = mhca_fused_train if train else mhca_fused
        out = kernel(
            x1.astype(dtype), x2.astype(dtype), mask,
            dw, lnw, lnb, dwt, dbs, heads=self.n_head,
            interpret=not is_tpu_backend(),
        )
        return out, mask


def _max_pool1d(x: Array, kernel: int, stride: int, padding: int) -> Array:
    """MaxPool1d over the T axis of (B, T, C)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )


class TransformerBlock(nn.Module):
    """Pre-LN transformer block: MHCA + (max-pool) skip + 4x MLP, with
    AffineDropPath stochastic depth on both branches (blocks.py:247-323)."""

    n_embd: int
    n_head: int
    n_ds_strides: Tuple[int, int] = (1, 1)
    n_out: Optional[int] = None
    n_hidden: Optional[int] = None
    path_pdrop: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x1: Array,
        x2: Array,
        mask: Array,
        train: bool = False,
        pos_embd: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        n_out = self.n_out or self.n_embd
        n_hidden = self.n_hidden or 4 * self.n_embd

        # Fused Pallas path (ops/pallas_tblock.py): the WHOLE block —
        # ln11/ln12, the MHCA, both droppath-scaled residual adds, ln2 and
        # the 4x MLP — in one VMEM-resident kernel (the stem runs four of
        # these per step at T=224). Self-attention stride-1 form only;
        # droppath rng parity via AffineDropPath multiplier mode.
        #
        # OPT-IN ONLY (UNAV_FUSED_TBLOCK=always): measured on v5e at the
        # stem shape (B=64, T=224, C=512, bf16) the whole-block kernel is
        # neutral on eval (1.42 vs 1.44 ms) and ~4% SLOWER on train
        # (3.89 vs 3.75 ms) vs the default path (XLA block + fused-MHCA
        # inner kernel) — tools/bench_tblock.py. XLA already fuses the
        # LN/residual/MLP glue around the MHCA well, and the roofline
        # (tools/roofline.py) says the block is MXU-compute-bound, not
        # HBM-bound, so there is no memory traffic left for whole-block
        # fusion to harvest. Kept as a tested, correct alternative path.
        fused_tb = os.environ.get("UNAV_FUSED_TBLOCK", FUSED_TBLOCK)
        fused_ok = (
            fused_tb == "always"
            and FUSED_MHCA != "never"
            and x1 is x2
            and self.n_ds_strides == (1, 1)
            and pos_embd is None
            and n_out == self.n_embd
            and x1.shape[-1] == self.n_embd
        )
        if fused_ok:
            return self._fused(x1, mask, n_out, n_hidden, train)

        h1 = ChannelLayerNorm(name="ln11", dtype=self.dtype)(x1)
        h2 = ChannelLayerNorm(name="ln12", dtype=self.dtype)(x2)
        out, out_mask = MaskedMHCA(
            self.n_embd, self.n_head,
            n_qx_stride=self.n_ds_strides[0],
            n_kv_stride=self.n_ds_strides[1],
            name="attn",
            dtype=self.dtype,
        )(h1, h2, mask, train=train)
        out_mask_f = out_mask[..., None].astype(out.dtype)

        if self.n_ds_strides[0] > 1:
            s = self.n_ds_strides[0]
            skip = _max_pool1d(x1, kernel=s + 1, stride=s, padding=(s + 1) // 2)
        else:
            skip = x1

        if self.path_pdrop > 0.0:
            dp_attn = AffineDropPath(self.n_embd, self.path_pdrop, name="drop_path_attn")
            dp_mlp = AffineDropPath(n_out, self.path_pdrop, name="drop_path_mlp")
            out = skip * out_mask_f + dp_attn(out, train)
        else:
            out = skip * out_mask_f + out

        h = ChannelLayerNorm(name="ln2", dtype=self.dtype)(out)
        dense = dict(
            kernel_init=torch_conv_kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )
        h = nn.Dense(n_hidden, name="mlp_fc1", **dense)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(n_out, name="mlp_fc2", **dense)(h)
        h = h * out_mask_f
        if self.path_pdrop > 0.0:
            out = out + dp_mlp(h, train)
        else:
            out = out + h

        if pos_embd is not None:
            out = out + pos_embd * out_mask_f
        return out, out_mask

    def _fused(
        self, x: Array, mask: Array, n_out: int, n_hidden: int, train: bool
    ) -> Tuple[Array, Array]:
        """Pallas fused whole-block path. Declares the SAME param tree as
        the XLA path via shape-only submodule calls (DCE'd by XLA), draws
        the droppath multipliers through the real AffineDropPath
        submodules (same rng stream as the apply path), then runs the
        packed-weight kernel: forward-only for eval, the recompute-
        backward custom-VJP pair for train."""
        from ..ops.pallas_tblock import pack_tblock_params, tblock_fused

        b = x.shape[0]
        dense = dict(
            kernel_init=torch_conv_kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )
        tiny_x, tiny_m = x[:1, :8], mask[:1, :8]
        h1 = ChannelLayerNorm(name="ln11", dtype=self.dtype)(tiny_x)
        h2 = ChannelLayerNorm(name="ln12", dtype=self.dtype)(tiny_x)
        MaskedMHCA(
            self.n_embd, self.n_head, name="attn", dtype=self.dtype,
        )(h1, h2, tiny_m, train=train)
        h = ChannelLayerNorm(name="ln2", dtype=self.dtype)(tiny_x)
        h = nn.Dense(n_hidden, name="mlp_fc1", **dense)(h)
        nn.Dense(n_out, name="mlp_fc2", **dense)(h)

        if self.path_pdrop > 0.0:
            ma = AffineDropPath(
                self.n_embd, self.path_pdrop, name="drop_path_attn"
            )(train=train, multiplier_batch=b)
            mmlp = AffineDropPath(
                n_out, self.path_pdrop, name="drop_path_mlp"
            )(train=train, multiplier_batch=b)
        else:
            ma = jnp.ones((b, 1, self.n_embd), jnp.float32)
            mmlp = jnp.ones((b, 1, n_out), jnp.float32)

        weights = pack_tblock_params(self.variables["params"])
        out = tblock_fused(
            x, mask, ma, mmlp, *weights,
            heads=self.n_head,
            cdtype=self.dtype or x.dtype,
            train=train,
            interpret=not is_tpu_backend(),
        )
        return out, mask
