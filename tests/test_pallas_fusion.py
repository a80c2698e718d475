"""Fused MaskedMHCA Pallas kernel vs the XLA module path.

The kernel (ops/pallas_fusion.py) is the TPU eval-path implementation of
MaskedMHCA; the XLA module path is the numerical reference (it is what the
numerical-parity suite pins against the actual reference model). Here the
kernel runs in interpret mode on CPU and must reproduce the XLA path —
same params, same inputs, self- and cross-attention, full and heavily
masked lengths — and the param tree declared by the fused branch must be
IDENTICAL to the XLA branch's (checkpoint compatibility)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import unav_yolyolva_tpu.models.blocks as blocks
from unav_yolyolva_tpu.models.blocks import MaskedMHCA

B, T, C, H = 4, 32, 256, 4


@pytest.fixture
def force_fused(monkeypatch):
    monkeypatch.setattr(blocks, "FORCE_FUSED_MHCA", True)


def _inputs(seed, lengths):
    rng = np.random.default_rng(seed)
    x1 = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.zeros((B, T), bool)
    for i, ln in enumerate(lengths):
        mask[i, :ln] = True
    return x1, x2, jnp.asarray(mask)


@pytest.mark.parametrize("lengths", [[T] * B, [T, 20, 9, 1]])
def test_fused_matches_xla_self_attention(force_fused, lengths):
    x1, _, mask = _inputs(0, lengths)
    mhca = MaskedMHCA(C, H)
    params = mhca.init(jax.random.PRNGKey(0), x1, x1, mask, train=True)
    ref, ref_mask = mhca.apply(params, x1, x1, mask, train=True)
    out, out_mask = mhca.apply(params, x1, x1, mask, train=False)
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(ref_mask))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_fused_matches_xla_cross_attention(force_fused):
    x1, x2, mask = _inputs(1, [T, 25, 16, 8])
    mhca = MaskedMHCA(C, H)
    params = mhca.init(jax.random.PRNGKey(1), x1, x2, mask, train=True)
    ref, _ = mhca.apply(params, x1, x2, mask, train=True)
    out, _ = mhca.apply(params, x1, x2, mask, train=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_param_tree_identical_across_branches(force_fused):
    """Init through the FUSED branch must declare exactly the XLA branch's
    param tree (names, shapes, values for the same PRNG key)."""
    x1, _, mask = _inputs(2, [T] * B)
    mhca = MaskedMHCA(C, H)
    p_xla = mhca.init(jax.random.PRNGKey(7), x1, x1, mask, train=True)
    p_fused = mhca.init(jax.random.PRNGKey(7), x1, x1, mask, train=False)
    flat_xla = jax.tree_util.tree_flatten_with_path(p_xla)[0]
    flat_fused = jax.tree_util.tree_flatten_with_path(p_fused)[0]
    assert [k for k, _ in flat_xla] == [k for k, _ in flat_fused]
    for (k, a), (_, b) in zip(flat_xla, flat_fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))


def test_fused_bf16_close(force_fused):
    x1, _, mask = _inputs(3, [T, 28, 12, 4])
    mhca = MaskedMHCA(C, H, dtype=jnp.bfloat16)
    params = mhca.init(jax.random.PRNGKey(3), x1, x1, mask, train=True)
    ref, _ = mhca.apply(params, x1, x1, mask, train=True)
    out, _ = mhca.apply(params, x1, x1, mask, train=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )
