"""Fused MaxSigmoidCSPLayer Pallas kernel vs the XLA module path.

The kernel (ops/pallas_csp.py) runs the whole CSP layer VMEM-resident on
TPU; here it runs in interpret mode on CPU and must reproduce the XLA
module path — full and heavily masked lengths, the padded small-level
geometry (T=28 -> sublane pad), and the train path's custom-VJP grads
(whose backward IS the XLA composition's vjp). The param tree declared by
the fused branch must be IDENTICAL to the XLA branch's."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import unav_yolyolva_tpu.models.blocks as blocks
from unav_yolyolva_tpu.models.fusion import MaxSigmoidCSPLayer

B, CIN, MID, NG, FG = 3, 512, 128, 64, 48


def _layer(heads=4):
    return MaxSigmoidCSPLayer(
        in_channels=CIN,
        out_channels=2 * MID,
        guide_in_features=FG,
        embed_channels=MID,
        num_heads=heads,
    )


def _inputs(seed, t, lengths):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, t, CIN)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, NG, FG)).astype(np.float32))
    mask = np.zeros((B, t), bool)
    for i, ln in enumerate(lengths):
        mask[i, :ln] = True
    return x, g, jnp.asarray(mask)


def _ab(layer, params, x, g, mask, train):
    prev = blocks.FUSED_MHCA
    blocks.FUSED_MHCA = "never"
    try:
        ref, ref_m = layer.apply(params, x, g, mask, train=train)
    finally:
        blocks.FUSED_MHCA = prev
    blocks.FUSED_MHCA = "always"
    try:
        out, out_m = layer.apply(params, x, g, mask, train=train)
    finally:
        blocks.FUSED_MHCA = prev
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(ref_m))
    return np.asarray(ref), np.asarray(out)


@pytest.mark.parametrize("t,lengths", [
    (32, [32, 20, 5]),          # aligned T, partial masks
    (28, [28, 13, 2]),          # small-level geometry: padded to 32
    (8, [8, 8, 8]),             # tiny level, full masks
])
def test_fused_csp_matches_xla(t, lengths):
    x, g, mask = _inputs(0, t, lengths)
    layer = _layer()
    prev = blocks.FUSED_MHCA
    blocks.FUSED_MHCA = "never"
    try:
        params = layer.init(jax.random.PRNGKey(0), x, g, mask, train=True)
    finally:
        blocks.FUSED_MHCA = prev
    ref, out = _ab(layer, params, x, g, mask, train=False)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_csp_heads8():
    x, g, mask = _inputs(1, 16, [16, 9, 16])
    layer = _layer(heads=8)
    prev = blocks.FUSED_MHCA
    blocks.FUSED_MHCA = "never"
    try:
        params = layer.init(jax.random.PRNGKey(1), x, g, mask, train=True)
    finally:
        blocks.FUSED_MHCA = prev
    ref, out = _ab(layer, params, x, g, mask, train=False)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_csp_param_tree_identical():
    x, g, mask = _inputs(2, 16, [16] * B)
    layer = _layer()
    prev = blocks.FUSED_MHCA
    blocks.FUSED_MHCA = "never"
    try:
        p_xla = layer.init(jax.random.PRNGKey(7), x, g, mask, train=True)
    finally:
        blocks.FUSED_MHCA = prev
    blocks.FUSED_MHCA = "always"
    try:
        p_fused = layer.init(jax.random.PRNGKey(7), x, g, mask, train=True)
    finally:
        blocks.FUSED_MHCA = prev
    flat_a = jax.tree_util.tree_flatten_with_path(p_xla)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(p_fused)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (k, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(k))


def test_fused_csp_train_grads_match_xla():
    """Train path: fused forward + XLA-vjp backward must reproduce
    jax.grad of the pure XLA module path for params AND inputs."""
    x, g, mask = _inputs(3, 16, [16, 10, 3])
    layer = _layer()
    prev = blocks.FUSED_MHCA
    blocks.FUSED_MHCA = "never"
    try:
        params = layer.init(jax.random.PRNGKey(3), x, g, mask, train=True)
    finally:
        blocks.FUSED_MHCA = prev
    w = jnp.asarray(
        np.random.default_rng(9).normal(size=(B, 16, 2 * MID))
        .astype(np.float32)
    )

    def loss(p, a, b_):
        out, _ = layer.apply(p, a, b_, mask, train=True)
        return jnp.sum(out * w)

    blocks.FUSED_MHCA = "never"
    try:
        gp_ref, gx_ref, gg_ref = jax.grad(loss, argnums=(0, 1, 2))(
            params, x, g
        )
    finally:
        blocks.FUSED_MHCA = prev
    blocks.FUSED_MHCA = "always"
    try:
        gp, gx, gg = jax.grad(loss, argnums=(0, 1, 2))(params, x, g)
    finally:
        blocks.FUSED_MHCA = prev

    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gg_ref),
                               rtol=2e-4, atol=2e-4)
    flat_a = jax.tree_util.tree_flatten_with_path(gp_ref)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(gp)[0]
    for (k, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=str(k))
