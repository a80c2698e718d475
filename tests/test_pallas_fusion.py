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
    monkeypatch.setattr(blocks, "FUSED_MHCA", "always")


def _xla_apply(mhca, params, *args, **kw):
    """Run the XLA reference path regardless of the module-level knob
    (with the train path now also fused, train=True alone no longer
    selects the reference branch)."""
    prev = blocks.FUSED_MHCA
    blocks.FUSED_MHCA = "never"
    try:
        return mhca.apply(params, *args, **kw)
    finally:
        blocks.FUSED_MHCA = prev


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
    ref, ref_mask = _xla_apply(mhca, params, x1, x1, mask, train=True)
    out, out_mask = mhca.apply(params, x1, x1, mask, train=False)
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(ref_mask))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_fused_matches_xla_cross_attention(force_fused):
    x1, x2, mask = _inputs(1, [T, 25, 16, 8])
    mhca = MaskedMHCA(C, H)
    params = mhca.init(jax.random.PRNGKey(1), x1, x2, mask, train=True)
    ref, _ = _xla_apply(mhca, params, x1, x2, mask, train=True)
    out, _ = mhca.apply(params, x1, x2, mask, train=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_param_tree_identical_across_branches(force_fused):
    """Init through the FUSED branch must declare exactly the XLA branch's
    param tree (names, shapes, values for the same PRNG key)."""
    x1, _, mask = _inputs(2, [T] * B)
    mhca = MaskedMHCA(C, H)
    prev = blocks.FUSED_MHCA
    blocks.FUSED_MHCA = "never"
    try:
        p_xla = mhca.init(jax.random.PRNGKey(7), x1, x1, mask, train=True)
    finally:
        blocks.FUSED_MHCA = prev
    p_fused = mhca.init(jax.random.PRNGKey(7), x1, x1, mask, train=False)
    flat_xla = jax.tree_util.tree_flatten_with_path(p_xla)[0]
    flat_fused = jax.tree_util.tree_flatten_with_path(p_fused)[0]
    assert [k for k, _ in flat_xla] == [k for k, _ in flat_fused]
    for (k, a), (_, b) in zip(flat_xla, flat_fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))


def _packed_grads(tree):
    from unav_yolyolva_tpu.ops.pallas_fusion import pack_mhca_params
    return pack_mhca_params(tree["params"])


def test_fused_train_grads_match_xla():
    """mhca_fused_train's custom-VJP backward kernel (interpret mode) must
    reproduce jax.grad of the XLA module path — for inputs AND every weight.
    pack_mhca_params is linear, so packing the XLA param-tree grads gives
    the packed-space grads to compare against."""
    from unav_yolyolva_tpu.ops.pallas_fusion import (
        mhca_fused_train, pack_mhca_params,
    )

    x1, x2, mask = _inputs(5, [T, 26, 15, 8])
    mhca = MaskedMHCA(C, H)
    params = mhca.init(jax.random.PRNGKey(5), x1, x2, mask, train=True)
    packed = pack_mhca_params(params["params"])
    w_out = jnp.asarray(
        np.random.default_rng(9).normal(size=(B, T, C)).astype(np.float32)
    )

    def f_ref(p, a, b_):
        out, _ = mhca.apply(p, a, b_, mask, train=True)
        return jnp.sum(out * w_out)

    def f_fused(pk, a, b_):
        out = mhca_fused_train(a, b_, mask, *pk, heads=H, interpret=True)
        return jnp.sum(out * w_out)

    gp_ref, gx1_ref, gx2_ref = jax.grad(f_ref, argnums=(0, 1, 2))(
        params, x1, x2
    )
    gpk, gx1, gx2 = jax.grad(f_fused, argnums=(0, 1, 2))(packed, x1, x2)

    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx1_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx2_ref),
                               rtol=2e-4, atol=2e-4)
    gpk_ref = pack_mhca_params(gp_ref["params"])
    names = ["dw", "lnw", "lnb", "dwt", "dbs"]
    for name, a, b_ in zip(names, gpk, gpk_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_fused_train_forward_value():
    """The custom-VJP primal equals the forward-only kernel."""
    from unav_yolyolva_tpu.ops.pallas_fusion import (
        mhca_fused, mhca_fused_train, pack_mhca_params,
    )

    x1, x2, mask = _inputs(6, [T, 30, 2, T])
    mhca = MaskedMHCA(C, H)
    params = mhca.init(jax.random.PRNGKey(6), x1, x2, mask, train=True)
    packed = pack_mhca_params(params["params"])
    a = mhca_fused(x1, x2, mask, *packed, heads=H, interpret=True)
    b_ = mhca_fused_train(x1, x2, mask, *packed, heads=H, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_fused_sharded_matches_single_device():
    """GSPMD cannot auto-partition a Mosaic kernel, so the public wrappers
    shard_map over the registered mesh. Forward and ALL grads (incl. the
    replicated-weight psum inserted by shard_map's transpose) must equal
    the single-device run on the 8-virtual-device mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from unav_yolyolva_tpu.ops.pallas_fusion import (
        mhca_fused, mhca_fused_train, pack_mhca_params, set_fused_mesh,
    )

    B8 = 16  # divisible by the 8-device mesh
    rng = np.random.default_rng(11)
    x1 = jnp.asarray(rng.normal(size=(B8, T, C)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(B8, T, C)).astype(np.float32))
    mask = np.zeros((B8, T), bool)
    for i in range(B8):
        mask[i, : rng.integers(1, T + 1)] = True
    mask = jnp.asarray(mask)
    mhca = MaskedMHCA(C, H)
    params = mhca.init(jax.random.PRNGKey(11), x1, x2, mask, train=True)
    packed = pack_mhca_params(params["params"])
    w = jnp.asarray(rng.normal(size=(B8, T, C)).astype(np.float32))

    def f(pk, a, b_):
        out = mhca_fused_train(a, b_, mask, *pk, heads=H, interpret=True)
        return jnp.sum(out * w)

    set_fused_mesh(None)
    try:
        g1 = jax.grad(f, argnums=(0, 1, 2))(packed, x1, x2)
        fw1 = mhca_fused(x1, x2, mask, *packed, heads=H, interpret=True)

        mesh = Mesh(np.array(jax.devices()), ("data",))
        set_fused_mesh(mesh)
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        gfn = jax.jit(
            jax.grad(f, argnums=(0, 1, 2)),
            in_shardings=((repl,) * 5, data, data),
        )
        g8 = gfn(jax.device_put(packed, repl),
                 jax.device_put(x1, data), jax.device_put(x2, data))
        for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-5)
        fw8 = jax.jit(
            lambda a, b_: mhca_fused(a, b_, mask, *packed, heads=H,
                                     interpret=True)
        )(jax.device_put(x1, data), jax.device_put(x2, data))
        np.testing.assert_allclose(np.asarray(fw1), np.asarray(fw8),
                                   rtol=1e-6, atol=1e-6)
    finally:
        set_fused_mesh(None)


def test_fused_bf16_close(force_fused):
    x1, _, mask = _inputs(3, [T, 28, 12, 4])
    mhca = MaskedMHCA(C, H, dtype=jnp.bfloat16)
    params = mhca.init(jax.random.PRNGKey(3), x1, x1, mask, train=True)
    ref, _ = _xla_apply(mhca, params, x1, x1, mask, train=True)
    out, _ = mhca.apply(params, x1, x1, mask, train=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )
