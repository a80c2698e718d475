"""Fused whole-TransformerBlock Pallas kernel vs the XLA module path.

The kernel (ops/pallas_tblock.py) runs the stem block — ln11/ln12, the
MaskedMHCA, both droppath-scaled residual adds, ln2 and the 4x MLP —
VMEM-resident on TPU; here it runs in interpret mode on CPU and must
reproduce the XLA module path: eval forward, the train path's
recompute-backward custom-VJP grads, droppath rng parity (same per-sample
draws as the module path from the same rng stream), the bf16 compute
policy, and an identical declared param tree."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import unav_yolyolva_tpu.models.blocks as blocks
from unav_yolyolva_tpu.models.blocks import TransformerBlock

B, T, C, HEADS = 3, 16, 128, 4


def _block(pdrop=0.1, dtype=None):
    return TransformerBlock(C, HEADS, path_pdrop=pdrop, dtype=dtype)


def _inputs(seed, lengths):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.zeros((B, T), bool)
    for i, ln in enumerate(lengths):
        mask[i, :ln] = True
    return x, jnp.asarray(mask)


def _init(layer, x, mask, seed=0):
    prev = blocks.FUSED_TBLOCK
    blocks.FUSED_TBLOCK = "never"
    try:
        return layer.init(
            {"params": jax.random.PRNGKey(seed),
             "droppath": jax.random.PRNGKey(seed + 1)},
            x, x, mask, train=True,
        )
    finally:
        blocks.FUSED_TBLOCK = prev


def _apply(layer, params, x, mask, mode, train, rngs=None):
    prev_tb, prev_mh = blocks.FUSED_TBLOCK, blocks.FUSED_MHCA
    blocks.FUSED_TBLOCK = mode
    # the fused whole-block path embeds the MHCA math; the XLA reference
    # path must not route its inner MHCA through the standalone kernel
    blocks.FUSED_MHCA = "always" if mode == "always" else "never"
    try:
        return layer.apply(params, x, x, mask, train=train,
                           rngs=rngs or {})
    finally:
        blocks.FUSED_TBLOCK, blocks.FUSED_MHCA = prev_tb, prev_mh


@pytest.mark.parametrize("lengths", [[16, 16, 16], [16, 9, 2]])
def test_fused_tblock_matches_xla_eval(lengths):
    x, mask = _inputs(0, lengths)
    layer = _block()
    params = _init(layer, x, mask)
    ref, ref_m = _apply(layer, params, x, mask, "never", train=False)
    out, out_m = _apply(layer, params, x, mask, "always", train=False)
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(ref_m))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_tblock_no_droppath():
    x, mask = _inputs(1, [16, 12, 16])
    layer = _block(pdrop=0.0)
    params = _init(layer, x, mask)
    ref, _ = _apply(layer, params, x, mask, "never", train=False)
    out, _ = _apply(layer, params, x, mask, "always", train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_tblock_param_tree_identical():
    x, mask = _inputs(2, [16] * B)
    layer = _block()
    p_xla = _init(layer, x, mask, seed=7)
    prev = blocks.FUSED_TBLOCK
    blocks.FUSED_TBLOCK = "always"
    try:
        p_fused = layer.init(
            {"params": jax.random.PRNGKey(7),
             "droppath": jax.random.PRNGKey(8)},
            x, x, mask, train=True,
        )
    finally:
        blocks.FUSED_TBLOCK = prev
    flat_a = jax.tree_util.tree_flatten_with_path(p_xla)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(p_fused)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (k, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(k))


def test_fused_tblock_droppath_rng_parity():
    """Under train with path_pdrop > 0, the fused path must apply the SAME
    per-sample droppath draws as the XLA path (AffineDropPath multiplier
    mode shares the rng stream), so outputs agree draw-for-draw."""
    x, mask = _inputs(3, [16, 10, 16])
    layer = _block(pdrop=0.5)
    params = _init(layer, x, mask, seed=3)
    rngs = {"droppath": jax.random.PRNGKey(42)}
    ref, _ = _apply(layer, params, x, mask, "never", train=True, rngs=rngs)
    out, _ = _apply(layer, params, x, mask, "always", train=True, rngs=rngs)
    # with pdrop=0.5 some samples must actually be dropped for the test to
    # mean anything — verify the two paths agree INCLUDING those zeros
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_tblock_train_grads_match_xla():
    x, mask = _inputs(4, [16, 11, 3])
    layer = _block(pdrop=0.1)
    params = _init(layer, x, mask, seed=4)
    w = jnp.asarray(
        np.random.default_rng(9).normal(size=(B, T, C)).astype(np.float32)
    )
    rngs = {"droppath": jax.random.PRNGKey(5)}

    def loss(mode):
        def f(p, a):
            out, _ = _apply(layer, p, a, mask, mode, train=True, rngs=rngs)
            return jnp.sum(out * w)
        return f

    gp_ref, gx_ref = jax.grad(loss("never"), argnums=(0, 1))(params, x)
    gp, gx = jax.grad(loss("always"), argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4)
    flat_a = jax.tree_util.tree_flatten_with_path(gp_ref)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(gp)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (k, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=str(k))


def test_fused_tblock_bf16_close():
    """Under the bf16 compute policy the fused block must track the XLA
    bf16 path within bf16 tolerance (both keep an fp32 residual stream —
    the AffineDropPath scale is fp32 — with bf16 matmul islands)."""
    x, mask = _inputs(5, [16, 13, 16])
    layer = _block(dtype=jnp.bfloat16)
    params = _init(layer, x, mask, seed=5)
    ref, _ = _apply(layer, params, x, mask, "never", train=False)
    out, _ = _apply(layer, params, x, mask, "always", train=False)
    assert ref.dtype == out.dtype == jnp.float32  # fp32 residual stream
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_fused_tblock_sharded_matches_single_device():
    """tblock_fused shard_maps over the registered mesh (x/mask/multiplier
    batch-sharded, weights replicated); forward and grads must equal the
    single-device run on the 8-virtual-device mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from unav_yolyolva_tpu.ops.pallas_fusion import set_fused_mesh
    from unav_yolyolva_tpu.ops.pallas_tblock import (
        pack_tblock_params, tblock_fused,
    )

    B8 = 8
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(B8, T, C)).astype(np.float32))
    mask = np.zeros((B8, T), bool)
    for i in range(B8):
        mask[i, : rng.integers(1, T + 1)] = True
    mask = jnp.asarray(mask)

    layer = _block()
    params = _init(layer, x[:B], mask[:B], seed=13)
    packed = pack_tblock_params(params["params"])
    ma = jnp.ones((B8, 1, C), jnp.float32) * 0.7
    mm = jnp.ones((B8, 1, C), jnp.float32) * 1.3
    w = jnp.asarray(rng.normal(size=(B8, T, C)).astype(np.float32))

    def f(pk, a):
        out = tblock_fused(a, mask, ma, mm, *pk, heads=HEADS, train=True,
                           interpret=True)
        return jnp.sum(out * w)

    set_fused_mesh(None)
    try:
        g1 = jax.grad(f, argnums=(0, 1))(packed, x)
        fw1 = tblock_fused(x, mask, ma, mm, *packed, heads=HEADS,
                           interpret=True)

        mesh = Mesh(np.array(jax.devices()), ("data",))
        set_fused_mesh(mesh)
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        gfn = jax.jit(
            jax.grad(f, argnums=(0, 1)),
            in_shardings=((repl,) * len(packed), data),
        )
        g8 = gfn(jax.device_put(packed, repl), jax.device_put(x, data))
        for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-5)
        fw8 = jax.jit(
            lambda a: tblock_fused(a, mask, ma, mm, *packed, heads=HEADS,
                                   interpret=True)
        )(jax.device_put(x, data))
        np.testing.assert_allclose(np.asarray(fw1), np.asarray(fw8),
                                   rtol=1e-6, atol=1e-6)
    finally:
        set_fused_mesh(None)


def test_pick_rows_tblock_vmem_budget():
    """The row pickers must respect the kernel's compiler VMEM limit at
    the flagship stem shapes (T=224, C=512, H=2048, 4 heads) for both
    dtypes and for the heavier recompute backward."""
    from unav_yolyolva_tpu.ops.pallas_tblock import (
        TBLOCK_VMEM_LIMIT, _pick_rows_tb, _pick_rows_tb_bwd,
    )

    for b in (8, 64, 128, 256):
        for itemsize in (2, 4):
            r = _pick_rows_tb(b, 224, 512, 2048, 4, itemsize)
            rb = _pick_rows_tb_bwd(b, 224, 512, 2048, 4, itemsize)
            assert b % r == 0 and b % rb == 0
            for rr, picker_budget in ((r, 48), (rb, 44)):
                assert rr >= 1
            # the forward model's own accounting stays under the limit
            act = 14 * r * 224 * 512 * itemsize
            mlp = r * 224 * 2048 * itemsize + r * 224 * 2048 * (4 - itemsize)
            att = 2 * r * 4 * 224 * 224 * 4
            assert 2 * (act + mlp + att) <= TBLOCK_VMEM_LIMIT
