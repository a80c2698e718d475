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


def test_fused_csp_sharded_matches_single_device():
    """GSPMD cannot auto-partition a Mosaic kernel, so csp_fused
    shard_maps over the registered mesh (x/guide/mask batch-sharded,
    weights replicated). Forward and ALL grads — including the
    replicated-weight psum inserted by shard_map's transpose and the
    kernel-backed MHCA backward — must equal the single-device run on
    the 8-virtual-device mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from unav_yolyolva_tpu.ops.pallas_csp import csp_fused, pack_csp_params
    from unav_yolyolva_tpu.ops.pallas_fusion import set_fused_mesh

    B8, T8 = 8, 16
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(B8, T8, CIN)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B8, NG, FG)).astype(np.float32))
    mask = np.zeros((B8, T8), bool)
    for i in range(B8):
        mask[i, : rng.integers(1, T8 + 1)] = True
    mask = jnp.asarray(mask)

    layer = _layer()
    prev = blocks.FUSED_MHCA
    blocks.FUSED_MHCA = "never"
    try:
        params = layer.init(jax.random.PRNGKey(13), x, g, mask, train=True)
    finally:
        blocks.FUSED_MHCA = prev
    packed = pack_csp_params(params["params"])
    w = jnp.asarray(
        rng.normal(size=(B8, T8, 2 * MID)).astype(np.float32)
    )

    def f(pk, a, b_):
        out = csp_fused(a, b_, mask, *pk, attn_heads=4, train=True,
                        interpret=True)
        return jnp.sum(out * w)

    set_fused_mesh(None)
    try:
        g1 = jax.grad(f, argnums=(0, 1, 2))(packed, x, g)
        fw1 = csp_fused(x, g, mask, *packed, attn_heads=4, interpret=True)

        mesh = Mesh(np.array(jax.devices()), ("data",))
        set_fused_mesh(mesh)
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        gfn = jax.jit(
            jax.grad(f, argnums=(0, 1, 2)),
            in_shardings=((repl,) * len(packed), data, data),
        )
        g8 = gfn(jax.device_put(packed, repl),
                 jax.device_put(x, data), jax.device_put(g, data))
        for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-5)
        fw8 = jax.jit(
            lambda a, b_: csp_fused(a, b_, mask, *packed, attn_heads=4,
                                    interpret=True)
        )(jax.device_put(x, data), jax.device_put(g, data))
        np.testing.assert_allclose(np.asarray(fw1), np.asarray(fw8),
                                   rtol=1e-6, atol=1e-6)
    finally:
        set_fused_mesh(None)


def test_fused_csp_bf16_close():
    """Under the bf16 compute policy the fused layer must track the XLA
    bf16 path within bf16 tolerance (both share fp32 LN/softmax/matmul-
    accumulation islands)."""
    x, g, mask = _inputs(4, 16, [16, 11, 16])
    layer = MaxSigmoidCSPLayer(
        in_channels=CIN, out_channels=2 * MID, guide_in_features=FG,
        embed_channels=MID, num_heads=4, dtype=jnp.bfloat16,
    )
    prev = blocks.FUSED_MHCA
    blocks.FUSED_MHCA = "never"
    try:
        params = layer.init(jax.random.PRNGKey(4), x, g, mask, train=True)
        ref, _ = layer.apply(params, x, g, mask, train=False)
    finally:
        blocks.FUSED_MHCA = prev
    blocks.FUSED_MHCA = "always"
    try:
        out, _ = layer.apply(params, x, g, mask, train=False)
    finally:
        blocks.FUSED_MHCA = prev
    assert out.dtype == ref.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_pick_rows_vmem_budget_flagship():
    """Regression: the row-picker's VMEM model must include the guide's
    FULL token width (Fg=224, independent of the level's T) and the
    projected guide. The old model counted the guide as Ng*T and picked
    R=64 at the t=8 level of the 2B=128 eval fusion pass -> 164 MB of
    scoped VMEM on a 128 MB chip (on-device Mosaic OOM; the driver bench
    silently fell back to the XLA path). Pins R at the flagship shapes
    so the estimate never exceeds the kernel's compiler limit."""
    from unav_yolyolva_tpu.ops.pallas_csp import (
        CSP_VMEM_LIMIT, _pick_rows_csp,
    )

    for b in (16, 128, 256):
        for t in (8, 16, 28, 56, 112, 224):
            r = _pick_rows_csp(b, t, 1024, 256, 512, 224, 256, 512, 4)
            assert b % r == 0
            windows = 2 * (t * 1024 + 512 * 224 + t + t * 512) * 4
            live = (512 * 256 + 12 * t * 256) * 4 + (4 * t * t + t * 512) * 4
            assert r * (windows + 2 * live) <= CSP_VMEM_LIMIT
    # the t=8, b=128 case that OOM'd must now choose a small block
    assert _pick_rows_csp(128, 8, 1024, 256, 512, 224, 256, 512, 4) <= 32


def test_pick_rows_vmem_budget_bf16_accumulators():
    """Regression: under bf16 the fp32 accumulator of the largest dot
    (preferred_element_type=f32) lives alongside its bf16 copy. A model
    that counted liveness at itemsize=2 picked R=64 for the 2B=128, t=8
    bf16 TRAIN pass and Mosaic measured 119.6 MB of scoped stack against
    the 107 MB limit (bottom_up_4 VMEM OOM on real v5e). The bf16 pick at
    that shape must now be <= 32, and every bf16 pick must satisfy the
    accumulator-aware budget — while fp32 picks (on-chip proven) must be
    unchanged by the added (4 - itemsize)-scaled term."""
    from unav_yolyolva_tpu.ops.pallas_csp import (
        CSP_VMEM_LIMIT, _pick_rows_csp,
    )

    assert _pick_rows_csp(128, 8, 1024, 256, 512, 224, 256, 512, 2) <= 32
    for b in (16, 128, 256):
        for t in (8, 16, 28, 56, 112, 224):
            r = _pick_rows_csp(b, t, 1024, 256, 512, 224, 256, 512, 2)
            assert b % r == 0
            windows = 2 * (t * 1024 + 512 * 224 + t + t * 512) * 2
            acc32 = max(512 * 256, 2 * t * 256, 6 * t * 256, t * 512) * 2
            live = ((512 * 256 + 12 * t * 256) * 2 + acc32
                    + (4 * t * t + t * 512) * 4)
            assert r * (windows + 2 * live) <= CSP_VMEM_LIMIT
