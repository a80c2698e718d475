"""Level-packed head towers vs the per-level loop.

The packed execution (heads._pack_levels + one tower pass) must be
numerically identical to running the shared towers per level: the zero
gap frames reproduce each level's conv zero padding, and in-level masked
positions keep the reference's relu(LN-bias) propagation. Covers forward
(full + partial masks), the param tree, and gradients.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import unav_yolyolva_tpu.models.heads as heads
from unav_yolyolva_tpu.models.heads import ClsHead, RegHead

B, C, NCLS = 2, 64, 13
LENGTHS = [33, 17, 9, 5]


def _pyramid(seed, full_masks=False):
    rng = np.random.default_rng(seed)
    feats, masks = [], []
    for t in LENGTHS:
        feats.append(
            jnp.asarray(rng.normal(size=(B, t, C)).astype(np.float32))
        )
        m = np.ones((B, t), bool)
        if not full_masks:
            m[1, max(1, t // 2):] = False
        masks.append(jnp.asarray(m))
    return feats, masks


def _ab(module, seed, full_masks=False):
    feats, masks = _pyramid(seed, full_masks)
    prev = heads.PACKED_HEADS
    heads.PACKED_HEADS = "never"
    try:
        params = module.init(jax.random.PRNGKey(seed), feats, masks)
        ref = module.apply(params, feats, masks)
    finally:
        heads.PACKED_HEADS = prev
    heads.PACKED_HEADS = "auto"
    try:
        params_p = module.init(jax.random.PRNGKey(seed), feats, masks)
        out = module.apply(params, feats, masks)
    finally:
        heads.PACKED_HEADS = prev
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(params_p)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    return params, feats, masks, ref, out


@pytest.mark.parametrize("full_masks", [True, False])
def test_cls_head_packed_matches_loop(full_masks):
    module = ClsHead(feat_dim=C, num_classes=NCLS, empty_cls=(3,))
    _, _, _, ref, out = _ab(module, 0, full_masks)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("class_aware", [True, False])
def test_reg_head_packed_matches_loop(class_aware):
    module = RegHead(feat_dim=C, num_classes=NCLS,
                     fpn_levels=len(LENGTHS), class_aware=class_aware)
    _, _, _, ref, out = _ab(module, 1)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)


def test_packed_heads_grads_match_loop():
    module = ClsHead(feat_dim=C, num_classes=NCLS)
    params, feats, masks, _, _ = _ab(module, 2)
    w = [
        jnp.asarray(
            np.random.default_rng(7 + i).normal(size=(B, t, NCLS))
            .astype(np.float32)
        )
        for i, t in enumerate(LENGTHS)
    ]

    def loss(p, fs):
        outs = module.apply(p, fs, masks)
        return sum(jnp.sum(o * wi) for o, wi in zip(outs, w))

    prev = heads.PACKED_HEADS
    heads.PACKED_HEADS = "never"
    try:
        gp_ref, gf_ref = jax.grad(loss, argnums=(0, 1))(params, feats)
    finally:
        heads.PACKED_HEADS = prev
    heads.PACKED_HEADS = "auto"
    try:
        gp, gf = jax.grad(loss, argnums=(0, 1))(params, feats)
    finally:
        heads.PACKED_HEADS = prev

    for a, b in zip(jax.tree.leaves(gf_ref), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
    flat_a = jax.tree_util.tree_flatten_with_path(gp_ref)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(gp)[0]
    for (k, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6, err_msg=str(k))
