"""Dependency block (optional `use_dependency: True` path).

Covers the one component no other test exercised:
  * forward is finite and masked-correct WITH padded frames — the
    co-occurrence branch flattens frames into the batch axis, so padded
    frames become attention rows with zero valid kv tokens (this caught a
    real NaN bug in the -inf masked softmax),
  * numerical parity against the actual reference Dependency_Block
    (`/root/reference/libs/modeling/dependency_block.py:6-68`) with
    converted weights (slow tier).
"""

import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unav_yolyolva_tpu.models.dependency import DependencyBlock

REFERENCE = "/root/reference"

B, T, CIN, H, NCLS = 2, 16, 16, 8, 5


def _inputs():
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.normal(size=(B, T, CIN)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, T // 2, CIN)), jnp.float32),
    ]
    masks = []
    for lvl, t_l in enumerate((T, T // 2)):
        m = np.zeros((B, t_l), bool)
        m[0, :] = True
        m[1, : max(1, t_l - 5)] = True  # padded tail on sample 1
        masks.append(jnp.asarray(m))
    return feats, masks


@pytest.fixture(scope="module")
def block_and_params():
    block = DependencyBlock(
        in_channel=CIN, n_embd=H, n_embd_ks=3, num_classes=NCLS,
        path_pdrop=0.1, n_head=1,
    )
    feats, masks = _inputs()
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda k: block.init(
            {"params": k, "droppath": k}, feats, masks, train=False
        )
    )(key)
    return block, params


def test_forward_finite_and_masked(block_and_params):
    block, params = block_and_params
    feats, masks = _inputs()
    out_feats, out_masks = jax.jit(
        lambda p: block.apply(p, feats, masks, train=False)
    )(params)
    for lvl, (f, m) in enumerate(zip(out_feats, out_masks)):
        f = np.asarray(f)
        assert f.shape == (B, feats[lvl].shape[1], CIN)
        assert np.isfinite(f).all(), f"NaN/Inf at level {lvl}"
        # padded frames are exactly zero (squeeze conv re-masks)
        invalid = ~np.asarray(m)
        assert np.all(f[invalid] == 0.0)
        # valid frames carry signal
        assert np.abs(f[np.asarray(m)]).max() > 0


def test_grads_finite(block_and_params):
    block, params = block_and_params
    feats, masks = _inputs()

    def loss(p):
        out, _ = block.apply(p, feats, masks, train=False)
        return sum(jnp.sum(x * x) for x in out)

    g = jax.jit(jax.grad(loss))(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)
def test_matches_reference_block(block_and_params):
    import torch
    import torch.nn as nn

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    mm = types.ModuleType("mmengine")
    mmm = types.ModuleType("mmengine.model")
    mmm.BaseModule = BaseModule
    mm.model = mmm
    sys.modules.setdefault("mmengine", mm)
    sys.modules.setdefault("mmengine.model", mmm)
    sys.modules.setdefault("nms_1d_cpu", types.ModuleType("nms_1d_cpu"))
    sys.path.insert(0, REFERENCE)
    try:
        from libs.modeling.dependency_block import Dependency_Block
    finally:
        sys.path.remove(REFERENCE)

    torch.manual_seed(0)
    ref = Dependency_Block(
        in_channel=CIN, n_embd=H, n_embd_ks=3, num_classes=NCLS,
        path_pdrop=0.1, n_head=1,
    )
    ref.eval()

    # map the reference weights onto our tree through the standard layout
    # conversions (utils/torch_convert.py)
    from unav_yolyolva_tpu.utils.torch_convert import (
        _conv, _set_path, _transformer_block_entries,
    )

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree = {}
    _set_path(tree, ("feature_expand", "conv", "kernel"),
              _conv(sd["feature_expand.conv.weight"]))
    _set_path(tree, ("feature_squeeze", "conv", "kernel"),
              _conv(sd["feature_squeeze.conv.weight"]))
    for t_prefix, f_name in (
        ("temporal_branch", "temporal_branch"),
        ("cooccur_branch", "cooccur_branch"),
    ):
        for tkey, fpath, fn in _transformer_block_entries(t_prefix, (f_name,)):
            _set_path(tree, fpath, fn(sd[tkey]))
    params = {"params": tree}

    block, _ = block_and_params
    feats, masks = _inputs()
    ours_f, _ = jax.jit(
        lambda p: block.apply(p, feats, masks, train=False)
    )(params)

    with torch.no_grad():
        t_feats = [
            torch.from_numpy(np.transpose(np.asarray(f), (0, 2, 1)))
            for f in feats
        ]
        t_masks = [
            torch.from_numpy(np.asarray(m)[:, None, :]) for m in masks
        ]
        ref_f, _ = ref(t_feats, t_masks)

    for lvl, (a, b) in enumerate(zip(ours_f, ref_f)):
        np.testing.assert_allclose(
            np.asarray(a), np.transpose(b.numpy(), (0, 2, 1)),
            rtol=2e-4, atol=2e-4, err_msg=f"level {lvl}",
        )
