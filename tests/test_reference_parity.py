"""Structural parity against the actual reference implementation.

Imports the reference from /root/reference (with an mmengine shim), builds
its model, and cross-validates every live parameter against our flagship
flax tree through the converter key map: total live parameter count must be
identical and every mapped shape must agree. Skipped when the reference tree
is unavailable."""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)

DEAD = (
    "backbone.ori_cross_att_Va.", "backbone.ori_cross_att_Av.",
    "backbone.cross_att_Va.", "backbone.cross_att_Av.",
    "backbone.fusion_module.projections.",
)


@pytest.fixture(scope="module")
def ref_param_shapes():
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
        from libs.core import load_config as ref_load
        from libs.modeling import make_multimodal_meta_arch

        cfg = ref_load(os.path.join(REFERENCE, "configs/avel_unav100_eval.yaml"))
        model = make_multimodal_meta_arch(cfg["model_name"], **cfg["model"])
    finally:
        sys.path.remove(REFERENCE)
    shapes = {}
    for n, p in model.named_parameters():
        if not n.startswith(DEAD):
            shapes[n] = tuple(p.shape)
    return shapes


@pytest.fixture(scope="module")
def our_param_shapes():
    import jax
    import jax.numpy as jnp

    from unav_yolyolva_tpu.core.config import load_config_dict
    from unav_yolyolva_tpu.models import build_model

    cfg = load_config_dict({
        "dataset": {"max_seq_len": 224, "num_classes": 100},
        "model": {"use_abs_pe": True, "class_aware": True},
        "train_cfg": {"loss_weight": 1},
    })
    model = build_model(cfg)
    b, t, c = 1, 224, 100
    inputs = {
        "visual": jnp.zeros((b, t, 2048)), "audio": jnp.zeros((b, t, 128)),
        "mask": jnp.ones((b, t), bool), "m_scores": jnp.zeros((b, t)),
        "m_start_end": jnp.zeros((b, t)), "m_labels": jnp.zeros((b, t, c)),
    }
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: model.init({"params": rng, "droppath": rng}, inputs,
                           train=False)
    )
    return shapes["params"]


def _expected_flax_shape(fn_name, tshape):
    if fn_name == "_lin":
        return tuple(reversed(tshape))
    if fn_name == "_conv":
        return (tshape[2], tshape[1], tshape[0])
    if fn_name == "_conv1x1_dense":
        return (tshape[1], tshape[0])
    if fn_name == "_chan_ln":
        return (int(np.prod(tshape)),)
    if fn_name == "_adp":
        return (1, 1, tshape[1])
    return tuple(tshape)


def test_live_param_count_identical(ref_param_shapes, our_param_shapes):
    import jax

    ref_total = sum(int(np.prod(s)) for s in ref_param_shapes.values())
    our_total = sum(
        int(np.prod(l.shape)) for l in jax.tree.leaves(our_param_shapes)
    )
    assert our_total == ref_total, (
        f"live param count mismatch: ours {our_total} vs ref {ref_total}"
    )


def test_every_param_shape_matches(ref_param_shapes, our_param_shapes):
    from unav_yolyolva_tpu.utils.torch_convert import build_key_map, _get_path

    covered = set()
    mismatches = []
    for tkey, fpath, fn in build_key_map((2, 3, 5)):
        assert tkey in ref_param_shapes, f"map key not in reference: {tkey}"
        leaf = _get_path(our_param_shapes, fpath)
        exp = _expected_flax_shape(fn.__name__, ref_param_shapes[tkey])
        if tuple(leaf.shape) != exp:
            mismatches.append((tkey, tuple(leaf.shape), exp))
        covered.add(tkey)
    assert not mismatches, mismatches[:10]
    uncovered = set(ref_param_shapes) - covered
    assert not uncovered, sorted(uncovered)[:10]
