"""Torch checkpoint converter tests: build a tiny model, export to the
reference key space, re-import, and check a bit-exact round trip plus layout
conventions against torch ops."""

import numpy as np
import jax
import pytest

from unav_yolyolva_tpu.utils.torch_convert import (
    build_key_map,
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)


@pytest.fixture(scope="module")
def tiny_params():
    import jax.numpy as jnp
    from unav_yolyolva_tpu.models import LocPointTransformer

    model = LocPointTransformer(
        raw_input_dim_V=24, raw_input_dim_A=12, input_dim_V=32,
        input_dim_A=32, num_classes=8, max_seq_len=32,
        backbone_arch=(2, 3, 5), n_head=4, embd_dim=32, head_dim=32,
        use_abs_pe=True, class_aware=True, droppath=0.1,
    )
    B, T = 1, 32
    batch = {
        "visual": jnp.zeros((B, T, 24)), "audio": jnp.zeros((B, T, 12)),
        "mask": jnp.ones((B, T), bool), "m_scores": jnp.zeros((B, T)),
        "m_start_end": jnp.zeros((B, T)),
        "m_labels": jnp.zeros((B, T, 8)),
    }
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda k, b: model.init({"params": k, "droppath": k}, b, train=False)
    )(key, batch)
    return jax.device_get(params)


def test_key_map_covers_all_params(tiny_params):
    """Every live parameter leaf must be covered by the key map."""
    covered = {path for _, path, _ in build_key_map((2, 3, 5))}
    flat = jax.tree_util.tree_flatten_with_path(tiny_params["params"])[0]
    leaves = {
        tuple(p.key for p in path if hasattr(p, "key")) for path, _ in flat
    }
    missing = leaves - covered
    assert not missing, f"unmapped param leaves: {sorted(missing)[:10]}"


def test_roundtrip_bitexact(tiny_params):
    sd = params_to_torch_state_dict(tiny_params)
    back = torch_state_dict_to_params(sd, strict=True)
    flat_a = jax.tree_util.tree_flatten_with_path(tiny_params["params"])[0]
    flat_b_tree = back["params"]
    import operator
    from functools import reduce

    for path, val in flat_a:
        keys = [p.key for p in path if hasattr(p, "key")]
        got = reduce(operator.getitem, keys, flat_b_tree)
        np.testing.assert_array_equal(
            np.asarray(val), np.asarray(got), err_msg="/".join(keys)
        )


def test_shared_instances_replicated(tiny_params):
    sd = params_to_torch_state_dict(tiny_params)
    np.testing.assert_array_equal(
        sd["alignment.multiway_list.0.attn_fusion.q.weight"],
        sd["alignment.multiway_list.1.attn_fusion.q.weight"],
    )
    np.testing.assert_array_equal(
        sd["backbone.fusion_module.downsample_layers.0.down_conv.conv.weight"],
        sd["backbone.fusion_module.downsample_layers.4.down_conv.conv.weight"],
    )


def test_dead_keys_ignored_on_import(tiny_params):
    sd = params_to_torch_state_dict(tiny_params)
    sd["backbone.ori_cross_att_Va.ln11.weight"] = np.ones((1, 32, 1))
    sd["backbone.fusion_module.projections.0.conv.weight"] = np.ones((32, 32, 1))
    back = torch_state_dict_to_params(sd, strict=True)  # must not raise
    assert "ori_cross_att_Va" not in back["params"].get("backbone", {})


def test_layout_convention_vs_torch(tiny_params):
    """A converted Dense kernel must reproduce torch.nn.functional.linear."""
    import torch

    sd = params_to_torch_state_dict(tiny_params)
    w_t = torch.from_numpy(
        np.ascontiguousarray(sd["alignment.proj_fc_video.0.weight"])
    )
    b_t = torch.from_numpy(
        np.ascontiguousarray(sd["alignment.proj_fc_video.0.bias"])
    )
    x = torch.randn(3, w_t.shape[1])
    ref = torch.nn.functional.linear(x, w_t, b_t).numpy()

    kernel = tiny_params["params"]["alignment"]["proj_fc_video"]["kernel"]
    bias = tiny_params["params"]["alignment"]["proj_fc_video"]["bias"]
    ours = x.numpy() @ np.asarray(kernel) + np.asarray(bias)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_conv_layout_vs_torch(tiny_params):
    """Converted Conv1d weights must reproduce torch conv1d on (B, C, T)."""
    import torch
    import jax.numpy as jnp
    from flax import linen as nn

    sd = params_to_torch_state_dict(tiny_params)
    w = sd["backbone.embd_V.0.conv.weight"]  # (out, in, k)
    x = np.random.default_rng(0).normal(size=(2, w.shape[1], 16)).astype(np.float32)
    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(np.ascontiguousarray(w)),
        padding=w.shape[2] // 2,
    ).numpy()  # (B, out, T)

    kernel = tiny_params["params"]["backbone"]["embd_V_0"]["conv"]["kernel"]
    conv = nn.Conv(features=w.shape[0], kernel_size=(w.shape[2],),
                   padding=w.shape[2] // 2, use_bias=False)
    ours = conv.apply(
        {"params": {"kernel": jnp.asarray(kernel)}},
        jnp.asarray(x.transpose(0, 2, 1)),
    )  # (B, T, out)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5
    )
