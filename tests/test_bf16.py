"""bfloat16 compute policy: same predictions/losses as float32 within
bf16 tolerance, params/losses still float32.

The policy (models/meta_arch.py `compute_dtype`) casts matmul/conv inputs to
bf16 (MXU double-rate on TPU) while LayerNorm statistics, softmax
accumulation, head logits, and all losses stay float32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unav_yolyolva_tpu.core.config import load_config_dict
from unav_yolyolva_tpu.models import build_model

T, NCLS = 32, 4


def _cfg(dtype: str):
    return load_config_dict({
        "dataset": {"max_seq_len": T, "num_classes": NCLS,
                    "max_num_events": 4},
        "loader": {"batch_size": 2},
        "model": {
            "raw_input_dim_V": 16, "raw_input_dim_A": 8,
            "input_dim_V": 16, "input_dim_A": 16, "embd_dim": 16,
            "head_dim": 16, "n_head": 4, "use_abs_pe": True,
            "class_aware": True,
        },
        "train_cfg": {"loss_weight": 1, "droppath": 0.0},
        "tpu": {"compute_dtype": dtype},
    })


@pytest.fixture(scope="module")
def outputs_both():
    rng = np.random.default_rng(0)
    b = 2
    inputs = {
        "visual": jnp.asarray(rng.normal(size=(b, T, 16)), jnp.float32),
        "audio": jnp.asarray(rng.normal(size=(b, T, 8)), jnp.float32),
        "mask": jnp.ones((b, T), bool),
        "m_scores": jnp.zeros((b, T)),
        "m_start_end": jnp.zeros((b, T)).at[:, 4:10].set(1.0),
        "m_labels": jnp.zeros((b, T, NCLS)).at[:, 4:10, 1].set(1.0),
    }
    key = jax.random.PRNGKey(0)

    out = {}
    params = None
    for dtype in ("float32", "bfloat16"):
        model = build_model(_cfg(dtype))
        if params is None:
            params = jax.jit(
                lambda k, d: model.init(
                    {"params": k, "droppath": k}, d, train=False
                )
            )(key, inputs)
        out[dtype] = jax.jit(
            lambda p, d, m=model: m.apply(p, d, train=False)
        )(params, inputs)
    return out


def test_param_dtype_unchanged(outputs_both):
    # compute_dtype must not change the parameter tree (fp32 master weights)
    model = build_model(_cfg("bfloat16"))
    b = 1
    inputs = {
        "visual": jnp.zeros((b, T, 16)), "audio": jnp.zeros((b, T, 8)),
        "mask": jnp.ones((b, T), bool), "m_scores": jnp.zeros((b, T)),
        "m_start_end": jnp.zeros((b, T)), "m_labels": jnp.zeros((b, T, NCLS)),
    }
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "droppath": jax.random.PRNGKey(0)}, inputs, train=False
        )
    )
    for leaf in jax.tree.leaves(shapes):
        assert leaf.dtype == jnp.float32


def test_outputs_float32_and_close(outputs_both):
    f32, bf16 = outputs_both["float32"], outputs_both["bfloat16"]
    for lvl, (a, b) in enumerate(zip(f32["cls_logits"], bf16["cls_logits"])):
        assert b.dtype == jnp.float32
        # atol tracks bf16 rounding on random-init logits (|x| ~ 4-5);
        # the torch-faithful trunc_normal init (abs-bounded, std 0.02)
        # produced a draw at 0.168 where the old +-2sigma init sat at 0.14
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=0.2,
            err_msg=f"cls level {lvl}",
        )
    for lvl, (a, b) in enumerate(zip(f32["offsets"], bf16["offsets"])):
        assert b.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=0.2,
            err_msg=f"offsets level {lvl}",
        )


def test_losses_close(outputs_both):
    f32, bf16 = outputs_both["float32"], outputs_both["bfloat16"]
    for k in ("inter_loss", "intra_loss", "score_loss_video",
              "score_loss_text"):
        a, b = float(f32[k]), float(bf16[k])
        assert np.isfinite(b), k
        np.testing.assert_allclose(b, a, rtol=0.1, atol=0.05, err_msg=k)
