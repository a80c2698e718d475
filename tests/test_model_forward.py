"""Model-level tests on a tiny configuration: shapes, masking invariance,
gradient flow. Kept deliberately small — this host has one CPU core."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unav_yolyolva_tpu.models import LocPointTransformer
from unav_yolyolva_tpu.models.meta_arch import compute_losses
from unav_yolyolva_tpu.geometry import generate_points
from unav_yolyolva_tpu.geometry.points import concat_points
from unav_yolyolva_tpu.geometry.assign import (
    assign_labels_batch,
    frame_targets_batch,
)

T, NCLS, EMBD = 32, 8, 32
REG_RANGE = [(0, 4), (4, 8), (8, 16), (16, 32), (32, 64), (64, 10000)]


def tiny_model():
    return LocPointTransformer(
        raw_input_dim_V=24, raw_input_dim_A=12, input_dim_V=EMBD,
        input_dim_A=EMBD, num_classes=NCLS, max_seq_len=T,
        backbone_arch=(2, 3, 5), n_head=4, embd_dim=EMBD, head_dim=EMBD,
        use_abs_pe=True, class_aware=True, droppath=0.1,
    )


def make_batch(rng, b=2, lens=(32, 20)):
    visual = rng.normal(size=(b, T, 24)).astype(np.float32)
    audio = rng.normal(size=(b, T, 12)).astype(np.float32)
    mask = np.arange(T)[None, :] < np.asarray(lens)[:, None]
    segs = np.tile(
        np.float32([[3.0, 14.0], [1.0, 30.0], [6.0, 10.0]]), (b, 1, 1)
    )
    labels = np.tile(np.int32([2, 5, 7]), (b, 1))
    valid = np.ones((b, 3), bool)
    scores, start_end, m_labels = frame_targets_batch(
        jnp.asarray(segs), jnp.asarray(labels), jnp.asarray(valid), T, NCLS
    )
    return {
        "visual": jnp.asarray(visual),
        "audio": jnp.asarray(audio),
        "mask": jnp.asarray(mask),
        "m_scores": scores,
        "m_start_end": start_end,
        "m_labels": m_labels,
    }, (jnp.asarray(segs), jnp.asarray(labels), jnp.asarray(valid))


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    rng = np.random.default_rng(0)
    batch, _ = make_batch(rng)
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda k, b: model.init({"params": k, "droppath": k}, b, train=False)
    )(key, batch)
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(1)
    batch, _ = make_batch(rng)
    out = jax.jit(lambda p, b: model.apply(p, b, train=False))(params, batch)
    sizes = [T // 2 ** i for i in range(6)]
    assert [x.shape for x in out["cls_logits"]] == [
        (2, s, NCLS) for s in sizes
    ]
    assert [x.shape for x in out["offsets"]] == [
        (2, s, NCLS, 2) for s in sizes
    ]
    # offsets are non-negative (ReLU after scale)
    for x in out["offsets"]:
        assert float(jnp.min(x)) >= 0.0


def test_masked_outputs_zeroed_and_deterministic(model_and_params):
    """Full padding *value* invariance does not hold for this architecture
    (reference included): conv receptive fields and the fusion guide
    projection mix padded positions in. What the reference relies on instead
    — and what we check — is (a) outputs at padded positions are exactly
    zeroed by the masked convs, and (b) the forward is deterministic for
    zero-padded inputs."""
    model, params = model_and_params
    rng = np.random.default_rng(2)
    batch, _ = make_batch(rng, lens=(20, 32))
    # zero the padded region like the real collate does
    vis = np.array(batch["visual"])
    vis[0, 20:] = 0.0
    aud = np.array(batch["audio"])
    aud[0, 20:] = 0.0
    batch["visual"], batch["audio"] = jnp.asarray(vis), jnp.asarray(aud)

    apply = jax.jit(lambda p, b: model.apply(p, b, train=False))
    out1 = apply(params, batch)
    out2 = apply(params, batch)
    for lvl in range(6):
        m = np.asarray(out1["masks"][lvl])
        logits = np.asarray(out1["cls_logits"][lvl])
        # (a) padded positions exactly zero
        np.testing.assert_array_equal(logits[~m], 0.0)
        # (b) deterministic
        np.testing.assert_array_equal(
            logits, np.asarray(out2["cls_logits"][lvl])
        )


def test_mhca_padding_invariance():
    """MaskedMHCA must be exactly invariant to garbage in padded kv
    positions — attention is hard-masked."""
    from unav_yolyolva_tpu.models.blocks import MaskedMHCA

    mod = MaskedMHCA(n_embd=16, n_head=4)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 16, 16)).astype(np.float32)
    mask = np.arange(16)[None, :] < 10
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x),
                      jnp.asarray(mask))
    out1, _ = mod.apply(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(mask))
    x2 = x.copy()
    x2[0, 12:] += 99.0  # garbage beyond the depthwise conv's reach (k=3)
    out2, _ = mod.apply(params, jnp.asarray(x2), jnp.asarray(x2), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out1)[0, :9], np.asarray(out2)[0, :9], rtol=1e-5, atol=1e-6
    )


def test_losses_and_grads(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(3)
    batch, (segs, labels, valid) = make_batch(rng)
    points = concat_points(generate_points(T, REG_RANGE, 2))
    gt_cls, gt_reg = assign_labels_batch(
        jnp.asarray(points), segs, labels, valid, NCLS, True
    )

    def loss_fn(p):
        out = model.apply(
            p, batch, train=True, rngs={"droppath": jax.random.PRNGKey(7)}
        )
        losses, new_norm = compute_losses(
            out, gt_cls, gt_reg, jnp.float32(250.0),
            class_aware=True, loss_weight=1.0,
        )
        return losses["final_loss"] * 6.0, (losses, new_norm)

    (loss, (losses, new_norm)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params)
    assert np.isfinite(float(loss))
    assert float(losses["num_pos"]) > 0
    # normalizer EMA moved toward num_pos
    assert float(new_norm) < 250.0
    # gradients flow to alignment, backbone, heads, contrastive scales
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    nonzero_roots = set()
    for path, g in flat:
        if np.any(np.abs(np.asarray(g)) > 0):
            nonzero_roots.add(path[0].key if hasattr(path[0], "key") else None)
    roots = {p[1].key for p, _ in flat}
    got = {p[1].key for p, g in flat if np.any(np.abs(np.asarray(g)) > 0)}
    for root in ["alignment", "backbone", "cls_head", "reg_head"]:
        assert root in got, f"no gradient reached {root}: have {got}"
