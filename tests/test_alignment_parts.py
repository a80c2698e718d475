"""Unit tests for Alignment internals: fused mask, dilation, candidate
selection — all against independent oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.ndimage

from unav_yolyolva_tpu.models.alignment import (
    binary_dilate,
    fused_attention_mask,
    select_contrastive_candidates,
)
from unav_yolyolva_tpu.ops.masked import adaptive_avg_pool1d


def test_fused_attention_mask_oracle():
    B, T = 2, 6
    mv = np.ones((B, T + 1), bool)
    mv[1, 4:] = False
    mt = np.ones((B, T + 1), bool)
    mt[1, 5:] = False
    out = np.asarray(fused_attention_mask(jnp.asarray(mv), jnp.asarray(mt)))

    # oracle: loop construction as in the reference (backbones.py:1173-1183)
    Nv = Nt = T + 1
    ref = np.zeros((B, Nv + Nt, Nv + Nt), np.int32)
    for i in range(B):
        ref[i, :Nv, :Nv] = np.broadcast_to(mv[i].astype(np.int32), (Nv, Nv))
        ref[i, Nv:, Nv:] = np.broadcast_to(mt[i].astype(np.int32), (Nt, Nt))
        v2t = np.zeros((Nv - 1, Nt - 1), np.int32)
        for j in range(Nt - 1):
            lo, hi = j, min(j + 1, Nv - 1)
            v2t[lo:hi, j] = 1
        ref[i, 1:Nv, Nv + 1:] = v2t
        ref[i, Nv + 1:, 1:Nv] = v2t.T
    np.testing.assert_array_equal(out, ref)


def test_binary_dilate_matches_scipy(rng):
    x = (rng.uniform(size=(3, 40)) > 0.85).astype(np.float32)
    ours = np.asarray(binary_dilate(jnp.asarray(x), iterations=4))
    for i in range(3):
        ref = scipy.ndimage.binary_dilation(x[i], iterations=4)
        np.testing.assert_array_equal(ours[i], ref)


def test_adaptive_avg_pool_matches_torch(rng):
    import torch

    x = rng.normal(size=(2, 24, 5)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool1d(jnp.asarray(x), 4))
    # torch pools (B, C, T)
    ref = torch.nn.functional.adaptive_avg_pool1d(
        torch.from_numpy(x.transpose(0, 2, 1)), 4
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def oracle_select(score, embedding, mask, key_ind, cls_prd, cls_gt):
    """Python re-derivation of select_contrastive_embedding semantics."""
    B, T, C = embedding.shape
    out = []
    for i in range(B):
        length = int(mask[i, 1:].sum())
        k_budget = max(1.0, length / 8.0)
        key_idx = np.where(key_ind[i] > 0.5)[0]
        key_mean = embedding[i, key_idx].mean(0) if len(key_idx) else np.zeros(C)
        key_label = cls_gt[i, key_idx[0]] if len(key_idx) else cls_gt[i, 0]
        expand = scipy.ndimage.binary_dilation(key_ind[i] > 0.5, iterations=4)
        order = np.argsort(-score[i, :length], kind="stable")
        nonkey = []
        for j in order:
            if expand[j]:
                continue
            if cls_prd[i, j] != key_label:
                continue
            nonkey.append(j)
            if len(nonkey) >= k_budget:
                break
        out.append((key_mean, [int(j) for j in nonkey]))
    return out


def test_select_candidates_matches_oracle(rng):
    B, T, C = 2, 32, 4
    ncls = 3
    score = rng.normal(size=(B, T)).astype(np.float32)
    emb = rng.normal(size=(B, T, C)).astype(np.float32)
    mask = np.ones((B, T), bool)
    mask[1, 25:] = False
    key = np.zeros((B, T), np.float32)
    key[0, 2:5] = 1
    key[1, 10:12] = 1
    cls_gt = np.full((B, T), 2)
    cls_prd = rng.integers(0, ncls, size=(B, T))
    cls_prd[:, ::2] = 2  # make plenty of eligible candidates

    k_max = -(-(T - 1) // 8)
    sel = select_contrastive_candidates(
        jnp.asarray(score), jnp.asarray(emb), jnp.asarray(mask),
        jnp.asarray(key), jnp.asarray(cls_prd), jnp.asarray(cls_gt), k_max,
    )
    oracle = oracle_select(score, emb, mask, key, cls_prd, cls_gt)

    for i in range(B):
        key_mean_o, nonkey_o = oracle[i]
        np.testing.assert_allclose(
            np.asarray(sel["key_mean"])[i], key_mean_o, rtol=1e-5, atol=1e-6
        )
        valid = np.asarray(sel["nonkey_valid"])[i]
        got = np.asarray(sel["nonkey"])[i][valid]
        want = emb[i, nonkey_o]
        # selection is by score rank; sets of rows must match in order
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nce_zero_with_no_negatives():
    """With no eligible negatives the intra NCE must be exactly 0 (reference:
    logits reduce to the positive column only)."""
    from unav_yolyolva_tpu.models.meta_arch import ContrastiveLosses

    B, C, K = 2, 8, 3
    aux = {
        "cls_video": jnp.ones((B, C)),
        "cls_text": jnp.ones((B, C)),
        "key_video": jnp.ones((B, C)),
        "key_text": jnp.ones((B, C)),
        "key_any": jnp.ones((B,), bool),
        "nonkey_video": jnp.zeros((B, K, C)),
        "nonkey_video_valid": jnp.zeros((B, K), bool),
        "nonkey_text": jnp.zeros((B, K, C)),
        "nonkey_text_valid": jnp.zeros((B, K), bool),
    }
    mod = ContrastiveLosses()
    params = mod.init(jax.random.PRNGKey(0), aux)
    inter, intra = mod.apply(params, aux)
    assert float(intra) == 0.0
    # identical CLS embeddings -> uniform logits -> inter = 2B*log(B)/2
    np.testing.assert_allclose(float(inter), B * np.log(B), rtol=1e-5)

    # regression: gradients through zero-vector (masked) embeddings must be
    # finite — sqrt(0) in l2norm used to poison the backward pass
    float_keys = ("key_video", "key_text", "nonkey_video", "nonkey_text",
                  "cls_video", "cls_text")

    def total(floats):
        aux_in = dict(aux, **floats)
        i1, i2 = mod.apply(params, aux_in)
        return i1 + i2

    grads = jax.grad(total)({k: aux[k] for k in float_keys})
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_contrastive_padded_rows_do_not_leak(rng):
    """A zero-padded eval row (row_valid False) must leave inter and intra
    EXACTLY equal to the unpadded batch's values: without masking, the pad
    row's CLS embedding adds a junk diagonal term and sits in every real
    row's CLIP softmax denominator, and the intra mean is diluted by the
    padded batch size (train/loop.py pads the final partial eval batch)."""
    from unav_yolyolva_tpu.models.meta_arch import ContrastiveLosses

    B, C, K = 3, 8, 2

    def make_aux(b, valid):
        r = np.random.default_rng(7)
        return {
            "cls_video": jnp.asarray(r.normal(size=(b, C)), jnp.float32),
            "cls_text": jnp.asarray(r.normal(size=(b, C)), jnp.float32),
            "key_video": jnp.asarray(r.normal(size=(b, C)), jnp.float32),
            "key_text": jnp.asarray(r.normal(size=(b, C)), jnp.float32),
            "key_any": jnp.asarray(valid),
            "nonkey_video": jnp.asarray(r.normal(size=(b, K, C)), jnp.float32),
            "nonkey_video_valid": jnp.tile(jnp.asarray(valid)[:, None], (1, K)),
            "nonkey_text": jnp.asarray(r.normal(size=(b, K, C)), jnp.float32),
            "nonkey_text_valid": jnp.tile(jnp.asarray(valid)[:, None], (1, K)),
            "row_valid": jnp.asarray(valid),
        }

    mod = ContrastiveLosses()
    # full batch of B real rows (same seed -> the first B rows of the
    # padded aux share the real rows' random values)
    aux_real = make_aux(B + 1, np.asarray([True] * (B + 1)))
    aux_ref = {
        k: (v[:B] if getattr(v, "ndim", 0) >= 1 else v)
        for k, v in aux_real.items()
    }
    params = mod.init(jax.random.PRNGKey(0), aux_ref)
    inter_ref, intra_ref = mod.apply(params, aux_ref)

    aux_pad = dict(aux_real)
    aux_pad["row_valid"] = jnp.asarray([True] * B + [False])
    aux_pad["key_any"] = jnp.asarray([True] * B + [False])
    inter_pad, intra_pad = mod.apply(params, aux_pad)

    np.testing.assert_allclose(float(inter_pad), float(inter_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(intra_pad), float(intra_ref),
                               rtol=1e-6, atol=1e-6)

    # gradients through the padded batch stay finite (the -inf masking
    # must not leak NaNs through log_softmax's backward)
    def total(floats):
        aux_in = dict(aux_pad, **floats)
        i1, i2 = mod.apply(params, aux_in)
        return i1 + i2

    float_keys = ("cls_video", "cls_text", "key_video", "key_text",
                  "nonkey_video", "nonkey_text")
    grads = jax.grad(total)({k: aux_pad[k] for k in float_keys})
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_nce_value_with_negatives(rng):
    from unav_yolyolva_tpu.models.meta_arch import ContrastiveLosses, LOGIT_SCALE_INIT

    B, C, K = 1, 4, 2
    q = rng.normal(size=(B, C)).astype(np.float32)
    k = rng.normal(size=(B, C)).astype(np.float32)
    neg = rng.normal(size=(B, K, C)).astype(np.float32)
    aux = {
        "cls_video": jnp.asarray(q), "cls_text": jnp.asarray(k),
        "key_video": jnp.asarray(q), "key_text": jnp.asarray(k),
        "key_any": jnp.ones((B,), bool),
        "nonkey_video": jnp.asarray(neg),
        "nonkey_video_valid": jnp.ones((B, K), bool),
        "nonkey_text": jnp.asarray(neg),
        "nonkey_text_valid": jnp.ones((B, K), bool),
    }
    mod = ContrastiveLosses()
    params = mod.init(jax.random.PRNGKey(0), aux)
    _, intra = mod.apply(params, aux)

    def l2(v):
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    def nce(qq, kk, nn):
        logits = np.concatenate(
            [[np.sum(l2(qq) * l2(kk))], l2(nn) @ l2(qq)]
        ) * LOGIT_SCALE_INIT  # raw scale, not exponentiated (reference quirk)
        return np.log(np.exp(logits).sum()) - logits[0]

    want = (nce(q[0], k[0], neg[0]) + nce(k[0], q[0], neg[0])) / 2 / B
    np.testing.assert_allclose(float(intra), want, rtol=1e-4)
