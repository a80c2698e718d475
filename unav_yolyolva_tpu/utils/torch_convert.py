"""Reference-checkpoint converter: torch `.pth.tar` state dict <-> our
flax param pytree.

The reference saves `{epoch, state_dict, state_dict_ema, optimizer,
scheduler}` with `module.`-prefixed keys (nn.DataParallel wrapping,
`/root/reference/train.py:231-238`). This converter maps that key space onto
our channels-last flax tree so released reference checkpoints can be
evaluated here (and ours exported back).

Layout conversions:
  torch Linear (out, in)        -> Dense kernel (in, out)
  torch Conv1d (out, in/g, k)   -> Conv kernel (k, in/g, out)
  channel-LN (1, C, 1)          -> (C,)
  AffineDropPath scale (1,C,1)  -> (1, 1, C)

Dead reference parameters (never used by its forward) are skipped on import
and zero-filled on export: backbone.ori_cross_att_{Va,Av}.*,
backbone.cross_att_{Va,Av}.*, fusion_module.projections.*
(multimodal_backbones.py:715-749,537-540). Shared-instance quirks: the five
fusion downsample entries / two multiway entries hold identical tensors —
import reads index 0, export replicates.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

DEAD_PREFIXES = (
    "backbone.ori_cross_att_Va.",
    "backbone.ori_cross_att_Av.",
    "backbone.cross_att_Va.",
    "backbone.cross_att_Av.",
    "backbone.fusion_module.projections.",
)

# aliases of shared-instance parameters: identical tensors the reference
# state dict lists under several indices (import reads index 0)
ALIAS_PREFIXES = tuple(
    [f"alignment.multiway_list.{i}." for i in range(1, 8)]
    + [f"backbone.fusion_module.downsample_layers.{i}." for i in range(1, 8)]
)


def _lin(w):  # torch Linear weight -> Dense kernel
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):  # torch Conv1d weight -> flax Conv kernel
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def _conv1x1_dense(w):  # torch Conv1d k=1 -> Dense kernel
    return np.ascontiguousarray(np.asarray(w)[:, :, 0].T)


def _chan_ln(w):  # (1, C, 1) -> (C,)
    return np.asarray(w).reshape(-1)


def _adp(w):  # AffineDropPath (1, C, 1) -> (1, 1, C)
    return np.asarray(w).reshape(1, 1, -1)


def _ident(w):
    return np.asarray(w)


def _mhca_entries(t_prefix: str, f_path: Tuple[str, ...]):
    """Key map for one MaskedMHCA module."""
    out = []
    for conv in ("query_conv", "key_conv", "value_conv"):
        out.append((f"{t_prefix}.{conv}.conv.weight",
                    f_path + (conv, "conv", "kernel"), _conv))
    for norm in ("query_norm", "key_norm", "value_norm"):
        out.append((f"{t_prefix}.{norm}.weight",
                    f_path + (norm, "weight"), _chan_ln))
        out.append((f"{t_prefix}.{norm}.bias",
                    f_path + (norm, "bias"), _chan_ln))
    for proj in ("query", "key", "value", "proj"):
        out.append((f"{t_prefix}.{proj}.weight",
                    f_path + (proj, "kernel"), _conv1x1_dense))
        out.append((f"{t_prefix}.{proj}.bias",
                    f_path + (proj, "bias"), _ident))
    return out


def _transformer_block_entries(t_prefix: str, f_path: Tuple[str, ...],
                               with_droppath: bool = True):
    out = []
    for ln in ("ln11", "ln12", "ln2"):
        out.append((f"{t_prefix}.{ln}.weight", f_path + (ln, "weight"), _chan_ln))
        out.append((f"{t_prefix}.{ln}.bias", f_path + (ln, "bias"), _chan_ln))
    out += _mhca_entries(f"{t_prefix}.attn", f_path + ("attn",))
    out.append((f"{t_prefix}.mlp.0.weight", f_path + ("mlp_fc1", "kernel"),
                _conv1x1_dense))
    out.append((f"{t_prefix}.mlp.0.bias", f_path + ("mlp_fc1", "bias"), _ident))
    out.append((f"{t_prefix}.mlp.3.weight", f_path + ("mlp_fc2", "kernel"),
                _conv1x1_dense))
    out.append((f"{t_prefix}.mlp.3.bias", f_path + ("mlp_fc2", "bias"), _ident))
    if with_droppath:
        out.append((f"{t_prefix}.drop_path_attn.scale",
                    f_path + ("drop_path_attn", "scale"), _adp))
        out.append((f"{t_prefix}.drop_path_mlp.scale",
                    f_path + ("drop_path_mlp", "scale"), _adp))
    return out


def _alignment_mha_entries(t_prefix: str, f_path: Tuple[str, ...]):
    out = []
    for name in ("q", "k", "v", "m"):
        out.append((f"{t_prefix}.{name}.weight", f_path + (name, "kernel"), _lin))
        out.append((f"{t_prefix}.{name}.bias", f_path + (name, "bias"), _ident))
    return out


def _ln_entries(t_prefix: str, f_path: Tuple[str, ...]):
    """torch nn.LayerNorm -> flax LayerNorm (scale/bias)."""
    return [
        (f"{t_prefix}.weight", f_path + ("scale",), _ident),
        (f"{t_prefix}.bias", f_path + ("bias",), _ident),
    ]


def _csp_entries(t_prefix: str, f_path: Tuple[str, ...]):
    out = [
        (f"{t_prefix}.main_conv.conv.weight",
         f_path + ("main_conv", "conv", "kernel"), _conv),
        (f"{t_prefix}.main_conv.conv.bias",
         f_path + ("main_conv", "conv", "bias"), _ident),
        (f"{t_prefix}.final_conv.conv.weight",
         f_path + ("final_conv", "conv", "kernel"), _conv),
        (f"{t_prefix}.final_conv.conv.bias",
         f_path + ("final_conv", "conv", "bias"), _ident),
    ]
    for i in range(3):
        out += _mhca_entries(f"{t_prefix}.blocks.{i}", f_path + (f"block{i}",))
    ab, fb = f"{t_prefix}.attn_block", f_path + ("attn_block",)
    out += [
        (f"{ab}.guide_fc.weight", fb + ("guide_fc", "kernel"), _lin),
        (f"{ab}.guide_fc.bias", fb + ("guide_fc", "bias"), _ident),
        (f"{ab}.bias", fb + ("bias",), _ident),
        (f"{ab}.project_conv.conv.weight",
         fb + ("project_conv", "conv", "kernel"), _conv),
        (f"{ab}.project_conv.conv.bias",
         fb + ("project_conv", "conv", "bias"), _ident),
    ]
    return out


def build_key_map(arch=(2, 3, 5)) -> List:
    """List of (torch_key, flax_path, convert_fn) covering every live
    parameter."""
    entries: List = []
    A = ("alignment",)

    # alignment projections / embeddings
    entries += [
        ("alignment.proj_fc_video.0.weight", A + ("proj_fc_video", "kernel"), _lin),
        ("alignment.proj_fc_video.0.bias", A + ("proj_fc_video", "bias"), _ident),
        ("alignment.proj_fc_text.0.weight", A + ("proj_fc_text", "kernel"), _lin),
        ("alignment.proj_fc_text.0.bias", A + ("proj_fc_text", "bias"), _ident),
        ("alignment.pos_embed_video", A + ("pos_embed_video",), _ident),
        ("alignment.pos_embed_text", A + ("pos_embed_text",), _ident),
        ("alignment.type_video", A + ("type_video",), _ident),
        ("alignment.type_text", A + ("type_text",), _ident),
        ("alignment.cls_token_video", A + ("cls_token_video",), _ident),
        ("alignment.cls_token_text", A + ("cls_token_text",), _ident),
    ]
    # shared multiway block: import from index 0
    MW = A + ("multiway",)
    entries += _ln_entries("alignment.multiway_list.0.norm1_fused", MW + ("norm1_fused",))
    entries += _alignment_mha_entries("alignment.multiway_list.0.attn_fusion",
                                      MW + ("attn_fusion",))
    entries += _ln_entries("alignment.multiway_list.0.norm2_video", MW + ("norm2_video",))
    entries += _ln_entries("alignment.multiway_list.0.norm2_text", MW + ("norm2_text",))
    for mod in ("video", "text"):
        for fc in ("fc1", "fc2"):
            entries.append((f"alignment.multiway_list.0.ffn_{mod}.{fc}.weight",
                            MW + (f"ffn_{mod}", fc, "kernel"), _lin))
            entries.append((f"alignment.multiway_list.0.ffn_{mod}.{fc}.bias",
                            MW + (f"ffn_{mod}", fc, "bias"), _ident))
    entries += _ln_entries("alignment.norm_video", A + ("norm_video",))
    entries += _ln_entries("alignment.norm_text", A + ("norm_text",))
    for mod in ("video", "text"):
        entries += [
            (f"alignment.fc_{mod}.0.weight", A + (f"fc_{mod}_lin", "kernel"), _lin),
            (f"alignment.fc_{mod}.0.bias", A + (f"fc_{mod}_lin", "bias"), _ident),
        ]
        entries += _ln_entries(f"alignment.fc_{mod}.3", A + (f"fc_{mod}_norm",))
        entries += [
            (f"alignment.fc_{mod}_score.weight",
             A + (f"fc_{mod}_score", "kernel"), _conv1x1_dense),
            (f"alignment.fc_{mod}_score.bias",
             A + (f"fc_{mod}_score", "bias"), _ident),
            (f"alignment.fc_{mod}_cls.weight",
             A + (f"fc_{mod}_cls", "kernel"), _lin),
            (f"alignment.fc_{mod}_cls.bias",
             A + (f"fc_{mod}_cls", "bias"), _ident),
        ]

    # backbone
    B = ("backbone",)
    for i in range(arch[0]):
        for mod in ("V", "A"):
            entries.append((f"backbone.embd_{mod}.{i}.conv.weight",
                            B + (f"embd_{mod}_{i}", "conv", "kernel"), _conv))
            entries.append((f"backbone.embd_norm_{mod}.{i}.weight",
                            B + (f"embd_norm_{mod}_{i}", "weight"), _chan_ln))
            entries.append((f"backbone.embd_norm_{mod}.{i}.bias",
                            B + (f"embd_norm_{mod}_{i}", "bias"), _chan_ln))
    for i in range(arch[1] - 1):
        for mod in ("V", "A"):
            entries += _transformer_block_entries(
                f"backbone.self_att_{mod}.{i}",
                B + (f"self_att_{mod}_{i}",),
            )
    for i in range(arch[2]):
        entries.append((f"backbone.downsample_list.{i}.down_conv.conv.weight",
                        B + (f"downsample_{i}", "down_conv", "conv", "kernel"),
                        _conv))
        entries.append((f"backbone.downsample_list.{i}.down_norm.weight",
                        B + (f"downsample_{i}", "down_norm", "weight"), _chan_ln))
        entries.append((f"backbone.downsample_list.{i}.down_norm.bias",
                        B + (f"downsample_{i}", "down_norm", "bias"), _chan_ln))

    # fusion module (shared instance across both passes)
    F = B + ("fusion",)
    entries += _mhca_entries("backbone.fusion_module.text_enhancer",
                             F + ("text_enhancer",))
    # shared downsample: index 0 of the five identical entries
    entries += [
        ("backbone.fusion_module.downsample_layers.0.down_conv.conv.weight",
         F + ("downsample_shared", "down_conv", "conv", "kernel"), _conv),
        ("backbone.fusion_module.downsample_layers.0.down_conv.conv.bias",
         F + ("downsample_shared", "down_conv", "conv", "bias"), _ident),
        ("backbone.fusion_module.downsample_layers.0.down_norm.weight",
         F + ("downsample_shared", "down_norm", "weight"), _chan_ln),
        ("backbone.fusion_module.downsample_layers.0.down_norm.bias",
         F + ("downsample_shared", "down_norm", "bias"), _chan_ln),
    ]
    for i in range(arch[2]):
        entries += _csp_entries(f"backbone.fusion_module.top_down_layers.{i}",
                                F + (f"top_down_{i}",))
        entries += _csp_entries(f"backbone.fusion_module.bottom_up_layers.{i}",
                                F + (f"bottom_up_{i}",))
    entries += [
        ("backbone.fusion_module.match_projection.weight",
         F + ("match_projection_kernel",), _conv1x1_dense),
        ("backbone.fusion_module.match_projection.bias",
         F + ("match_projection_bias",), _ident),
    ]

    # heads
    for head, fhead in (("cls_head", ("cls_head",)), ("reg_head", ("reg_head",))):
        for i in range(2):
            entries.append((f"{head}.head.{i}.conv.weight",
                            fhead + ("tower", f"head_{i}", "conv", "kernel"),
                            _conv))
            entries.append((f"{head}.norm.{i}.weight",
                            fhead + ("tower", f"norm_{i}", "weight"), _chan_ln))
            entries.append((f"{head}.norm.{i}.bias",
                            fhead + ("tower", f"norm_{i}", "bias"), _chan_ln))
    entries += [
        ("cls_head.cls_head.conv.weight",
         ("cls_head", "cls_head", "conv", "kernel"), _conv),
        ("cls_head.cls_head.conv.bias",
         ("cls_head", "cls_head", "conv", "bias"), _ident),
        ("reg_head.offset_head.conv.weight",
         ("reg_head", "offset_head", "conv", "kernel"), _conv),
        ("reg_head.offset_head.conv.bias",
         ("reg_head", "offset_head", "conv", "bias"), _ident),
    ]
    for l in range(arch[2] + 1):
        entries.append((f"reg_head.scale.{l}.scale",
                        ("reg_head", f"scale_{l}", "scale"), _ident))

    # contrastive logit scales
    entries += [
        ("contrastive_losses.logit_scale_inter",
         ("contrastive", "logit_scale_inter"), _ident),
        ("contrastive_losses.NCE_video.logit_scale",
         ("contrastive", "nce_video_logit_scale"), _ident),
        ("contrastive_losses.NCE_text.logit_scale",
         ("contrastive", "nce_text_logit_scale"), _ident),
    ]
    return entries


def _set_path(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _get_path(tree: Dict, path: Tuple[str, ...]):
    node = tree
    for key in path:
        node = node[key]
    return node


def torch_state_dict_to_params(
    state_dict: Dict[str, "np.ndarray"],
    arch=(2, 3, 5),
    strict: bool = True,
) -> Dict:
    """Convert a reference state dict (tensors or arrays, with or without the
    `module.` prefix) into a flax params dict {'params': {...}}."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        sd[k] = arr

    tree: Dict = {}
    missing = []
    for t_key, f_path, fn in build_key_map(arch):
        if t_key not in sd:
            missing.append(t_key)
            continue
        _set_path(tree, f_path, fn(sd[t_key]))
    if strict and missing:
        raise KeyError(f"missing {len(missing)} reference keys, e.g. {missing[:5]}")

    used = {t for t, _, _ in build_key_map(arch)}
    unused = [
        k for k in sd
        if k not in used
        and not k.startswith(DEAD_PREFIXES)
        and not k.startswith(ALIAS_PREFIXES)
    ]
    if strict and unused:
        raise KeyError(f"{len(unused)} unmapped live keys, e.g. {unused[:5]}")
    return {"params": tree}


def params_to_torch_state_dict(params: Dict, arch=(2, 3, 5)) -> Dict:
    """Export our params to the reference key space (live keys only; shared
    instances replicated: multiway 0/1, fusion downsample 0..4)."""
    tree = params["params"] if "params" in params else params
    inv = {
        _lin: _lin,            # transpose is its own inverse
        _conv: lambda w: np.ascontiguousarray(np.transpose(w, (2, 1, 0))),
        _conv1x1_dense: lambda w: np.ascontiguousarray(w.T[..., None]),
        _chan_ln: lambda w: np.asarray(w).reshape(1, -1, 1),
        _adp: lambda w: np.asarray(w).reshape(1, -1, 1),
        _ident: _ident,
    }
    out = {}
    for t_key, f_path, fn in build_key_map(arch):
        val = np.asarray(_get_path(tree, f_path))
        out[t_key] = inv[fn](val)

    # replicate shared instances into their aliased key slots
    for i in range(1, 2):
        for k in list(out):
            if k.startswith("alignment.multiway_list.0."):
                out[k.replace(".0.", f".{i}.", 1)] = out[k]
    for i in range(1, arch[2]):
        for k in list(out):
            if k.startswith("backbone.fusion_module.downsample_layers.0."):
                out[k.replace("layers.0.", f"layers.{i}.")] = out[k]
    return out
