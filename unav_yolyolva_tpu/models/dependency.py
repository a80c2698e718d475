"""Optional event-dependency block (off by default: `use_dependency: False`).

Equivalent of Dependency_Block
(`/root/reference/libs/modeling/dependency_block.py:6-68`): expands fused
features to n_embd*num_classes channels, runs a temporal transformer over
(B*C, T, n_embd) and a co-occurrence transformer over (B*T, C, n_embd), sums
and squeezes back.

Note on the co-occurrence mask: the reference passes a flattened (B*T,) mask
whose shape mismatch routes MaskedConv1D into a scalar-broadcast branch
(blocks.py:56-57), i.e. each frame's entire class row is kept or zeroed as a
whole. We reproduce that effective behaviour with an explicit per-row mask.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import DEPENDENCY_BLOCKS
from .blocks import MaskedConv1D, TransformerBlock

Array = jnp.ndarray


@DEPENDENCY_BLOCKS.register("DependencyBlock")
class DependencyBlock(nn.Module):
    in_channel: int
    n_embd: int = 128
    n_embd_ks: int = 3
    num_classes: int = 100
    path_pdrop: float = 0.1
    n_head: int = 1

    @nn.compact
    def __call__(
        self, feats: List[Array], masks: List[Array], train: bool = False
    ) -> Tuple[List[Array], List[Array]]:
        expand = MaskedConv1D(
            self.n_embd * self.num_classes, self.n_embd_ks, use_bias=False,
            name="feature_expand",
        )
        squeeze = MaskedConv1D(
            self.in_channel, self.n_embd_ks, use_bias=False,
            name="feature_squeeze",
        )
        temporal = TransformerBlock(
            self.n_embd, self.n_head, n_hidden=self.n_embd,
            path_pdrop=self.path_pdrop, name="temporal_branch",
        )
        cooccur = TransformerBlock(
            self.n_embd, self.n_head, n_hidden=self.n_embd,
            path_pdrop=self.path_pdrop, name="cooccur_branch",
        )

        out_feats = []
        for feat, mask in zip(feats, masks):
            b, t, _ = feat.shape
            h, _ = expand(feat, mask)
            h = nn.relu(h)
            h = h.reshape(b, t, self.num_classes, self.n_embd)

            # temporal dependency: attention over T for each (sample, class).
            # Quirk parity: the reference flattens features b-major
            # (`view(-1, H, T)` => row k = b*C + c) but tiles the mask
            # c-major (`mask.repeat(C, 1, 1)` => row k = mask[k % B],
            # dependency_block.py:52-53) — with batch > 1 each (sample,
            # class) row gets the mask of sample (b*C + c) % B, cross-
            # talking masks between samples. Replicated with jnp.tile.
            tmp = jnp.transpose(h, (0, 2, 1, 3)).reshape(
                b * self.num_classes, t, self.n_embd
            )
            tmp_mask = jnp.tile(mask, (self.num_classes, 1))
            tmp_out, _ = temporal(tmp, tmp, tmp_mask, train=train)
            tmp_out = tmp_out.reshape(b, self.num_classes, t, self.n_embd)
            tmp_out = jnp.transpose(tmp_out, (0, 2, 1, 3))

            # co-occurrence dependency: attention over classes for each frame,
            # entire rows gated by frame validity
            coo = h.reshape(b * t, self.num_classes, self.n_embd)
            coo_mask = jnp.broadcast_to(
                mask.reshape(b * t, 1), (b * t, self.num_classes)
            )
            coo_out, _ = cooccur(coo, coo, coo_mask, train=train)
            coo_out = coo_out.reshape(b, t, self.num_classes, self.n_embd)

            merged = (tmp_out + coo_out).reshape(b, t, -1)
            merged, _ = squeeze(merged, mask)
            out_feats.append(merged)
        return out_feats, masks
