"""Edge-conditioned graph transformer (TEAT-GT regularizer encoder).

Equivalent of the ``graph_transformer_pytorch.GraphTransformer`` used for
the temporal-consistency regularizer (lib/teatgt.py:65-81): depth-4
attention where each key/value is augmented by a projected edge feature,
gated residuals, feed-forward blocks. Written batched over graphs (the
reference loops frames in Python, :291-323). The pip package's rotary
relative position embedding is replaced by a learned additive position
embedding — only the regularizer's training signal flows through here.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vidsgg.models.attention import masked_softmax


class GatedResidual(nn.Module):
    @nn.compact
    def __call__(self, x, res):
        gate_in = jnp.concatenate([x, res, x - res], axis=-1)
        gate = nn.sigmoid(nn.Dense(1, use_bias=False)(gate_in))
        return x * gate + res * (1.0 - gate)


class EdgeAttention(nn.Module):
    """nodes [B, N, D], edges [B, N, N, De], mask [B, N] -> [B, N, D]."""

    dim: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, nodes, edges, mask):
        b, n, _ = nodes.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh
        q = nn.Dense(inner, name="to_q")(nodes).reshape(b, n, h, dh)
        k = nn.Dense(inner, name="to_k")(nodes).reshape(b, n, h, dh)
        v = nn.Dense(inner, name="to_v")(nodes).reshape(b, n, h, dh)
        e = nn.Dense(inner, name="edges_to_kv")(edges).reshape(b, n, n, h, dh)
        k_ij = k[:, None, :, :, :] + e  # [B, N(q), N(k), H, dh]
        v_ij = v[:, None, :, :, :] + e
        logits = jnp.einsum("bihd,bijhd->bhij", q, k_ij) / jnp.sqrt(dh)
        allowed = (mask[:, None, :] & mask[:, :, None])[:, None]
        w = masked_softmax(logits, allowed)
        out = jnp.einsum("bhij,bijhd->bihd", w, v_ij).reshape(b, n, inner)
        return nn.Dense(self.dim, name="to_out")(out)


class GraphTransformer(nn.Module):
    dim: int
    depth: int = 4
    heads: int = 8
    dim_head: int = 64
    max_nodes: int = 64
    with_feedforward: bool = True

    @nn.compact
    def __call__(self, nodes, edges, mask):
        n = nodes.shape[1]
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02), (self.max_nodes, self.dim)
        )
        x = nodes + pos[None, :n]
        for i in range(self.depth):
            att = EdgeAttention(
                self.dim, self.heads, self.dim_head, name=f"attn_{i}"
            )(x, edges, mask)
            x = GatedResidual(name=f"attn_res_{i}")(att, x)
            if self.with_feedforward:
                ff = nn.Dense(self.dim, name=f"ff_out_{i}")(
                    nn.gelu(nn.Dense(self.dim * 4, name=f"ff_in_{i}")(x))
                )
                x = GatedResidual(name=f"ff_res_{i}")(ff, x)
        return x * mask[..., None]


class GlobalAttentionPooling(nn.Module):
    """dgl GlobalAttentionPooling (lib/teatgt.py:83-94): gate linear ->
    masked softmax over nodes -> weighted sum. x [B, N, D], mask [B, N]."""

    @nn.compact
    def __call__(self, x, mask):
        gate = nn.Dense(1, name="gate_nn")(x)[..., 0]
        w = masked_softmax(gate, mask)
        return jnp.einsum("bn,bnd->bd", w, x)
