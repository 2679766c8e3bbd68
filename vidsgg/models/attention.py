"""Masked multi-head attention.

One attention primitive serves every attention site in the framework (STTran
spatial encoder / temporal decoder, OSPU tracking encoder, memory
hallucinator, TokenGT layers). Semantics follow torch.nn.MultiheadAttention
(in-proj QKV, scaled dot-product, softmax over allowed keys, dropout on
attention weights, out-proj) so parity with the reference's modules holds,
but masking is expressed as an additive bias over a dense [Tq, Tk] score
matrix — the TPU-native replacement for the reference's ragged per-frame
bucketing loops (tools/utils/transformer.py:190-215).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_NEG_INF = -1e9


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """Softmax over the last axis restricted to mask==True keys.

    Rows with no allowed key return all-zero weights (the reference instead
    produces NaNs for fully-masked rows, which never reach the output because
    those query rows are themselves padding)."""
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG_INF)
    m = scores.max(axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    if mask is not None:
        e = jnp.where(mask, e, 0.0)
    denom = e.sum(axis=-1, keepdims=True)
    return e / jnp.maximum(denom, 1e-30)


class MultiheadAttention(nn.Module):
    """q/k/v: [..., T, D]; attn_mask: broadcastable to [..., H, Tq, Tk]."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    use_bias: bool = True
    out_bias: bool = True

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None, deterministic: bool = True):
        d = self.embed_dim
        h = self.num_heads
        hd = d // h
        assert hd * h == d, "embed_dim must be divisible by num_heads"

        wq = nn.Dense(d, use_bias=self.use_bias, name="q_proj")(q)
        wk = nn.Dense(d, use_bias=self.use_bias, name="k_proj")(k)
        wv = nn.Dense(d, use_bias=self.use_bias, name="v_proj")(v)

        def split(x):
            return x.reshape(x.shape[:-1] + (h, hd)).swapaxes(-3, -2)  # [..., H, T, hd]

        qh, kh, vh = split(wq), split(wk), split(wv)
        scores = jnp.einsum("...qd,...kd->...qk", qh, kh) / jnp.sqrt(hd).astype(qh.dtype)
        if attn_mask is not None and attn_mask.ndim == scores.ndim - 1:
            attn_mask = attn_mask[..., None, :, :]
        w = masked_softmax(scores, attn_mask)
        w = nn.Dropout(self.dropout)(w, deterministic=deterministic)
        out = jnp.einsum("...qk,...kd->...qd", w, vh)
        out = out.swapaxes(-3, -2).reshape(q.shape[:-1] + (d,))
        return nn.Dense(d, use_bias=self.out_bias, name="out_proj")(out)
