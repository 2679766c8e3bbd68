"""STTran — spatial encoder + window-2 temporal decoder + memory fusion.

TPU-native re-design of the reference ``transformer``
(tools/utils/transformer.py). The reference builds ragged per-frame buckets
and per-window tensors in Python loops (:190-192, :209-215) and stitches the
results back (:226-241); here the same computation is expressed as masked
dense attention over padded token axes, so the whole module is one jit
region of MXU matmuls:

* Spatial encoder (:182-196): self-attention over the flat pair-token axis
  restricted to same-frame keys — mathematically identical to the per-frame
  bucket attention.
* Temporal decoder (:203-220): the reference *duplicates* each pair token
  into its two sliding windows (as the former token of window f and the
  latter token of window f-1) and the 3 decoder layers evolve the copies
  independently. We materialize exactly those two copies as a [2P] token
  axis with a same-window attention mask and a fixed 2-slot learned position
  embedding added to q/k only (:51-52), then select per token the copy the
  reference's 'latter'/'both' merge would take (:226-241).
* Memory hallucination ('late' fusion, :248-251 / :143-169): single-head
  bias-free attention of pair features over the per-predicate-class memory
  bank, gated by a manual lambda or a learned sigmoid gate. (The reference's
  'early' option is dead code in transformer.forward and is not carried.)

Returns (global_output, rel_features, mem_features) with the same meaning as
the reference's first three return values (consumed at lib/tempura.py:566-577).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vidsgg.models.attention import MultiheadAttention


class EncoderLayer(nn.Module):
    """Post-norm encoder layer (transformer.py:5-30)."""

    embed_dim: int
    nhead: int
    dim_feedforward: int
    dropout: float

    @nn.compact
    def __call__(self, src, attn_mask, deterministic=True):
        src2 = MultiheadAttention(self.embed_dim, self.nhead, self.dropout)(
            src, src, src, attn_mask, deterministic
        )
        src = nn.LayerNorm(epsilon=1e-5)(src + nn.Dropout(self.dropout)(src2, deterministic=deterministic))
        h = nn.relu(nn.Dense(self.dim_feedforward)(src))
        src2 = nn.Dense(self.embed_dim)(nn.Dropout(self.dropout)(h, deterministic=deterministic))
        return nn.LayerNorm(epsilon=1e-5)(src + nn.Dropout(self.dropout)(src2, deterministic=deterministic))


class DecoderLayer(nn.Module):
    """Window decoder layer: q=k=x+pos, v=x; norm after attention only
    (transformer.py:33-58)."""

    embed_dim: int
    nhead: int
    dim_feedforward: int
    dropout: float

    @nn.compact
    def __call__(self, x, pos, attn_mask, deterministic=True):
        qk = x + pos
        t2 = MultiheadAttention(self.embed_dim, self.nhead, self.dropout)(
            qk, qk, x, attn_mask, deterministic
        )
        t = nn.LayerNorm(epsilon=1e-5)(x + nn.Dropout(self.dropout)(t2, deterministic=deterministic))
        h = nn.relu(nn.Dense(self.dim_feedforward)(t))
        t2 = nn.Dense(self.embed_dim)(nn.Dropout(self.dropout)(h, deterministic=deterministic))
        return t + nn.Dropout(self.dropout)(t2, deterministic=deterministic)


class MemoryHallucinator(nn.Module):
    """Gated attention over the relation memory bank
    (transformer.py:143-175). ``memory`` layout for 'joint' is the
    concatenated [attention; contacting; spatial] bank (dict-iteration order
    of the reference's ModuleDict at :156)."""

    embed_dim: int
    mem_compute: str  # 'joint' | 'seperate'
    selection: str    # 'manual' | 'automated'
    selection_lambda: float = 0.5

    @nn.compact
    def __call__(self, feat, memory, mem_active):
        if self.selection == "manual":
            e = self.selection_lambda
        else:
            e = nn.sigmoid(nn.Dense(1, name="selector")(feat))

        def att(name, mem):
            return MultiheadAttention(
                self.embed_dim, 1, 0.0, use_bias=False, out_bias=False, name=name
            )(feat, mem, mem)

        if self.mem_compute == "seperate":
            outs = [
                att(f"mem_attention_{rel}", memory[rel])
                for rel in ("attention", "contacting", "spatial")
            ]
            mem_features = sum(outs) / 3.0
        else:
            mem_features = att("mem_attention", memory)

        out = e * feat + (1.0 - e) * mem_features
        return jnp.where(mem_active, out, feat)


class STTran(nn.Module):
    """Spatial-temporal transformer over padded pair tokens."""

    embed_dim: int = 1936
    nhead: int = 8
    enc_layers: int = 1
    dec_layers: int = 3
    dim_feedforward: int = 2048
    dropout: float = 0.1
    mode: str = "latter"  # 'latter' | 'both'
    mem_compute: str | None = "joint"
    selection: str = "manual"
    selection_lambda: float = 0.5
    mem_fusion: str = "late"

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,   # [P, D]
        im_idx: jnp.ndarray,     # [P] frame index per pair
        pair_mask: jnp.ndarray,  # [P] bool
        num_frames: jnp.ndarray, # [] int
        memory=None,             # [M, D] (joint) or dict of banks (seperate)
        mem_active=False,        # [] bool — False => pass-through
        deterministic: bool = True,
    ):
        p = features.shape[0]
        f = im_idx

        # ---- spatial encoder: same-frame masked attention ----
        same_frame = (
            (f[:, None] == f[None, :]) & pair_mask[:, None] & pair_mask[None, :]
        )
        x = features
        for i in range(self.enc_layers):
            x = EncoderLayer(
                self.embed_dim, self.nhead, self.dim_feedforward, self.dropout,
                name=f"enc_{i}",
            )(x, same_frame, deterministic)
        local_output = x * pair_mask[:, None]

        # ---- temporal decoder: explicit window duplication ----
        # copy 0 = former role (window f, pos slot 0); copy 1 = latter role
        # (window f-1, pos slot 1)
        window = jnp.concatenate([f, f - 1])                       # [2P]
        valid = jnp.concatenate(
            [pair_mask & (f <= num_frames - 2), pair_mask & (f >= 1)]
        )
        pos_table = self.param(
            "position_embedding", nn.initializers.uniform(scale=1.0),
            (2, self.embed_dim),
        )
        pos = jnp.concatenate(
            [jnp.broadcast_to(pos_table[0], (p, self.embed_dim)),
             jnp.broadcast_to(pos_table[1], (p, self.embed_dim))]
        )
        win_mask = (
            (window[:, None] == window[None, :]) & valid[:, None] & valid[None, :]
        )
        y = jnp.concatenate([local_output, local_output], axis=0)
        for i in range(self.dec_layers):
            y = DecoderLayer(
                self.embed_dim, self.nhead, self.dim_feedforward, self.dropout,
                name=f"dec_{i}",
            )(y, pos, win_mask, deterministic)

        former_out, latter_out = y[:p], y[p:]
        if self.mode == "both":
            mid = 0.5 * (former_out + latter_out)
            out = jnp.where(
                (f == 0)[:, None],
                former_out,
                jnp.where((f == num_frames - 1)[:, None], latter_out, mid),
            )
        else:  # 'latter'
            out = jnp.where((f >= 1)[:, None], latter_out, former_out)
        out = out * pair_mask[:, None]

        # ---- memory fusion (late) ----
        if self.mem_compute and self.mem_fusion == "late":
            rel_features = out
            out = MemoryHallucinator(
                self.embed_dim, self.mem_compute, self.selection,
                self.selection_lambda, name="memory",
            )(out, memory, mem_active)
            out = out * pair_mask[:, None]
            mem_features = out
        else:
            rel_features = local_output
            mem_features = local_output

        return out, rel_features, mem_features
