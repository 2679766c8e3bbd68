"""TokenGT — tokenized graph transformer over per-clip scene graphs.

Flax re-design of tools/TokenGT (tokenizer.py, tokengt_graph_encoder*.py,
models/tokengt.py), stripped of its fairseq scaffolding. The encoder is
written *batched over clips* — the reference runs one clip at a time in a
Python loop (lib/teatgt.py:181-282); here all clips of a video go through as
one [B, T, D] batch of MXU matmuls. (The reference's pooled ``hidden_state``
carried between clips is never consumed by its TokenGT — dead code — which
is what makes clips independent; see teatgt.py.)

Faithfully reproduced semantics (with reference quirks kept, since they are
part of the trained function):

* node token = atom_encoder(1168->768) + temporal PE ``Embedding(100, 768,
  padding_idx=0)`` of the clip-rebased frame index — padding_idx means the
  clip's FIRST frame gets a zero temporal embedding (tokenizer.py:44,242-246);
* edge token = ``edge_encoder Embedding(5, 768, padding_idx=0)`` of the edge
  type id (spatial=0 / temporal=1) — padding_idx likewise zeroes the
  embedding of every *spatial* edge (tokenizer.py:45,247);
* node identifiers: Laplacian eigvectors truncated/padded to k, optional
  train-time random sign flip (per graph x mode) and eig-dropout 0.2
  (tokenizer.py:134-151, 277-287); each token's identifier is [id_u; id_v]
  through a bias-free 2k->768 encoder (get_index_embed, :163-183);
* type identifier Embedding(3, 768) keyed on u==v (node) vs u!=v (edge)
  (:185-193); [graph] and [null] special tokens prepended (:195-215);
* encoder: pre-norm layers, d=768, gelu, ffn 768, dropout 0.1 — the
  reference creates a final prenorm LayerNorm but never applies it in
  forward (tokengt_graph_encoder.py:137-138 vs :268-327); we also do not;
* LM head: dense 768->768 + gelu + LayerNorm, then a bias-free 768->26
  projection plus a learned output bias (models/tokengt.py:86-95,108-120);
  ``hidden`` is the post-LayerNorm pre-projection activation (:109).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidsgg.models.attention import MultiheadAttention
from vidsgg.models.performer import favor_attention, gaussian_orthogonal_random_matrix


class MultiheadPerformerAttention(nn.Module):
    """FAVOR+ linear-attention drop-in for the self-attention site
    (modules/multihead_performer_attention.py).

    Random-feature redraw (the reference's ProjectionUpdater,
    performer_pytorch.py): during training, when a ``performer`` RNG stream
    is supplied, the projection is drawn from it — the train step folds
    ``step // redraw_interval`` into a fixed base key, so the projection is
    constant within an interval and redraws at the boundary, per layer.
    Without the stream (or at test time) it falls back to a deterministic
    compile-time constant from ``proj_seed``."""

    embed_dim: int
    num_heads: int
    nb_features: int = 256
    proj_seed: int = 0

    @nn.compact
    def __call__(self, x, key_mask, deterministic=True):
        d, h = self.embed_dim, self.num_heads
        hd = d // h

        def split(t):
            return t.reshape(t.shape[:-1] + (h, hd)).swapaxes(-3, -2)

        q = split(nn.Dense(d, name="q_proj")(x))
        k = split(nn.Dense(d, name="k_proj")(x))
        v = split(nn.Dense(d, name="v_proj")(x))
        if not deterministic and self.has_rng("performer"):
            proj_rng = self.make_rng("performer")
        else:
            proj_rng = jax.random.PRNGKey(self.proj_seed)
        proj = gaussian_orthogonal_random_matrix(
            proj_rng, self.nb_features, hd
        )[0]
        out = favor_attention(q, k, v, key_mask[..., None, :], proj)
        out = out.swapaxes(-3, -2).reshape(x.shape[:-1] + (d,))
        return nn.Dense(d, name="out_proj")(out)


class TokenGTLayer(nn.Module):
    """Pre-norm encoder layer (tokengt_graph_encoder_layer.py:158-191)."""

    embed_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    performer: bool = False
    performer_nb_features: int = 256

    @nn.compact
    def __call__(self, x, attn_mask, deterministic=True, key_mask=None):
        h = nn.LayerNorm(epsilon=1e-5)(x)
        if self.performer:
            h = MultiheadPerformerAttention(
                self.embed_dim, self.num_heads, self.performer_nb_features
            )(h, key_mask, deterministic)
        else:
            h = MultiheadAttention(
                self.embed_dim, self.num_heads, self.attention_dropout
            )(h, h, h, attn_mask, deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.gelu(nn.Dense(self.ffn_dim)(h), approximate=False)
        h = nn.Dropout(self.activation_dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.embed_dim)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class TokenGTEncoder(nn.Module):
    """Tokenizer + transformer + LM head over a batch of padded clip graphs.

    Inputs (padded to static capacities, leading clip-batch axis B):
      node_data   [B, Tn, num_atoms]  raw 1168-d node tokens
      node_mask   [B, Tn] bool
      frame_idx   [B, Tn] clip-rebased frame index of each node
      edge_index  [B, Te, 2] (u, v) node indices
      edge_type   [B, Te] 0=spatial / 1=temporal
      edge_mask   [B, Te] bool
      lap_eigvec  [B, Tn, Tn] eigvectors (columns = modes)

    Returns (logits [B, Tn, num_output], hidden [B, Tn, D], graph_rep [B, D])
    on the node axis (person/object slicing happens in the TEAT-GT model,
    which owns the pair layout).
    """

    num_atoms: int = 1168
    num_output: int = 26
    embed_dim: int = 768
    layers: int = 12
    heads: int = 32
    ffn_dim: int = 768
    lap_node_id_k: int = 50
    lap_sign_flip: bool = True
    lap_eig_dropout: float = 0.2
    dropout: float = 0.1
    node_id_mode: str = "lap"   # 'lap' | 'orf' | 'rand' (tokenizer.py:257-287)
    performer: bool = False
    performer_nb_features: int = 256

    @nn.compact
    def __call__(
        self,
        node_data,
        node_mask,
        frame_idx,
        edge_index,
        edge_type,
        edge_mask,
        lap_eigvec,
        deterministic: bool = True,
    ):
        d = self.embed_dim
        b, tn = node_data.shape[0], node_data.shape[1]
        batch_ix = jnp.arange(b)[:, None]

        # --- node features + temporal PE (padding_idx=0 quirk) ---
        node_feat = nn.Dense(d, name="atom_encoder")(node_data)
        temp_table = self.param(
            "temp_encoder", nn.initializers.normal(0.02), (100, d)
        )
        tpe = temp_table[jnp.clip(frame_idx, 0, 99)] * (frame_idx != 0)[..., None]
        node_feat = node_feat + tpe

        # --- edge features (padding_idx=0 zeroes spatial-edge embeds) ---
        edge_table = self.param(
            "edge_encoder", nn.initializers.normal(0.02), (5, d)
        )
        edge_feat = edge_table[edge_type] * (edge_type != 0)[..., None]

        # --- node identifiers: Laplacian (default) / ORF / random ---
        k = self.lap_node_id_k
        if self.node_id_mode == "rand":
            # tokenizer.py:257-261: uniform ids, L2-normalized, fresh each call
            # (fixed key at eval so inference is deterministic)
            rng = self.make_rng("dropout") if not deterministic else jax.random.PRNGKey(0)
            ids = jax.random.uniform(rng, (b, tn, k))
            eig = ids * jax.lax.rsqrt((ids * ids).sum(-1, keepdims=True) + 1e-12)
        elif self.node_id_mode == "orf":
            # tokenizer.py:263-275: orthogonal random features per graph
            rng = self.make_rng("dropout") if not deterministic else jax.random.PRNGKey(0)
            orf = gaussian_orthogonal_random_matrix(rng, tn, tn, batch=b)
            if tn < k:
                orf = jnp.pad(orf, ((0, 0), (0, 0), (0, k - tn)))
            ids = orf[..., :k]
            eig = ids * jax.lax.rsqrt((ids * ids).sum(-1, keepdims=True) + 1e-12)
        else:
            eig = lap_eigvec[..., : min(k, lap_eigvec.shape[-1])]
            if eig.shape[-1] < k:
                eig = jnp.pad(eig, ((0, 0), (0, 0), (0, k - eig.shape[-1])))
            if self.lap_eig_dropout > 0:
                eig = nn.Dropout(self.lap_eig_dropout)(eig, deterministic=deterministic)
            if self.lap_sign_flip and not deterministic:
                rng = self.make_rng("dropout")
                flip = jnp.where(jax.random.uniform(rng, (b, 1, k)) >= 0.5, 1.0, -1.0)
                eig = eig * flip
        # token identifier [id_u ; id_v]: nodes use (i, i), edges (u, v)
        node_id_pairs = jnp.concatenate([eig, eig], axis=-1)  # [B, Tn, 2k]
        eig_u = eig[batch_ix, edge_index[..., 0]]
        eig_v = eig[batch_ix, edge_index[..., 1]]
        edge_id_pairs = jnp.concatenate([eig_u, eig_v], axis=-1)  # [B, Te, 2k]
        lap_enc = nn.Dense(d, use_bias=False, name="lap_encoder")
        node_feat = node_feat + lap_enc(node_id_pairs)
        edge_feat = edge_feat + lap_enc(edge_id_pairs)

        # --- type identifiers: order = (u == v) -> 1 for nodes, 0 for edges ---
        order_table = self.param(
            "order_encoder", nn.initializers.normal(0.02), (3, d)
        )
        node_feat = node_feat + order_table[1]
        is_self = (edge_index[..., 0] == edge_index[..., 1]).astype(jnp.int32)
        edge_feat = edge_feat + order_table[is_self]

        # --- special tokens + sequence assembly ---
        graph_tok = self.param("graph_token", nn.initializers.normal(0.02), (1, d))
        null_tok = self.param("null_token", nn.initializers.normal(0.02), (1, d))
        special = jnp.broadcast_to(
            jnp.concatenate([graph_tok, null_tok], axis=0)[None], (b, 2, d)
        )
        seq = jnp.concatenate([special, node_feat, edge_feat], axis=1)
        seq_mask = jnp.concatenate(
            [jnp.ones((b, 2), bool), node_mask, edge_mask], axis=1
        )
        seq = seq * seq_mask[..., None]

        seq = nn.Dropout(self.dropout)(seq, deterministic=deterministic)
        attn_mask = seq_mask[:, None, :] & seq_mask[:, :, None]
        for i in range(self.layers):
            seq = TokenGTLayer(
                d, self.heads, self.ffn_dim, self.dropout,
                performer=self.performer,
                performer_nb_features=self.performer_nb_features,
                name=f"layer_{i}",
            )(seq, attn_mask, deterministic, key_mask=seq_mask)

        # --- LM head ---
        h = nn.Dense(d, name="lm_head_transform_weight")(seq)
        h = nn.LayerNorm(epsilon=1e-5, name="lm_head_ln")(nn.gelu(h, approximate=False))
        hidden = h
        bias = self.param("lm_output_bias", nn.initializers.zeros, (self.num_output,))
        logits = nn.Dense(self.num_output, use_bias=False, name="embed_out")(h) + bias

        graph_rep = seq[:, 0]
        node_logits = logits[:, 2 : 2 + tn] * node_mask[..., None]
        node_hidden = hidden[:, 2 : 2 + tn] * node_mask[..., None]
        return node_logits, node_hidden, graph_rep
