"""TEAT-GT — Temporal-Edge-Augmented Tokenized Graph Transformer.

TPU-native re-design of ``lib/teatgt.py`` (class TEAT_GT). Pipeline per the
reference (call stack SURVEY.md §3.3):

  OSPU (linear head, no memory — :44-46)
  -> person/object tokens: fc(2048->968) ⊕ 200-d label embedding = 1168
     (:49-57, :118-144)
  -> frame-ordered tokens, 5-frame clips (:150-169)
  -> per-clip graphs: spatial edges (center distance <= 0.5 x video
     diagonal) + temporal edges (token cosine >= 0.75 across adjacent
     frames) (:174-234)
  -> normalized-Laplacian eigvectors as node identifiers (:243-254)
  -> TokenGT encoder -> 26-way logits on object tokens (:279, tokengt.py:124-133)
  -> split 3/6/17, softmax/sigmoid (:338-344)
  + train-time temporal-consistency regularizer: per-frame spatial graphs
    through two GraphTransformers (structural on eigvectors, semantic on
    TokenGT hidden states), attention-pooled, pairwise KL / Δt within each
    clip (:285-334).

Design notes:
* The reference carries a pooled ``hidden_state`` across clips (:274,
  :280) but TokenGT never reads it — dead code there. We therefore process
  all clips **in parallel with vmap** (a scan would be needed only if the
  carry were live); the pooled per-clip representation is still computed and
  returned as ``clip_hidden_state`` for parity of capability.
* Edge sets, clip routing, and eigendecompositions are fully vectorized
  (:mod:`vidsgg.models.graph_build`).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidsgg import constants as C
from vidsgg.data.entry import Entry
from vidsgg.models.embeddings import obj_edge_vectors
from vidsgg.models.graph_build import (
    ClipCaps,
    build_token_layout,
    clip_edge_masks,
    masks_to_edge_list,
)
from vidsgg.models.graph_transformer import GlobalAttentionPooling, GraphTransformer
from vidsgg.models.ospu import ObjectClassifier
from vidsgg.models.tokengt import TokenGTEncoder
from vidsgg.ops import masked_laplacian_eig


@dataclasses.dataclass(frozen=True)
class TeatGTConfig:
    """Defaults follow tools/utils/teatgt_config.py incl. the mode-derived
    overrides (:11-14: non-predcls -> tracking, 6 layers, 16 heads)."""

    mode: str = "predcls"
    num_classes: int = C.NUM_OBJ_CLASSES
    tracking: bool = False
    encoder_layers: int = 12
    encoder_attention_heads: int = 32
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 768
    num_atoms: int = 1168
    num_output: int = 26
    lap_node_id_k: int = 50
    lap_node_id_sign_flip: bool = True
    lap_node_id_eig_dropout: float = 0.2
    node_id_mode: str = "lap"   # 'lap' | 'orf' | 'rand'
    performer: bool = False
    performer_nb_features: int = 256
    spatial_thr: float = 0.5
    sim_thr: float = 0.75
    reg_lap_k: int = 10
    # temporal-consistency regularizer flags: when both are off, the two
    # GraphTransformers + the second masked eigendecomposition are skipped
    # entirely at train time (the reference computes them unconditionally
    # and lets the loss assembly drop the result, lib/teatgt.py:285-334 —
    # wasted FLOPs in the default TEMPURA-style config)
    use_cons_str_loss: bool = False
    use_cons_sem_loss: bool = False
    caps: ClipCaps = ClipCaps()

    @staticmethod
    def for_mode(mode: str, **kw) -> "TeatGTConfig":
        if mode != "predcls":
            kw.setdefault("tracking", True)
            kw.setdefault("encoder_layers", 6)
            kw.setdefault("encoder_attention_heads", 16)
        return TeatGTConfig(mode=mode, **kw)


class TeatGT(nn.Module):
    cfg: TeatGTConfig

    def setup(self):
        cfg = self.cfg
        self.object_classifier = ObjectClassifier(
            mode=cfg.mode,
            obj_head="linear",
            k=4,
            num_classes=cfg.num_classes,
            mem_compute=False,
            selection=None,
            tracking=cfg.tracking,
            max_pe_len=600 if cfg.mode == "sgdet" else 400,
        )
        self.subj_fc = nn.Dense(968)
        self.obj_fc = nn.Dense(968)
        names = list(C.AG_OBJECT_CLASSES)[: cfg.num_classes]
        embed_init = obj_edge_vectors(names)
        self.label_table = self.param(
            "node_label_tokenizer", lambda rng: jnp.asarray(embed_init)
        )
        self.tokengt = TokenGTEncoder(
            num_atoms=cfg.num_atoms,
            num_output=cfg.num_output,
            embed_dim=cfg.encoder_embed_dim,
            layers=cfg.encoder_layers,
            heads=cfg.encoder_attention_heads,
            ffn_dim=cfg.encoder_ffn_embed_dim,
            lap_node_id_k=cfg.lap_node_id_k,
            lap_sign_flip=cfg.lap_node_id_sign_flip,
            lap_eig_dropout=cfg.lap_node_id_eig_dropout,
            node_id_mode=cfg.node_id_mode,
            performer=cfg.performer,
            performer_nb_features=cfg.performer_nb_features,
        )
        self.gat = GraphTransformer(dim=cfg.reg_lap_k, max_nodes=cfg.caps.tokens_per_frame)
        self.gat_semantic = GraphTransformer(
            dim=cfg.encoder_embed_dim, max_nodes=cfg.caps.tokens_per_frame
        )
        self.gap = GlobalAttentionPooling()
        self.gap_sem = GlobalAttentionPooling()
        self.gap_gru = GlobalAttentionPooling()

    def classify_objects(
        self, entry: Entry, phase="train", unc=False, obj_memory=None,
        mem_active=False, deterministic: bool | None = None,
    ) -> dict[str, Any]:
        if deterministic is None:
            deterministic = phase != "train"
        return self.object_classifier(
            entry, phase, unc, obj_memory, mem_active, deterministic
        )

    def relation_forward(
        self, entry: Entry, obj_mem_features=None, phase: str = "train",
        unc: bool = False, rel_memory=None, mem_active=False,
        deterministic: bool | None = None,
    ) -> dict[str, Any]:
        """Graph construction + TokenGT + heads (+ train-time consistency
        regularizer). ``obj_mem_features``/``rel_memory``/``mem_active`` are
        accepted for EvalPipeline signature compatibility and unused —
        TEAT-GT has no memory machinery (lib/teatgt.py:44-46)."""
        cfg = self.cfg
        caps = cfg.caps
        if deterministic is None:
            deterministic = phase != "train"
        out: dict[str, Any] = {}

        layout = build_token_layout(entry, caps)

        # token features: person/object projections + label embedding = 1168
        feats = entry.features[layout.token_box]
        proj = jnp.where(
            layout.token_is_person[:, None],
            self.subj_fc(feats),
            self.obj_fc(feats),
        )
        tok = jnp.concatenate([proj, self.label_table[layout.token_label]], axis=1)
        tok = tok * layout.token_valid[:, None]

        # per-clip gathers
        ct = layout.clip_tokens
        cmask = layout.clip_mask
        cfeat = tok[ct] * cmask[..., None]
        cframe_abs = layout.token_frame[ct]
        cframe = cframe_abs - (jnp.arange(caps.n_clips) * caps.clip_size)[:, None]
        cframe = jnp.where(cmask, cframe, 0)
        ccenter = layout.token_center[ct]

        # spatial threshold: 0.5 x video diagonal, rounded to 4 decimals like
        # the reference's np.round(..., 4) (:174-175) — a boundary-distance
        # pair can flip its edge on the unrounded threshold
        diag = jnp.sqrt((entry.video_size**2).sum())
        thr = jnp.round(cfg.spatial_thr * diag * 1e4) / 1e4
        spatial, temporal = clip_edge_masks(
            cframe, ccenter, cfeat, cmask, thr, cfg.sim_thr
        )
        edge_index, edge_type, edge_mask, adj = masks_to_edge_list(
            spatial, temporal, caps.edges_per_clip
        )
        _, eigvec = masked_laplacian_eig(adj, cmask)

        node_logits, node_hidden, _ = self.tokengt(
            cfeat, cmask, cframe, edge_index, edge_type, edge_mask, eigvec,
            deterministic,
        )

        # pooled per-clip state (the reference's dead GRU-ish carry, :274-280)
        out["clip_hidden_state"] = self.gap_gru(node_hidden, cmask)

        # object-token logits -> pair axis (tokengt.py:122-133 slices off the
        # person token of each frame)
        p_cap = entry.pair_mask.shape[0]
        is_obj = cmask & ~layout.token_is_person[ct]
        pair_ids = jnp.where(is_obj, layout.token_pair[ct], p_cap)
        flat_logits = node_logits.reshape(-1, cfg.num_output)
        flat_pairs = pair_ids.reshape(-1)
        pair_logits = (
            jnp.zeros((p_cap, cfg.num_output))
            .at[flat_pairs]
            .set(flat_logits, mode="drop")
        )
        pm = entry.pair_mask[:, None]
        out["attention_distribution"] = (
            jax.nn.softmax(pair_logits[:, :3], axis=-1) * pm
        )
        out["spatial_distribution"] = jax.nn.sigmoid(pair_logits[:, 3:9]) * pm
        out["contacting_distribution"] = jax.nn.sigmoid(pair_logits[:, 9:]) * pm
        # object-token hidden states in pair order (memory/debug surface)
        out["rel_features"] = (
            jnp.zeros((p_cap, cfg.encoder_embed_dim))
            .at[flat_pairs]
            .set(node_hidden.reshape(-1, cfg.encoder_embed_dim), mode="drop")
        )

        if phase == "train" and (cfg.use_cons_str_loss or cfg.use_cons_sem_loss):
            str_loss, sem_loss = self._consistency_losses(
                entry, layout, tok, node_hidden, pair_ids, deterministic
            )
            out["structure_temp_loss"] = str_loss
            out["semantic_temp_loss"] = sem_loss
        return out

    def __call__(
        self,
        entry: Entry,
        phase: str = "train",
        unc: bool = False,
        rel_memory=None,
        obj_memory=None,
        mem_active=False,
        deterministic: bool | None = None,
    ) -> dict[str, Any]:
        """Full forward: training in all modes; predcls at test. sgcls/sgdet
        test routes through the host postprocess between the two stages
        (vidsgg.train.eval_pipeline)."""
        if deterministic is None:
            deterministic = phase != "train"
        aux = self.classify_objects(
            entry, phase, unc, obj_memory, mem_active, deterministic
        )
        out = self.relation_forward(
            entry, None, phase, unc, None, mem_active, deterministic
        )
        merged = dict(aux)
        merged.update(out)
        return merged

    def _consistency_losses(self, entry, layout, tok, node_hidden, pair_ids,
                            deterministic):
        """Per-frame graph embeddings -> pairwise KL/Δt within clips
        (lib/teatgt.py:285-334)."""
        cfg = self.cfg
        caps = cfg.caps
        f_cap = entry.frame_mask.shape[0]

        ft = layout.frame_tokens    # [F, Tf]
        fmask = layout.frame_mask
        fcenter = layout.token_center[ft]
        diag = jnp.sqrt((entry.video_size**2).sum())
        thr = jnp.round(cfg.spatial_thr * diag * 1e4) / 1e4  # np.round(.,4) parity

        vv = fmask[:, :, None] & fmask[:, None, :]
        not_self = ~jnp.eye(caps.tokens_per_frame, dtype=bool)[None]
        d = jnp.sqrt(((fcenter[:, :, None, :] - fcenter[:, None, :, :]) ** 2).sum(-1) + 1e-12)
        f_adj = (vv & not_self & (d <= thr)).astype(jnp.float32)

        _, f_eig = masked_laplacian_eig(f_adj, fmask)
        k = cfg.reg_lap_k
        f_nodes = f_eig[:, :, : min(k, f_eig.shape[-1])]
        if f_nodes.shape[-1] < k:
            f_nodes = jnp.pad(f_nodes, ((0, 0), (0, 0), (0, k - f_nodes.shape[-1])))

        # scatter TokenGT hidden states back to the global token axis, then
        # gather per frame (semantic stream, :313-317)
        t_cap = layout.token_frame.shape[0]
        dmodel = node_hidden.shape[-1]
        flat_tokens = layout.clip_tokens.reshape(-1)
        flat_ok = layout.clip_mask.reshape(-1)
        hidden_global = (
            jnp.zeros((t_cap, dmodel))
            .at[jnp.where(flat_ok, flat_tokens, t_cap)]
            .set(node_hidden.reshape(-1, dmodel), mode="drop")
        )
        f_sem = hidden_global[ft] * fmask[..., None]

        edges = f_adj[..., None]
        g_struct = self.gap(self.gat(f_nodes, edges, fmask), fmask)        # [F, k]
        g_sem = self.gap_sem(self.gat_semantic(f_sem, edges, fmask), fmask)  # [F, D]

        frame_ok = fmask.any(-1) & entry.frame_mask

        def pairwise_kl(sym):
            logp = jax.nn.log_softmax(sym, axis=-1)
            q = jax.nn.softmax(sym, axis=-1)
            # kl[u, v] = sum_d q_v (log q_v - logp_u)
            ent = (q * jnp.log(jnp.clip(q, 1e-30))).sum(-1)  # [F]
            cross = q @ logp.T  # cross[v, u] = sum q_v logp_u
            kl = ent[:, None] - cross  # [v, u] -> transpose to [u, v]
            kl = kl.T
            u = jnp.arange(f_cap)
            same_clip = (u[:, None] // caps.clip_size) == (u[None, :] // caps.clip_size)
            lower = u[None, :] > u[:, None]
            ok = same_clip & lower & frame_ok[:, None] & frame_ok[None, :]
            dt = jnp.maximum((u[None, :] - u[:, None]).astype(jnp.float32), 1.0)
            scores = jnp.where(ok, jnp.maximum(kl, 0.0) / dt, 0.0)
            cnt = jnp.maximum(ok.sum(), 1)
            return scores.sum() / cnt

        return pairwise_kl(g_struct), pairwise_kl(g_sem)
