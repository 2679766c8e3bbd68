"""TEMPURA — OSPU + pair features + STTran + GMM predicate heads.

TPU-native re-design of ``lib/tempura.py`` (class TEMPURA, :426-598). The
forward is a single jit region over the padded Entry:

* pair features (:536-563): subj_fc(2048->512) ⊕ obj_fc(2048->512) ⊕ vr
  (1x1 conv over union ROI features + conv stack over the 2x27x27 spatial
  masks, flattened through vr_fc->512) ⊕ two 200-d label embeddings = 1936;
* STTran spatial/temporal transformer (:496-500, 566);
* three GMM (or linear) predicate heads (:502-510, 580-596).

The module exposes two sub-stages — :meth:`classify_objects` (OSPU) and
:meth:`relation_forward` — because at *test time* in sgcls/sgdet the
reference interposes data-dependent relabeling/NMS/pair-rebuild between them
(lib/tempura.py:257-423); that logic runs on host
(:mod:`vidsgg.models.postprocess`) between the two jit regions.

Convolutions run NHWC (TPU layout); the vr flatten is therefore HWC-ordered
rather than the reference's CHW — a fixed permutation absorbed by the
learned vr_fc weight.
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
from vidsgg.models.gmm_head import GMMHead
from vidsgg.models.norm import MaskedBatchNorm
from vidsgg.models.ospu import ObjectClassifier
from vidsgg.models.sttran import STTran


@dataclasses.dataclass(frozen=True)
class TempuraConfig:
    """Model hyperparameters; names/defaults follow tools/utils/tempura_config.py
    plus its mode-derived overrides (:25-28)."""

    mode: str = "predcls"
    num_classes: int = C.NUM_OBJ_CLASSES
    attention_class_num: int = C.NUM_ATTENTION
    spatial_class_num: int = C.NUM_SPATIAL
    contact_class_num: int = C.NUM_CONTACTING
    enc_layers: int = 1
    dec_layers: int = 3
    obj_head: str = "linear"
    rel_head: str = "gmm"
    k: int = 6
    tracking: bool = False
    # tracking-encoder depth (object_classifier.py:80-82 hardcodes 3);
    # the multi-chip dryrun's tiny variants shrink it to keep the 8-way
    # GSPMD compile small — the converter follows whatever depth the
    # checkpoint carries, so 3 stays the parity default
    track_layers: int = 3
    obj_mem_compute: bool = False
    rel_mem_compute: str | None = "joint"  # 'joint' | 'seperate' | None
    take_obj_mem_feat: bool = False
    mem_fusion: str = "late"
    selection: str = "manual"
    selection_lambda: float = 0.5

    @staticmethod
    def for_mode(mode: str, **kw) -> "TempuraConfig":
        """Apply the reference's mode-conditional overrides
        (tempura_config.py:25-28: non-predcls forces K=4 and tracking)."""
        if mode != "predcls":
            kw.setdefault("k", 4)
            kw.setdefault("tracking", True)
        return TempuraConfig(mode=mode, **kw)


class PairFeatures(nn.Module):
    """lib/tempura.py:465-494 + :536-563."""

    cfg: TempuraConfig

    @nn.compact
    def __call__(self, entry: Entry, obj_mem_features, pred_labels,
                 deterministic=True):
        cfg = self.cfg
        pair = entry.pair_idx
        pm = entry.pair_mask

        if not cfg.take_obj_mem_feat:
            src = entry.features
        else:
            src = obj_mem_features
        subj = nn.Dense(512, name="subj_fc")(src[pair[:, 0]])
        obj = nn.Dense(512, name="obj_fc")(src[pair[:, 1]])

        # union visual stream
        u = nn.Conv(256, (1, 1), name="union_func1")(entry.union_feat)
        m = jnp.transpose(entry.spatial_masks, (0, 2, 3, 1))  # [P, S, S, 2]
        h = nn.Conv(128, (7, 7), strides=2, padding=3, name="mask_conv1")(m)
        h = nn.relu(h)
        h = MaskedBatchNorm(momentum=0.01, name="mask_bn1")(
            h, jnp.broadcast_to(pm[:, None, None], h.shape[:-1]),
            use_running_average=deterministic,
        )
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        h = nn.Conv(256, (3, 3), padding=1, name="mask_conv2")(h)
        h = nn.relu(h)
        h = MaskedBatchNorm(momentum=0.01, name="mask_bn2")(
            h, jnp.broadcast_to(pm[:, None, None], h.shape[:-1]),
            use_running_average=deterministic,
        )
        vr = u + h  # [P, 7, 7, 256]
        vr = nn.Dense(512, name="vr_fc")(vr.reshape(vr.shape[0], -1))

        x_visual = jnp.concatenate([subj, obj, vr], axis=1)  # [P, 1536]

        # semantic stream: two independent label-embedding tables
        names = list(C.AG_OBJECT_CLASSES)[: cfg.num_classes]
        init = obj_edge_vectors(names)
        t1 = self.param("obj_embed", lambda rng: jnp.asarray(init))
        t2 = self.param("obj_embed2", lambda rng: jnp.asarray(init))
        subj_cls = pred_labels[pair[:, 0]]
        obj_cls = pred_labels[pair[:, 1]]
        x_sem = jnp.concatenate([t1[subj_cls], t2[obj_cls]], axis=1)  # [P, 400]

        rel = jnp.concatenate([x_visual, x_sem], axis=1)  # [P, 1936]
        return rel * pm[:, None], obj_cls


class Tempura(nn.Module):
    cfg: TempuraConfig

    def setup(self):
        cfg = self.cfg
        self.object_classifier = ObjectClassifier(
            mode=cfg.mode,
            obj_head=cfg.obj_head,
            k=cfg.k,
            num_classes=cfg.num_classes,
            mem_compute=cfg.obj_mem_compute,
            selection=cfg.selection if cfg.obj_mem_compute else None,
            selection_lambda=cfg.selection_lambda,
            tracking=cfg.tracking,
            encoder_layers=cfg.track_layers,
            max_pe_len=600 if cfg.mode == "sgdet" else 400,
        )
        self.pair_features = PairFeatures(cfg)
        self.glocal_transformer = STTran(
            embed_dim=1936,
            nhead=8,
            enc_layers=cfg.enc_layers,
            dec_layers=cfg.dec_layers,
            dim_feedforward=2048,
            dropout=0.1,
            mode="latter",
            mem_compute=cfg.rel_mem_compute,
            selection=cfg.selection,
            selection_lambda=cfg.selection_lambda,
            mem_fusion=cfg.mem_fusion,
        )
        if cfg.rel_head == "gmm":
            self.a_rel = GMMHead(cfg.attention_class_num, cfg.k, "attention")
            self.s_rel = GMMHead(cfg.spatial_class_num, cfg.k, "spatial")
            self.c_rel = GMMHead(cfg.contact_class_num, cfg.k, "contact")
        else:
            self.a_rel = nn.Dense(cfg.attention_class_num)
            self.s_rel = nn.Dense(cfg.spatial_class_num)
            self.c_rel = nn.Dense(cfg.contact_class_num)

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
        self, entry: Entry, obj_mem_features=None, phase="train", unc=False,
        rel_memory=None, mem_active=False, deterministic: bool | None = None,
    ) -> dict[str, Any]:
        cfg = self.cfg
        if deterministic is None:
            deterministic = phase != "train"
        if obj_mem_features is None:
            obj_mem_features = entry.features

        rel_in, obj_class = self.pair_features(
            entry, obj_mem_features, entry.pred_labels, deterministic
        )
        global_output, rel_feats, mem_feats = self.glocal_transformer(
            rel_in,
            entry.im_idx,
            entry.pair_mask,
            entry.num_frames,
            memory=rel_memory,
            mem_active=mem_active,
            deterministic=deterministic,
        )

        out: dict[str, Any] = {
            "obj_class": obj_class,
            "rel_features": rel_feats,
            "rel_mem_features": mem_feats,
        }
        pm = entry.pair_mask[:, None]
        if cfg.rel_head == "gmm":
            if not unc:
                out["attention_distribution"] = self.a_rel(global_output, phase) * pm
                out["spatial_distribution"] = self.s_rel(global_output, phase) * pm
                out["contacting_distribution"] = self.c_rel(global_output, phase) * pm
            else:
                out["attention_al_uc"], out["attention_ep_uc"] = self.a_rel(
                    global_output, phase, unc=True
                )
                out["spatial_al_uc"], out["spatial_ep_uc"] = self.s_rel(
                    global_output, phase, unc=True
                )
                out["contacting_al_uc"], out["contacting_ep_uc"] = self.c_rel(
                    global_output, phase, unc=True
                )
        else:
            a = self.a_rel(global_output)
            if phase == "test":
                a = jax.nn.softmax(a, axis=-1)
            out["attention_distribution"] = a * pm
            out["spatial_distribution"] = jax.nn.sigmoid(self.s_rel(global_output)) * pm
            out["contacting_distribution"] = jax.nn.sigmoid(self.c_rel(global_output)) * pm
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
        """Full forward: valid for training in all modes and for predcls at
        test (sgcls/sgdet test must route through the host postprocess
        between the two stages)."""
        if deterministic is None:
            deterministic = phase != "train"
        aux = self.classify_objects(
            entry, phase, unc, obj_memory, mem_active, deterministic
        )
        out = self.relation_forward(
            entry,
            aux.get("object_mem_features"),
            phase,
            unc,
            rel_memory,
            mem_active,
            deterministic,
        )
        merged = dict(aux)
        merged.update(out)
        return merged
