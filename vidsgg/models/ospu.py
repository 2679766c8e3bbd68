"""OSPU — the object classifier shared by TEMPURA and TEAT-GT.

TPU-native re-design of ``ObjectClassifier`` (tools/utils/object_classifier.py,
near-duplicate embedded at lib/tempura.py:51-423; TEMPURA uses its own copy,
TEAT-GT the tools/ one — this single module serves both).

Device path (this module):
* object features = roi_feat(2048) ⊕ distribution·GloVe(200) ⊕
  pos_embed(128 of BatchNorm+Linear over center-size boxes)
  (object_classifier.py:70-74, 241-243);
* optional tracking: the reference groups boxes by predicted class
  (ds_track.get_sequence) and runs each class sequence through a 3-layer
  transformer encoder with frame-rank positional encoding, padding sequences
  to a rectangle (:176-210). Here that is one masked dense self-attention
  over all object tokens restricted to same-predicted-class keys — identical
  math (attention is permutation-equivariant; the positional index is the
  token's frame rank within its class sequence, reproduced exactly);
* optional memory hallucination: gated single-head attention over the object
  memory bank (:157-173);
* GMM or linear decoder (:225-241) with the reference's train/test/unc
  branching.

The data-dependent *test-time* relabeling for sgcls/sgdet (human selection,
duplicate suppression, clean_class, per-class NMS, pair rebuild —
lib/tempura.py:257-423) lives in :mod:`vidsgg.models.postprocess` on the
host: it is O(objects) bookkeeping between two jit regions, off the FLOP
path.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vidsgg import constants as C
from vidsgg.data.entry import Entry
from vidsgg.models.attention import MultiheadAttention
from vidsgg.models.embeddings import obj_edge_vectors
from vidsgg.models.gmm_head import GMMHead
from vidsgg.models.norm import MaskedBatchNorm

OBJ_FEAT_DIM = 2048 + 200 + 128  # 2376


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    """Standard sin/cos table (lib/tempura.py:26-49)."""
    position = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class TorchEncoderLayer(nn.Module):
    """Post-norm encoder layer matching torch.nn.TransformerEncoderLayer
    (relu activation, used by the tracking encoder,
    object_classifier.py:80-82)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, attn_mask, deterministic=True):
        a = MultiheadAttention(self.d_model, self.nhead, self.dropout)(
            x, x, x, attn_mask, deterministic
        )
        x = nn.LayerNorm(epsilon=1e-5)(x + nn.Dropout(self.dropout)(a, deterministic=deterministic))
        h = nn.relu(nn.Dense(self.dim_feedforward)(x))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model)(h)
        return nn.LayerNorm(epsilon=1e-5)(x + nn.Dropout(self.dropout)(h, deterministic=deterministic))


class ObjectMemoryHallucinator(nn.Module):
    """Gated attention over the object memory bank
    (object_classifier.py:157-182)."""

    embed_dim: int
    selection: str | None  # 'manual' | 'automated'
    selection_lambda: float = 0.5

    @nn.compact
    def __call__(self, feat, memory, mem_active):
        if self.selection == "manual":
            e = self.selection_lambda
        else:
            e = nn.sigmoid(nn.Dense(1, name="selector")(feat))
        mem = MultiheadAttention(
            self.embed_dim, 1, 0.0, use_bias=False, out_bias=False,
            name="mem_attention",
        )(feat, memory, memory)
        out = e * feat + (1.0 - e) * mem
        return jnp.where(mem_active, out, feat)


class ObjectClassifier(nn.Module):
    mode: str = "sgdet"
    obj_head: str = "gmm"  # 'gmm' | 'linear'
    k: int = 4
    num_classes: int = C.NUM_OBJ_CLASSES
    mem_compute: bool = False
    selection: str | None = None
    selection_lambda: float = 0.5
    tracking: bool = False
    encoder_layers: int = 3
    max_pe_len: int = 600

    def _track_positions(self, seq_cls, frame, valid, max_frames):
        """Frame rank of each token within its predicted-class sequence
        (object_classifier.py:193-197)."""
        nc = self.num_classes - 1
        present = jnp.zeros((nc, max_frames), bool)
        present = present.at[seq_cls, frame].max(valid)
        # exclusive cumulative count of earlier distinct frames per class
        cum = jnp.cumsum(present.astype(jnp.int32), axis=1) - present.astype(jnp.int32)
        return cum[seq_cls, frame]

    @nn.compact
    def __call__(
        self,
        entry: Entry,
        phase: str = "train",
        unc: bool = False,
        obj_memory=None,
        mem_active=False,
        deterministic: bool = True,
    ) -> dict[str, Any]:
        """Returns an aux dict: 'distribution' (train: [N, C]; test: [N, C-1]),
        'object_features', 'object_mem_features', optional 'obj_al_uc'/'obj_ep_uc'.
        predcls returns {} (passthrough, lib/tempura.py:245-247)."""
        if self.mode == "predcls":
            return {}

        names = list(C.AG_OBJECT_CLASSES)[1 : self.num_classes]
        embed_init = obj_edge_vectors(names)
        obj_embed_table = self.param(
            "obj_embed", lambda rng: jnp.asarray(embed_init)
        )  # [C-1, 200]
        obj_embed = entry.distribution @ obj_embed_table

        cs = _center_size(entry.boxes[:, 1:])
        csn = MaskedBatchNorm(momentum=0.01 / 10.0, name="pos_bn")(
            cs, entry.obj_mask, use_running_average=deterministic
        )
        pos = nn.relu(nn.Dense(128, name="pos_fc")(csn))
        pos = nn.Dropout(0.1)(pos, deterministic=deterministic)

        feats = jnp.concatenate([entry.features, obj_embed, pos], axis=1)  # [N, 2376]
        valid = entry.obj_mask

        if self.tracking:
            seq_cls = jnp.argmax(entry.distribution, axis=1)
            frame = entry.boxes[:, 0].astype(jnp.int32)
            pos_idx = self._track_positions(seq_cls, frame, valid, entry.frame_mask.shape[0])
            # Checkpoint-carried state, not a param: the reference computes
            # its sin/cos table in float32 torch ops whose rounding numpy
            # cannot reproduce bitwise; converters overwrite this variable
            # with the torch ``positional_encoder.pe`` buffer so converted
            # checkpoints match the reference bit-for-bit. Self-init uses
            # the (more accurate) float64-computed table.
            pe = self.variable(
                "batch_stats", "pe_table",
                lambda: jnp.asarray(sinusoidal_pe(self.max_pe_len, OBJ_FEAT_DIM)),
            ).value
            x = feats + pe[jnp.clip(pos_idx, 0, self.max_pe_len - 1)]
            x = nn.Dropout(0.1)(x, deterministic=deterministic)
            same_seq = (
                (seq_cls[:, None] == seq_cls[None, :])
                & valid[:, None]
                & valid[None, :]
            )
            for i in range(self.encoder_layers):
                x = TorchEncoderLayer(
                    OBJ_FEAT_DIM, 8, 1024, 0.1, name=f"track_{i}"
                )(x, same_seq, deterministic)
            obj_features = x * valid[:, None]
            object_features = obj_features
            if self.mem_compute:
                obj_features = ObjectMemoryHallucinator(
                    OBJ_FEAT_DIM, self.selection, self.selection_lambda,
                    name="memory",
                )(obj_features, obj_memory, mem_active)
            object_mem_features = obj_features
            h = nn.relu(
                MaskedBatchNorm(name="inter_bn")(
                    nn.Dense(1024, name="inter_fc")(obj_features),
                    valid,
                    use_running_average=deterministic,
                )
            )
        else:
            h = nn.relu(
                MaskedBatchNorm(name="inter_bn")(
                    nn.Dense(1024, name="inter_fc")(feats),
                    valid,
                    use_running_average=deterministic,
                )
            )
            object_features = h
            if self.mem_compute:
                h = ObjectMemoryHallucinator(
                    1024, self.selection, self.selection_lambda, name="memory"
                )(h, obj_memory, mem_active)
            object_mem_features = h

        out: dict[str, Any] = {
            "object_features": object_features * valid[:, None],
            "object_mem_features": object_mem_features * valid[:, None],
        }

        if self.obj_head == "gmm":
            head = GMMHead(self.num_classes, self.k, rel_type=None, name="decoder")
            if phase == "train" and unc:
                # reference quirk: under unc the train pass uses test-phase
                # logits for the distribution (lib/tempura.py:229-231)
                out["distribution"] = head(h, phase="test", unc=False)
                out["obj_al_uc"], out["obj_ep_uc"] = head(h, phase="test", unc=True)
            else:
                out["distribution"] = head(h, phase=phase, unc=False)
        else:
            logits = nn.Dense(self.num_classes, name="decoder")(h)
            if phase == "train":
                out["distribution"] = logits
            else:
                out["distribution"] = jax.nn.softmax(logits[:, 1:], axis=1)
        out["distribution"] = out["distribution"] * valid[:, None]
        return out


def _center_size(boxes: jnp.ndarray) -> jnp.ndarray:
    wh = boxes[..., 2:4] - boxes[..., 0:2] + 1.0
    return jnp.concatenate([boxes[..., 0:2] + 0.5 * (wh - 1.0), wh], axis=-1)
