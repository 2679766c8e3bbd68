"""Vectorized scene-graph construction for TEAT-GT.

Replaces lib/teatgt.py's per-clip Python graph building (:103-274):

* node tokens = one person token per frame (from the frame's first pair,
  :107-115) + one object token per pair (:118-141), ordered frame-major with
  the person first (:150-157);
* 5-frame clip split (:160-169);
* spatial edges: same-frame pairs with bbox-center distance <= 0.5 x video
  diagonal (:199-209); temporal edges: adjacent-frame pairs with token
  cosine similarity >= 0.75 (:211-221); both directions; a (0,1)/(1,0)
  fallback when a clip has no edges (:229-234).

Everything is computed as dense masks over fixed-capacity token axes, so the
whole construction jits; the reference's O(n^2) itertools loops and per-clip
CPU eigendecompositions become batched matmul-shaped ops + one vmapped
``eigh``. Edge *order* differs from the reference's enumeration order —
TokenGT treats edge tokens as a set (attention is permutation-invariant), so
this has no semantic effect.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from vidsgg.data.entry import Entry


@dataclasses.dataclass(frozen=True)
class ClipCaps:
    """Static TEAT-GT capacities."""

    clip_size: int = 5
    n_clips: int = 4            # >= ceil(max_frames / clip_size)
    tokens_per_clip: int = 24   # >= clip_size * (1 + max objs per frame)
    edges_per_clip: int = 128   # directed edges
    tokens_per_frame: int = 8   # for the per-frame regularizer graphs


class TokenLayout(struct.PyTreeNode):
    """Global token axis (persons then pair-objects) and its clip routing."""

    # global token axis, size F + P
    token_frame: jnp.ndarray     # [T]
    token_valid: jnp.ndarray     # [T]
    token_center: jnp.ndarray    # [T, 2]
    token_is_person: jnp.ndarray # [T]
    token_box: jnp.ndarray       # [T] box index providing the 2048-d feature
    token_label: jnp.ndarray     # [T] class label for the label embedding
    token_pair: jnp.ndarray      # [T] pair id for object tokens (0 otherwise)
    # clip routing
    clip_tokens: jnp.ndarray     # [n_clips, Tc] indices into the token axis
    clip_mask: jnp.ndarray       # [n_clips, Tc]
    # frame routing (regularizer)
    frame_tokens: jnp.ndarray    # [F, Tf]
    frame_mask: jnp.ndarray      # [F, Tf]


def build_token_layout(entry: Entry, caps: ClipCaps) -> TokenLayout:
    f_cap = entry.frame_mask.shape[0]
    p_cap = entry.pair_mask.shape[0]
    t = f_cap + p_cap

    # person token per frame: the frame's first pair's subject (:107-115)
    frames = jnp.arange(f_cap)
    has_pair = (entry.im_idx[None, :] == frames[:, None]) & entry.pair_mask[None, :]
    person_exists = has_pair.any(axis=1)
    first_pair = jnp.argmax(has_pair, axis=1)  # valid only where person_exists

    person_box = entry.pair_idx[first_pair, 0]
    object_box = entry.pair_idx[:, 1]

    token_frame = jnp.concatenate([frames, entry.im_idx])
    token_valid = jnp.concatenate([person_exists, entry.pair_mask])
    token_is_person = jnp.concatenate(
        [jnp.ones(f_cap, bool), jnp.zeros(p_cap, bool)]
    )
    token_box = jnp.concatenate([person_box, object_box])
    token_label = entry.pred_labels[token_box]
    token_pair = jnp.concatenate([jnp.zeros(f_cap, jnp.int32), jnp.arange(p_cap)])

    b = entry.boxes[token_box, 1:]
    token_center = jnp.stack(
        [(b[:, 0] + b[:, 2]) / 2.0, (b[:, 1] + b[:, 3]) / 2.0], axis=1
    )

    # frame-major stable order, person (low global index) before objects
    big = f_cap + caps.n_clips * caps.clip_size + 1
    order = jnp.argsort(jnp.where(token_valid, token_frame, big), stable=True)
    sorted_valid = token_valid[order]
    sorted_frame = jnp.where(sorted_valid, token_frame[order], big)

    def route(group_of_sorted, n_groups, cap):
        """Slot tokens (already frame-sorted) into per-group rows."""
        grp = jnp.where(sorted_valid, group_of_sorted, n_groups)  # pad -> n_groups
        # rank within group = position - first position of the group
        first = jnp.searchsorted(grp, jnp.arange(n_groups), side="left")
        slot = jnp.arange(t) - first[jnp.clip(grp, 0, n_groups - 1)]
        ok = sorted_valid & (slot >= 0) & (slot < cap)
        idx = jnp.zeros((n_groups, cap), jnp.int32)
        msk = jnp.zeros((n_groups, cap), bool)
        gi = jnp.where(ok, grp, n_groups)  # drop out-of-range scatters
        si = jnp.where(ok, slot, 0)
        idx = idx.at[gi, si].set(order, mode="drop")
        msk = msk.at[gi, si].set(ok, mode="drop")
        return idx, msk

    clip_of_sorted = sorted_frame // caps.clip_size
    clip_tokens, clip_mask = route(clip_of_sorted, caps.n_clips, caps.tokens_per_clip)
    frame_tokens, frame_mask = route(sorted_frame, f_cap, caps.tokens_per_frame)

    return TokenLayout(
        token_frame=token_frame,
        token_valid=token_valid,
        token_center=token_center,
        token_is_person=token_is_person,
        token_box=token_box,
        token_label=token_label,
        token_pair=token_pair,
        clip_tokens=clip_tokens,
        clip_mask=clip_mask,
        frame_tokens=frame_tokens,
        frame_mask=frame_mask,
    )


def clip_edge_masks(
    frames: jnp.ndarray,       # [B, Tc] clip-rebased frame per token
    centers: jnp.ndarray,      # [B, Tc, 2]
    feats: jnp.ndarray,        # [B, Tc, D] tokens for cosine similarity
    mask: jnp.ndarray,         # [B, Tc]
    edge_thr: jnp.ndarray,     # [] or [B] spatial distance threshold
    sim_thr: float = 0.75,
):
    """Dense (spatial, temporal) directed-edge masks per clip (:199-221)."""
    vv = mask[:, :, None] & mask[:, None, :]
    not_self = ~jnp.eye(mask.shape[-1], dtype=bool)[None]

    same_frame = frames[:, :, None] == frames[:, None, :]
    d = jnp.sqrt(
        ((centers[:, :, None, :] - centers[:, None, :, :]) ** 2).sum(-1) + 1e-12
    )
    edge_thr = jnp.asarray(edge_thr)
    if edge_thr.ndim == 1:
        edge_thr = edge_thr[:, None, None]
    spatial = vv & not_self & same_frame & (d <= edge_thr)

    nrm = feats * jax.lax.rsqrt((feats * feats).sum(-1, keepdims=True) + 1e-12)
    cos = jnp.einsum("bid,bjd->bij", nrm, nrm)
    next_frame = frames[:, None, :] == frames[:, :, None] + 1
    temporal_fwd = vv & next_frame & (cos >= sim_thr)
    temporal = temporal_fwd | jnp.swapaxes(temporal_fwd, 1, 2)
    return spatial, temporal


def masks_to_edge_list(spatial, temporal, edges_cap: int):
    """Dense masks -> padded (edge_index [B, E, 2], edge_type [B, E],
    edge_mask [B, E], adjacency [B, Tc, Tc]) with the reference's empty-clip
    fallback edge (0,1)/(1,0) (:229-234)."""
    b, tc, _ = spatial.shape
    any_edge = (spatial | temporal).reshape(b, -1).any(-1)
    fb = jnp.zeros((tc, tc), bool).at[0, 1].set(True).at[1, 0].set(True)
    spatial = jnp.where(any_edge[:, None, None], spatial, fb[None])

    mask = spatial | temporal
    flat = mask.reshape(b, -1)
    # stable partition: edge positions first
    order = jnp.argsort(~flat, axis=1, stable=True)[:, :edges_cap]
    edge_mask = jnp.take_along_axis(flat, order, axis=1)
    u = order // tc
    v = order % tc
    edge_index = jnp.stack([u, v], axis=-1) * edge_mask[..., None]
    is_temporal = jnp.take_along_axis(temporal.reshape(b, -1), order, axis=1)
    edge_type = jnp.where(edge_mask & is_temporal, 1, 0)
    adj = mask.astype(jnp.float32)
    return edge_index.astype(jnp.int32), edge_type.astype(jnp.int32), edge_mask, adj
