"""On-device sgcls / sgdet test-time postprocess.

Jit-able, exact re-derivations of the host relabeling in
:mod:`vidsgg.models.postprocess` (itself a port of lib/tempura.py:257-423):

* sgcls (:259-316): label assignment, per-frame human selection, one-round
  modal-class duplicate suppression, pair rebuild;
* sgdet (:319-423): ``clean_class`` duplication for classes {5, 8, 17} on a
  statically expanded object axis, per-(frame, argmax-class) greedy NMS at
  IoU 0.6, the reference's (frame, class)-lexsorted re-ordering, label
  assignment + human selection, pair rebuild.

All masked ops on padded buffers, so each mode's evaluation runs as ONE jit
region (classify -> relabel -> union refeaturize -> relation transformer)
with no host round trip — the round-1 build paid two tunnel syncs per sgdet
eval video here.

Exactness notes (verified against the host versions in tests):
* torch.mode picks the smallest most-frequent label — argmax over label
  bincounts reproduces that tie-break;
* the reference keeps the *last* (by index) of equally-scored modal
  duplicates (stable ascending argsort, drop-last) — reproduced with a
  reversed argmax;
* clean_class growth is bounded by a static ``expand`` factor on the object
  axis; the returned overflow flag reports (host-checkable) truncation;
* the post-NMS lexsort is stable over NMS-keep order, i.e. score-descending
  within each (frame, class) group — reproduced by keying on the global
  score rank.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vidsgg.data.entry import Entry

_NEG = -1e9
_BIG = jnp.iinfo(jnp.int32).max


def sgcls_postprocess_device(entry: Entry, distribution: jnp.ndarray) -> Entry:
    """entry + OSPU test distribution [N, C-1] -> relabeled entry with
    rebuilt pairs (same object axis; pair axis capacity reused)."""
    n = distribution.shape[0]
    ncm1 = distribution.shape[1]
    f_cap = entry.frame_mask.shape[0]
    p_cap = entry.pair_mask.shape[0]
    valid = entry.obj_mask
    frame = entry.boxes[:, 0].astype(jnp.int32)

    dist = distribution * valid[:, None]
    pred_scores = jnp.where(valid, dist[:, 1:].max(1), 0.0)
    pred_labels = jnp.where(valid, dist[:, 1:].argmax(1) + 2, 0)

    # --- per-frame human selection (argmax person score) ---
    in_frame = (
        (frame[None, :] == jnp.arange(f_cap)[:, None]) & valid[None, :]
    )  # [F, N]
    person_scores = jnp.where(in_frame, dist[None, :, 0], _NEG)
    human_idx = person_scores.argmax(1)  # [F]
    frame_has_box = in_frame.any(1) & entry.frame_mask
    is_human = (
        jnp.zeros(n, bool)
        .at[jnp.where(frame_has_box, human_idx, n)]
        .set(True, mode="drop")
    )
    pred_labels = jnp.where(is_human, 1, pred_labels)
    pred_scores = jnp.where(is_human, dist[:, 0], pred_scores)

    # --- modal-class duplicate suppression (one round, lib/tempura.py:277-290) ---
    label_onehot = jax.nn.one_hot(pred_labels, ncm1 + 2) * valid[:, None]
    counts = in_frame.astype(jnp.float32) @ label_onehot  # [F, labels]
    modal = counts.argmax(1)  # smallest most-frequent (torch.mode tie-break)
    modal_of_box = modal[frame]  # [N]
    is_dup = valid & (pred_labels == modal_of_box) & frame_has_box[frame]
    modal_col = jnp.clip(modal_of_box - 1, 0, ncm1 - 1)
    dup_score = jnp.take_along_axis(dist, modal_col[:, None], axis=1)[:, 0]
    # keep the best-scored duplicate per frame; reference keeps the LAST
    # index among ties -> reversed argmax
    dup_scores_fr = jnp.where(
        in_frame & is_dup[None, :], dup_score[None, :], _NEG
    )  # [F, N]
    rev = dup_scores_fr[:, ::-1]
    keep_idx = n - 1 - rev.argmax(1)
    keep_mask = (
        jnp.zeros(n, bool)
        .at[jnp.where(frame_has_box & (dup_scores_fr.max(1) > _NEG / 2), keep_idx, n)]
        .set(True, mode="drop")
    )
    demote = is_dup & ~keep_mask
    dist2 = jnp.where(
        demote[:, None]
        & (jnp.arange(ncm1)[None, :] == modal_col[:, None]),
        0.0,
        dist,
    )
    new_labels = jnp.where(demote, dist2.argmax(1) + 1, pred_labels)
    new_scores = jnp.where(demote, dist2.max(1), pred_scores)

    # --- pair rebuild: human x non-person boxes, frame-major ---
    is_obj = valid & (new_labels != 1) & frame_has_box[frame]
    big = f_cap + 1
    order = jnp.argsort(jnp.where(is_obj, frame, big), stable=True)
    slot_valid = is_obj[order]
    pair_obj = order
    pair_frame = frame[order]
    pair_human = human_idx[jnp.clip(pair_frame, 0, f_cap - 1)]
    im_idx = jnp.where(slot_valid, pair_frame, 0)[:p_cap]
    pair_idx = jnp.stack(
        [jnp.where(slot_valid, pair_human, 0), jnp.where(slot_valid, pair_obj, 0)],
        axis=1,
    )[:p_cap]
    pair_mask = slot_valid[:p_cap]

    return entry.replace(
        distribution=dist2,
        pred_labels=new_labels.astype(jnp.int32),
        scores=new_scores,
        im_idx=im_idx.astype(jnp.int32),
        pair_idx=pair_idx.astype(jnp.int32),
        pair_mask=pair_mask,
        human_idx=human_idx.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# sgdet: clean_class expansion + grouped NMS + relabel + pair rebuild
# (exact device port of models/postprocess.sgdet_postprocess)
# ---------------------------------------------------------------------------


def _pairwise_iou(boxes4):
    """Inclusive (+1) IoU matrix, matching the reference Cython convention."""
    area = (boxes4[:, 2] - boxes4[:, 0] + 1) * (boxes4[:, 3] - boxes4[:, 1] + 1)
    iw = (
        jnp.minimum(boxes4[:, None, 2], boxes4[None, :, 2])
        - jnp.maximum(boxes4[:, None, 0], boxes4[None, :, 0])
        + 1
    )
    ih = (
        jnp.minimum(boxes4[:, None, 3], boxes4[None, :, 3])
        - jnp.maximum(boxes4[:, None, 1], boxes4[None, :, 1])
        + 1
    )
    inter = jnp.clip(iw, 0) * jnp.clip(ih, 0)
    return inter / (area[:, None] + area[None, :] - inter)


def _clean_round(fields: dict, valid, frame, cls: int):
    """One clean_class round (lib/tempura.py:114-158): duplicate boxes whose
    current pred_label == cls with the class column zeroed and the runner-up
    label, appended per frame after that frame's current rows."""
    m = valid.shape[0]
    dist = fields["distribution"]
    dup_src = valid & (fields["pred_labels"] == cls)
    dup_dist = dist.at[:, cls - 1].set(0.0)
    dup_fields = dict(fields)
    dup_fields["distribution"] = dup_dist
    dup_fields["pred_labels"] = dup_dist.argmax(1) + 1
    dup_fields["scores"] = dup_dist.max(1)

    slot = jnp.arange(m, dtype=jnp.int32)
    key_orig = jnp.where(valid, frame * (2 * m) + slot, _BIG)
    key_dup = jnp.where(dup_src, frame * (2 * m) + m + slot, _BIG)
    keys = jnp.concatenate([key_orig, key_dup])
    order = jnp.argsort(keys, stable=True)[:m]
    src = order % m
    from_dup = order >= m
    new_valid = keys[order] < _BIG
    overflow = dup_src.sum() + valid.sum() > m

    out = {}
    for k, v in fields.items():
        dup_v = dup_fields[k]
        picked = jnp.where(
            from_dup.reshape((-1,) + (1,) * (v.ndim - 1)), dup_v[src], v[src]
        )
        out[k] = picked * new_valid.reshape((-1,) + (1,) * (v.ndim - 1)).astype(
            picked.dtype
        ) if v.dtype != bool else picked & new_valid
    return out, new_valid, frame[src] * new_valid, overflow


def _grouped_nms(boxes4, scores, group, valid, thresh):
    """Greedy NMS restricted to same-group boxes, in global score-descending
    (stable) order — equivalent to the host's per-(frame, class) greedy."""
    m = valid.shape[0]
    iou = _pairwise_iou(boxes4)
    same = group[:, None] == group[None, :]
    sorted_idx = jnp.argsort(jnp.where(valid, -scores, jnp.inf), stable=True)

    def body(k, keep):
        i = sorted_idx[k]
        suppressed = (keep & same[i] & (iou[i] > thresh)).any()
        return keep.at[i].set(valid[i] & ~suppressed)

    keep = jax.lax.fori_loop(0, m, body, jnp.zeros(m, bool))
    rank = jnp.zeros(m, jnp.int32).at[sorted_idx].set(
        jnp.arange(m, dtype=jnp.int32)
    )
    return keep, rank


def _labels_and_human(dist, frame, valid, frame_mask):
    """distribution[:, 1:] argmax + 2; per-frame human = best person score
    (lib/tempura.py:263-275). Shared by the sgcls and sgdet device paths."""
    f_cap = frame_mask.shape[0]
    n = dist.shape[0]
    pred_scores = jnp.where(valid, dist[:, 1:].max(1), 0.0)
    pred_labels = jnp.where(valid, dist[:, 1:].argmax(1) + 2, 0)
    in_frame = (frame[None, :] == jnp.arange(f_cap)[:, None]) & valid[None, :]
    person_scores = jnp.where(in_frame, dist[None, :, 0], _NEG)
    human_idx = person_scores.argmax(1)
    frame_has_box = in_frame.any(1) & frame_mask
    is_human = (
        jnp.zeros(n, bool)
        .at[jnp.where(frame_has_box, human_idx, n)]
        .set(True, mode="drop")
    )
    pred_labels = jnp.where(is_human, 1, pred_labels)
    pred_scores = jnp.where(is_human, dist[:, 0], pred_scores)
    return pred_labels, pred_scores, human_idx, in_frame, frame_has_box


def _rebuild_pairs_device(frame, valid, labels, human_idx, frame_has_box,
                          f_cap, p_cap):
    """human x non-person boxes per frame, frame-major (lib/tempura.py:293-303)."""
    is_obj = valid & (labels != 1) & frame_has_box[jnp.clip(frame, 0, f_cap - 1)]
    big = f_cap + 1
    order = jnp.argsort(jnp.where(is_obj, frame, big), stable=True)
    slot_valid = is_obj[order]
    pair_frame = frame[order]
    pair_human = human_idx[jnp.clip(pair_frame, 0, f_cap - 1)]
    im_idx = jnp.where(slot_valid, pair_frame, 0)[:p_cap]
    pair_idx = jnp.stack(
        [jnp.where(slot_valid, pair_human, 0), jnp.where(slot_valid, order, 0)],
        axis=1,
    )[:p_cap]
    return im_idx.astype(jnp.int32), pair_idx.astype(jnp.int32), slot_valid[:p_cap]


def sgdet_postprocess_device(
    entry: Entry,
    distribution: jnp.ndarray,
    mem_features: jnp.ndarray,
    expand: int = 2,
    nms_thresh: float = 0.6,
    clean_classes: tuple = (5, 8, 17),
):
    """entry (detector labels in ``pred_labels``) + OSPU test distribution ->
    (relabeled entry on a ``expand * N`` object axis, gathered mem features,
    overflow flag). Pair capacity = expanded object capacity."""
    n = distribution.shape[0]
    m = expand * n
    ncls = distribution.shape[1]
    f_cap = entry.frame_mask.shape[0]

    def grow(a):
        return jnp.zeros((m,) + a.shape[1:], a.dtype).at[:n].set(a)

    fields = {
        "boxes": grow(entry.boxes),
        "distribution": grow(distribution * entry.obj_mask[:, None]),
        "features": grow(entry.features),
        "mem_features": grow(mem_features),
        # clean_class keys off the DETECTOR's labels before OSPU relabeling
        # (lib/tempura.py:331-333)
        "pred_labels": grow(entry.pred_labels.astype(jnp.int32)),
        "scores": grow(entry.scores),
        "labels": grow(entry.labels.astype(jnp.int32)),
    }
    valid = jnp.zeros(m, bool).at[:n].set(entry.obj_mask)
    frame = fields["boxes"][:, 0].astype(jnp.int32)

    overflow = jnp.asarray(False)
    for cls in clean_classes:
        fields, valid, frame, ovf = _clean_round(fields, valid, frame, cls)
        overflow |= ovf

    # per-(frame, argmax-class) NMS at 0.6 (lib/tempura.py:355-375)
    dist = fields["distribution"]
    argmax_cls = dist.argmax(1)
    group = frame * ncls + argmax_cls
    keep, rank = _grouped_nms(
        fields["boxes"][:, 1:], dist.max(1), group, valid, nms_thresh
    )

    # reference final order: lexsort by (frame, class), stable over NMS-keep
    # (= score-descending) order
    key = jnp.where(keep, (frame * ncls + argmax_cls) * m + rank, _BIG)
    order = jnp.argsort(key, stable=True)
    new_valid = key[order] < _BIG
    for k in fields:
        v = fields[k][order]
        mask = new_valid.reshape((-1,) + (1,) * (v.ndim - 1))
        fields[k] = v & new_valid if v.dtype == bool else v * mask.astype(v.dtype)
    valid = new_valid
    frame = fields["boxes"][:, 0].astype(jnp.int32) * valid

    dist = fields["distribution"]
    pred_labels, pred_scores, human_idx, _, frame_has_box = _labels_and_human(
        dist, frame, valid, entry.frame_mask
    )
    im_idx, pair_idx, pair_mask = _rebuild_pairs_device(
        frame, valid, pred_labels, human_idx, frame_has_box, f_cap, m
    )

    union_hw = entry.union_feat.shape[1]
    union_ch = entry.union_feat.shape[-1]
    mask_s = entry.spatial_masks.shape[-1]
    entry2 = entry.replace(
        boxes=fields["boxes"],
        labels=fields["labels"],
        scores=pred_scores,
        distribution=dist,
        pred_labels=pred_labels.astype(jnp.int32),
        features=fields["features"],
        obj_mask=valid,
        im_idx=im_idx,
        pair_idx=pair_idx,
        pair_mask=pair_mask,
        union_feat=jnp.zeros((m, union_hw, union_hw, union_ch), jnp.float32),
        spatial_masks=jnp.zeros((m, 2, mask_s, mask_s), jnp.float32),
        attention_gt=jnp.zeros((m,), jnp.int32),
        spatial_gt=jnp.zeros((m, entry.spatial_gt.shape[1]), jnp.float32),
        contacting_gt=jnp.zeros((m, entry.contacting_gt.shape[1]), jnp.float32),
        human_idx=human_idx.astype(jnp.int32),
    )
    return entry2, fields["mem_features"], overflow
