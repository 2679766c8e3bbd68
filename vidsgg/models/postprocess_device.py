"""On-device sgcls test-time postprocess.

A jit-able, exact re-derivation of the host relabeling in
:mod:`vidsgg.models.postprocess` (itself a port of lib/tempura.py:259-316):
label assignment, per-frame human selection, one-round modal-class
duplicate suppression, and the pair rebuild — all as masked ops on the
padded Entry, so sgcls evaluation runs as ONE jit region
(classify -> relabel -> union refeaturize -> relation transformer) with no
host round trip. sgdet keeps the host path (clean_class grows the object
axis, which is inherently a re-bucketing step).

Exactness notes (verified against the host version in tests):
* torch.mode picks the smallest most-frequent label — argmax over label
  bincounts reproduces that tie-break;
* the reference keeps the *last* (by index) of equally-scored modal
  duplicates (stable ascending argsort, drop-last) — reproduced with a
  reversed argmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vidsgg.data.entry import Entry

_NEG = -1e9


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
