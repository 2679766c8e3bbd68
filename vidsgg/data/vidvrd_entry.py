"""Padded generic-pair entries for VidVRD-style relation detection.

The reference declares VidVRD support but ships a 0-LoC stub
(/root/reference/dataloader/VidVRD/vidvrd.py); this module defines the
missing data path the TPU way: fixed-capacity arrays + masks so the whole
video (or each chunk of a long video) is ONE compiled region.

Unlike Action Genome, VidVRD pairs are generic (subject, object) — there is
no distinguished person box — and the supervision is a multi-hot predicate
set per (frame, subject-track, object-track). Long videos (hundreds of
frames) are split into ``cap.max_frames``-frame chunks, mirroring the
reference's 10-frame detector chunking strategy (object_detector.py:69-76)
at the relation level: temporal attention spans a chunk, which matches the
reference STTran's window-2 horizon anyway (transformer.py:209).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import struct

from vidsgg.data.entry import EntryCapacity


class GenericEntry(struct.PyTreeNode):
    """One video chunk of generic subject-object pair tokens.

    Object axis: one row per (frame, track) occurrence, like the AG entry's
    flattened box list (object_detector.py:382-455) but with no person slot.
    """

    boxes: jnp.ndarray         # [N, 5] (frame_idx, x1, y1, x2, y2)
    labels: jnp.ndarray        # [N] object class (0 = padding/background)
    obj_mask: jnp.ndarray      # [N] bool

    im_idx: jnp.ndarray        # [P] frame index per pair
    pair_idx: jnp.ndarray      # [P, 2] (subject, object) rows in object axis
    pair_mask: jnp.ndarray     # [P] bool
    predicate_gt: jnp.ndarray  # [P, R] multi-hot predicate supervision

    num_frames: jnp.ndarray    # [] int (valid frames in this chunk)
    frame_offset: jnp.ndarray  # [] int (chunk start in the source video)

    @classmethod
    def zeros(cls, cap: EntryCapacity, num_predicates: int) -> "GenericEntry":
        n, p, f = cap.max_objs, cap.max_pairs, cap.max_frames
        del f
        return cls(
            boxes=jnp.zeros((n, 5), jnp.float32),
            labels=jnp.zeros((n,), jnp.int32),
            obj_mask=jnp.zeros((n,), bool),
            im_idx=jnp.zeros((p,), jnp.int32),
            pair_idx=jnp.zeros((p, 2), jnp.int32),
            pair_mask=jnp.zeros((p,), bool),
            predicate_gt=jnp.zeros((p, num_predicates), jnp.float32),
            num_frames=jnp.zeros((), jnp.int32),
            frame_offset=jnp.zeros((), jnp.int32),
        )


@dataclasses.dataclass
class ChunkStats:
    """Honest accounting: what the chunker kept vs dropped."""

    chunks: int = 0
    frames: int = 0
    objs: int = 0
    pairs: int = 0
    dropped_objs: int = 0
    dropped_pairs: int = 0


def build_vidvrd_entries(
    frames: list[dict],
    cap: EntryCapacity,
    num_predicates: int,
    stats: ChunkStats | None = None,
) -> list[GenericEntry]:
    """Convert ``VidVRD.video_annotation`` output into padded chunk entries.

    ``frames[fid]`` has ``boxes`` (tid -> xyxy), ``classes`` (tid -> class)
    and ``relations`` ([(subj_tid, obj_tid, predicate)]); multiple predicates
    on the same (frame, subj, obj) merge into one multi-hot pair row.

    Chunks are greedy: a chunk closes when adding the next frame would
    exceed any capacity; overfull single frames are truncated (counted in
    ``stats`` — nothing is dropped silently).
    """
    if stats is None:
        stats = ChunkStats()

    entries: list[GenericEntry] = []
    cur: list[tuple[int, dict]] = []  # (source fid, frame dict)

    def frame_load(fr):
        n_obj = len(fr["boxes"])
        n_pair = len({(s, o) for s, o, _ in fr["relations"]})
        return n_obj, n_pair

    def flush():
        if cur:
            entries.append(_pack_chunk(cur, cap, num_predicates, stats))
            cur.clear()

    tot_obj = tot_pair = 0
    for fid, fr in enumerate(frames):
        n_obj, n_pair = frame_load(fr)
        if cur and (
            len(cur) + 1 > cap.max_frames
            or tot_obj + n_obj > cap.max_objs
            or tot_pair + n_pair > cap.max_pairs
        ):
            flush()
            tot_obj = tot_pair = 0
        cur.append((fid, fr))
        tot_obj += n_obj
        tot_pair += n_pair
    flush()
    return entries


def _pack_chunk(
    cur: list[tuple[int, dict]],
    cap: EntryCapacity,
    num_predicates: int,
    stats: ChunkStats,
) -> GenericEntry:
    boxes, labels = [], []
    im_idx, pair_idx, pred_rows = [], [], []
    offset = cur[0][0]

    for local_f, (_, fr) in enumerate(cur):
        tid_row: dict[int, int] = {}
        for tid in sorted(fr["boxes"]):
            if len(boxes) >= cap.max_objs:
                stats.dropped_objs += 1
                continue
            tid_row[tid] = len(boxes)
            boxes.append(np.concatenate([[local_f], fr["boxes"][tid]]))
            labels.append(fr["classes"][tid])
        merged: dict[tuple[int, int], np.ndarray] = {}
        for s, o, pred in fr["relations"]:
            if s not in tid_row or o not in tid_row:
                stats.dropped_pairs += 1
                continue
            key = (tid_row[s], tid_row[o])
            if key not in merged:
                merged[key] = np.zeros(num_predicates, np.float32)
            merged[key][pred] = 1.0
        for (srow, orow), hot in merged.items():
            if len(pair_idx) >= cap.max_pairs:
                stats.dropped_pairs += 1
                continue
            im_idx.append(local_f)
            pair_idx.append([srow, orow])
            pred_rows.append(hot)

    n, p = len(boxes), len(pair_idx)
    stats.chunks += 1
    stats.frames += len(cur)
    stats.objs += n
    stats.pairs += p

    def pad(rows, k, width=None, dtype=np.float32):
        shape = (k,) if width is None else (k, width)
        out = np.zeros(shape, dtype)
        if rows:
            out[: len(rows)] = np.asarray(rows, dtype)
        return out

    return GenericEntry(
        boxes=jnp.asarray(pad(boxes, cap.max_objs, 5)),
        labels=jnp.asarray(pad(labels, cap.max_objs, dtype=np.int32)),
        obj_mask=jnp.arange(cap.max_objs) < n,
        im_idx=jnp.asarray(pad(im_idx, cap.max_pairs, dtype=np.int32)),
        pair_idx=jnp.asarray(pad(pair_idx, cap.max_pairs, 2, np.int32)),
        pair_mask=jnp.arange(cap.max_pairs) < p,
        predicate_gt=jnp.asarray(pad(pred_rows, cap.max_pairs, num_predicates)),
        num_frames=jnp.asarray(len(cur), jnp.int32),
        frame_offset=jnp.asarray(offset, jnp.int32),
    )
