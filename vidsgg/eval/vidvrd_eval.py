"""VidVRD relation evaluation (predcls-style relation tagging).

The reference ships no VidVRD evaluation (its loader is a 0-LoC stub).
This implements the standard *relation tagging* protocol from the VidVRD
release: rank (subject_class, predicate, object_class) triplets per video
by confidence and report Precision@K / Recall@K of the video-level GT
triplet set, plus a per-frame Recall@K in the predcls setting (GT boxes
and labels given, predicates predicted) that matches how the AG evaluator
scores with-constraint recall (tools/utils/evaluation_recall.py semantics,
generalized to a flat predicate space).

Pure NumPy, mirroring :mod:`vidsgg.eval.evaluator`'s design: evaluation is
host-side bookkeeping over small arrays, so keeping it off-device costs
nothing and keeps the semantics trivially auditable.
"""

from __future__ import annotations

import numpy as np


class VidVRDEvaluator:
    """Accumulates per-video tagging P/R@K and per-frame recall@K."""

    def __init__(self, ks=(1, 5, 10), frame_ks=(10, 20, 50)):
        self.ks = tuple(ks)
        self.frame_ks = tuple(frame_ks)
        self.reset()

    def reset(self):
        self._tag_prec = {k: [] for k in self.ks}
        self._tag_rec = {k: [] for k in self.ks}
        self._frame_rec = {k: [] for k in self.frame_ks}

    def add_video(self, chunks: list[dict]):
        """``chunks``: list of per-chunk dicts with NumPy arrays

        - ``scores``  [P, R] predicate probabilities,
        - ``pair_mask`` [P] bool,
        - ``im_idx`` [P] local frame per pair,
        - ``frame_offset`` scalar,
        - ``subj_cls`` / ``obj_cls`` [P],
        - ``predicate_gt`` [P, R] multi-hot.
        """
        trip_scores: dict[tuple, float] = {}
        gt_trips: set[tuple] = set()
        frame_rows = {}  # global fid -> (list of (score, triplet), set of gt)

        for ch in chunks:
            pm = ch["pair_mask"].astype(bool)
            for p in np.where(pm)[0]:
                fid = int(ch["im_idx"][p]) + int(ch["frame_offset"])
                s_cls, o_cls = int(ch["subj_cls"][p]), int(ch["obj_cls"][p])
                rows = frame_rows.setdefault(fid, ([], set()))
                for r, sc in enumerate(ch["scores"][p]):
                    trip = (s_cls, r, o_cls)
                    sc = float(sc)
                    if sc > trip_scores.get(trip, -1.0):
                        trip_scores[trip] = sc
                    rows[0].append((sc, (p, r, s_cls, o_cls)))
                for r in np.where(ch["predicate_gt"][p] > 0)[0]:
                    gt_trips.add((s_cls, int(r), o_cls))
                    rows[1].add((int(p), int(r)))

        # ---- video-level tagging P/R@K over unique class triplets ----
        ranked = sorted(trip_scores.items(), key=lambda kv: -kv[1])
        for k in self.ks:
            top = {t for t, _ in ranked[:k]}
            hit = len(top & gt_trips)
            self._tag_prec[k].append(hit / max(k, 1))
            self._tag_rec[k].append(hit / max(len(gt_trips), 1))

        # ---- per-frame recall@K over (pair, predicate) instances ----
        for fid, (preds, gts) in frame_rows.items():
            if not gts:
                continue
            preds.sort(key=lambda t: -t[0])
            for k in self.frame_ks:
                top = {(p, r) for _, (p, r, _, _) in preds[:k]}
                self._frame_rec[k].append(len(top & gts) / len(gts))

    def summarize(self) -> dict:
        out = {}
        for k in self.ks:
            out[f"tag_P@{k}"] = float(np.mean(self._tag_prec[k])) if self._tag_prec[k] else 0.0
            out[f"tag_R@{k}"] = float(np.mean(self._tag_rec[k])) if self._tag_rec[k] else 0.0
        for k in self.frame_ks:
            out[f"frame_R@{k}"] = float(np.mean(self._frame_rec[k])) if self._frame_rec[k] else 0.0
        return out


def chunk_outputs(entry, scores) -> dict:
    """Pack one chunk's arrays for :meth:`VidVRDEvaluator.add_video`."""
    pair = np.asarray(entry.pair_idx)
    labels = np.asarray(entry.labels)
    return {
        "scores": np.asarray(scores),
        "pair_mask": np.asarray(entry.pair_mask),
        "im_idx": np.asarray(entry.im_idx),
        "frame_offset": np.asarray(entry.frame_offset),
        "subj_cls": labels[pair[:, 0]],
        "obj_cls": labels[pair[:, 1]],
        "predicate_gt": np.asarray(entry.predicate_gt),
    }
