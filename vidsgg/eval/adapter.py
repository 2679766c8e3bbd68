"""Bridge from padded device outputs to the NumPy evaluator's pred dict.

This is the framework's equivalent of the reference's ``.cpu().numpy()``
boundary (evaluation_recall.py:125-156): trim padding, hand over plain
arrays keyed exactly like the reference entry."""

from __future__ import annotations

import numpy as np

from vidsgg.data.entry import Entry


def to_eval_pred(entry: Entry, out: dict, mode: str) -> dict:
    n = int(np.asarray(entry.obj_mask).sum())
    p = int(np.asarray(entry.pair_mask).sum())
    pred = {
        "boxes": np.asarray(entry.boxes)[:n],
        "labels": np.asarray(entry.labels)[:n],
        "scores": np.asarray(entry.scores)[:n],
        "im_idx": np.asarray(entry.im_idx)[:p],
        "pair_idx": np.asarray(entry.pair_idx)[:p],
        "attention_distribution": np.asarray(out["attention_distribution"])[:p],
        "spatial_distribution": np.asarray(out["spatial_distribution"])[:p],
        "contacting_distribution": np.asarray(out["contacting_distribution"])[:p],
        "attention_gt": [
            [int(x)] for x in np.asarray(entry.attention_gt)[:p]
        ],
        "spatial_gt": [
            np.where(row > 0)[0].tolist()
            for row in np.asarray(entry.spatial_gt)[:p]
        ],
        "contacting_gt": [
            np.where(row > 0)[0].tolist()
            for row in np.asarray(entry.contacting_gt)[:p]
        ],
    }
    if mode == "predcls":
        pred["pred_labels"] = pred["labels"]
        pred["pred_scores"] = pred["scores"]
    else:
        pred["pred_labels"] = np.asarray(entry.pred_labels)[:n]
        pred["pred_scores"] = np.asarray(entry.scores)[:n]
    return pred
