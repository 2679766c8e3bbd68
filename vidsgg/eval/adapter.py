"""Bridge from padded device outputs to the NumPy evaluator's pred dict.

This is the framework's equivalent of the reference's ``.cpu().numpy()``
boundary (evaluation_recall.py:125-156): trim padding, hand over plain
arrays keyed exactly like the reference entry.

All device fields come over in ONE batched ``jax.device_get`` — per-array
``np.asarray`` fetches each pay a device-transport round trip (~28 ms on a
remote TPU tunnel), which at ~12 fields dominated eval wall time per video.
"""

from __future__ import annotations

import jax
import numpy as np

from vidsgg.data.entry import Entry


def to_eval_pred(entry: Entry, out: dict, mode: str) -> dict:
    (obj_mask, pair_mask, boxes, labels, scores, im_idx, pair_idx,
     att_gt, sp_gt, con_gt, pred_labels, att_d, sp_d, con_d) = jax.device_get((
        entry.obj_mask, entry.pair_mask, entry.boxes, entry.labels,
        entry.scores, entry.im_idx, entry.pair_idx, entry.attention_gt,
        entry.spatial_gt, entry.contacting_gt, entry.pred_labels,
        out["attention_distribution"], out["spatial_distribution"],
        out["contacting_distribution"],
    ))
    n = int(np.asarray(obj_mask).sum())
    p = int(np.asarray(pair_mask).sum())
    pred = {
        "boxes": np.asarray(boxes)[:n],
        "labels": np.asarray(labels)[:n],
        "scores": np.asarray(scores)[:n],
        "im_idx": np.asarray(im_idx)[:p],
        "pair_idx": np.asarray(pair_idx)[:p],
        "attention_distribution": np.asarray(att_d)[:p],
        "spatial_distribution": np.asarray(sp_d)[:p],
        "contacting_distribution": np.asarray(con_d)[:p],
        "attention_gt": [[int(x)] for x in np.asarray(att_gt)[:p]],
        "spatial_gt": [
            np.where(row > 0)[0].tolist() for row in np.asarray(sp_gt)[:p]
        ],
        "contacting_gt": [
            np.where(row > 0)[0].tolist() for row in np.asarray(con_gt)[:p]
        ],
    }
    if mode == "predcls":
        pred["pred_labels"] = pred["labels"]
        pred["pred_scores"] = pred["scores"]
    else:
        pred["pred_labels"] = np.asarray(pred_labels)[:n]
        pred["pred_scores"] = np.asarray(scores)[:n]
    return pred
