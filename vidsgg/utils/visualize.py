"""Visualization & prediction export.

Covers the reference's observability surface (tools/utils/visualize.py):

* :func:`kcc_prediction_json` — the KCC demo's per-frame triplet JSON
  (Log_KCC_Data_Prediction, visualize.py:135-174): for each frame, each
  pair becomes ``triplet_XX: {subject, attention_rel, spatial_rel,
  contact_rel, object}`` with argmax predicates.
* :func:`draw_scene_graph` — GT/pred box + triplet overlay on a frame
  (matplotlib, optional import).
"""

from __future__ import annotations

import json
import os

import numpy as np

from vidsgg import constants as C


def kcc_prediction_json(video_name: str, pred: dict, object_classes=None):
    """pred dict (NumPy, evaluator schema) -> the KCC JSON structure."""
    object_classes = object_classes or list(C.AG_OBJECT_CLASSES)
    att = np.asarray(pred["attention_distribution"])
    spa = np.asarray(pred["spatial_distribution"])
    con = np.asarray(pred["contacting_distribution"])
    pair_idx = np.asarray(pred["pair_idx"])
    im_idx = np.asarray(pred["im_idx"])
    labels = np.asarray(pred.get("pred_labels", pred.get("labels")))

    out: dict = {video_name: {}}
    for f in np.unique(im_idx):
        frame_key = f"frame_{int(f):06d}"
        out[video_name][frame_key] = {}
        sel = np.where(im_idx == f)[0]
        for t, i in enumerate(sel):
            s_cls = int(labels[pair_idx[i, 0]])
            o_cls = int(labels[pair_idx[i, 1]])
            out[video_name][frame_key][f"triplet_{t:02d}"] = {
                "subject": object_classes[s_cls],
                "attention_rel": C.AG_ATTENTION_RELATIONSHIPS[int(att[i].argmax())],
                "spatial_rel": C.AG_SPATIAL_RELATIONSHIPS[int(spa[i].argmax())],
                "contact_rel": C.AG_CONTACTING_RELATIONSHIPS[int(con[i].argmax())],
                "object": object_classes[o_cls],
            }
    return out


def dump_kcc_predictions(path: str, predictions: dict):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(predictions, f, indent=2)


def draw_scene_graph(frame_bgr, pred: dict, frame_idx: int, out_path: str,
                     object_classes=None, score_thresh: float = 0.0):
    """Overlay boxes + top triplets for one frame; saves a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    object_classes = object_classes or list(C.AG_OBJECT_CLASSES)
    boxes = np.asarray(pred["boxes"])
    labels = np.asarray(pred.get("pred_labels", pred.get("labels")))
    sel = boxes[:, 0].astype(int) == frame_idx

    fig, ax = plt.subplots(1, figsize=(10, 6))
    ax.imshow(frame_bgr[..., ::-1].astype(np.uint8))
    for b, l in zip(boxes[sel, 1:], labels[sel]):
        ax.add_patch(
            plt.Rectangle(
                (b[0], b[1]), b[2] - b[0], b[3] - b[1],
                fill=False, edgecolor="lime" if l == 1 else "orange", linewidth=2,
            )
        )
        ax.text(b[0], b[1] - 2, object_classes[int(l)], color="white",
                fontsize=8, bbox=dict(facecolor="black", alpha=0.6, pad=1))
    im_idx = np.asarray(pred["im_idx"])
    att = np.asarray(pred["attention_distribution"])
    con = np.asarray(pred["contacting_distribution"])
    lines = []
    for i in np.where(im_idx == frame_idx)[0]:
        pi = np.asarray(pred["pair_idx"])[i]
        lines.append(
            f"{object_classes[int(labels[pi[0]])]}-"
            f"{C.AG_CONTACTING_RELATIONSHIPS[int(con[i].argmax())]}-"
            f"{object_classes[int(labels[pi[1]])]}"
            f" ({C.AG_ATTENTION_RELATIONSHIPS[int(att[i].argmax())]})"
        )
    ax.set_title("; ".join(lines[:4]), fontsize=8)
    ax.axis("off")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", dpi=110)
    plt.close(fig)


def tsne_contact_logits(pred: dict, out_path: str, perplexity: float = 15.0):
    """t-SNE of contacting-head outputs colored by GT contact class
    (reference Viz_TSNE in tools/utils/visualize.py; sklearn optional)."""
    from sklearn.manifold import TSNE  # optional heavy import
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    con = np.asarray(pred["contacting_distribution"])
    labels = np.array([int(np.asarray(l).reshape(-1)[0]) for l in pred["contacting_gt"]])
    n = min(len(con), len(labels))
    emb = TSNE(
        n_components=2, perplexity=min(perplexity, max(2, n - 2)), init="random"
    ).fit_transform(con[:n])
    fig, ax = plt.subplots(figsize=(7, 6))
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=labels[:n], cmap="tab20", s=14)
    fig.colorbar(sc, ax=ax, label="GT contacting class")
    ax.set_title("t-SNE of contacting distributions")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", dpi=110)
    plt.close(fig)


def gt_vs_pred_matrix(pred: dict, out_path: str):
    """GT multi-hot vs predicted distribution heatmaps for the spatial and
    contacting heads (reference Viz logit-matrix plots)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    spa = np.asarray(pred["spatial_distribution"])
    con = np.asarray(pred["contacting_distribution"])
    gt_s = np.zeros_like(spa)
    gt_c = np.zeros_like(con)
    for i, ls in enumerate(pred["spatial_gt"]):
        gt_s[i, np.asarray(ls, int)] = 1.0
    for i, ls in enumerate(pred["contacting_gt"]):
        gt_c[i, np.asarray(ls, int)] = 1.0
    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    for ax, (mat, title) in zip(
        axes.ravel(),
        [(gt_s, "spatial GT"), (spa, "spatial pred"),
         (gt_c, "contacting GT"), (con, "contacting pred")],
    ):
        ax.imshow(mat, aspect="auto", cmap="viridis", vmin=0, vmax=1)
        ax.set_title(title)
        ax.set_xlabel("class")
        ax.set_ylabel("pair")
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
