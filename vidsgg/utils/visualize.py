"""Visualization & prediction export.

Covers the reference's observability surface (tools/utils/visualize.py):

* :func:`kcc_prediction_json` — the KCC demo's per-frame triplet JSON
  (Log_KCC_Data_Prediction, visualize.py:135-174): for each frame, each
  pair becomes ``triplet_XX: {subject, attention_rel, spatial_rel,
  contact_rel, object}`` with argmax predicates.
* :func:`draw_scene_graph` — pred box + triplet overlay on a frame
  (matplotlib, optional import).
* :func:`draw_gt_scene_graph` — GT-side overlay from the AG-format
  annotation: person box red, object boxes blue, one
  ``Person <att & spa & con> obj`` text line per GT object
  (Viz_GT_Scene_Graph, visualize.py:53-78; ``boxes_only=True`` is
  Viz_BBox_in_Scene :187-201, and an empty gt_frame degenerates to
  Viz_Just_Scene :204-217).
* :func:`temporal_consistency_plot` — per object class, the GT one-hot
  contact matrix next to the predicted contact distributions over time
  (Viz_Temporal_Consistency + Viz_Logit_Matrix, visualize.py:256-293).
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


def draw_gt_scene_graph(frame_bgr, gt_frame, out_path: str,
                        object_classes=None, boxes_only: bool = False):
    """GT-side scene-graph overlay for one frame from the AG-format
    annotation (Viz_GT_Scene_Graph, tools/utils/visualize.py:53-78):
    the person box in red, each GT object box in blue, and — unless
    ``boxes_only`` (Viz_BBox_in_Scene, :187-201) — one
    ``Person <att & spa & con> obj`` line per object from the GT
    relationship ids. ``gt_frame`` is one element of the gt_annotation
    list: ``[{'person_bbox': [1,4]}, {'class', 'bbox',
    'attention_relationship', ...}, ...]``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    object_classes = object_classes or list(C.AG_OBJECT_CLASSES)
    fig, ax = plt.subplots(1, figsize=(10, 6))
    ax.imshow(frame_bgr[..., ::-1].astype(np.uint8))

    def _rect(b, color):
        ax.add_patch(plt.Rectangle(
            (b[0], b[1]), b[2] - b[0], b[3] - b[1],
            fill=False, edgecolor=color, linewidth=2))

    lines = []
    if gt_frame:
        pb = np.asarray(gt_frame[0]["person_bbox"]).reshape(-1)[:4]
        _rect(np.round(pb).astype(int), "red")
        for od in gt_frame[1:]:
            ob = np.round(np.asarray(od["bbox"], float)).astype(int)
            _rect(ob, "blue")
            if boxes_only:
                continue
            # the reference prints the FIRST gt id of each multi-label
            # field (Get_GT_Scene_Graph, visualize.py:79-88)
            att = C.AG_ATTENTION_RELATIONSHIPS[
                int(np.asarray(od["attention_relationship"]).reshape(-1)[0])]
            spa = C.AG_SPATIAL_RELATIONSHIPS[
                int(np.asarray(od["spatial_relationship"]).reshape(-1)[0])]
            con = C.AG_CONTACTING_RELATIONSHIPS[
                int(np.asarray(od["contacting_relationship"]).reshape(-1)[0])]
            lines.append(
                f"Person <{att} & {spa} & {con}> "
                f"{object_classes[int(od['class'])]}")
    if lines:
        ax.set_title("; ".join(lines[:4]), fontsize=8)
    ax.axis("off")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight", dpi=110)
    plt.close(fig)


def temporal_consistency_plot(pred: dict, out_dir: str, object_classes=None):
    """Per-object-class temporal-consistency matrices
    (Viz_Temporal_Consistency + Viz_Logit_Matrix,
    tools/utils/visualize.py:256-293): for each unique non-person object
    class among the pair objects, the GT contact one-hot rows (first gt
    id per pair, :262) next to the predicted contacting distributions,
    one ``<obj>.png`` per class. Returns the list of written paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    object_classes = object_classes or list(C.AG_OBJECT_CLASSES)
    con = np.asarray(pred["contacting_distribution"])
    gt_first = np.array(
        [int(np.asarray(g).reshape(-1)[0]) for g in pred["contacting_gt"]])
    labels = np.asarray(pred.get("pred_labels", pred.get("labels")))
    pair_idx = np.asarray(pred["pair_idx"])
    obj_label = labels[pair_idx[:, 1]]  # pair objects (person excluded)

    written = []
    n = min(len(con), len(gt_first), len(obj_label))
    for target in np.unique(obj_label[:n]):
        if int(target) == 1:  # person
            continue
        sel = obj_label[:n] == target
        onehot = np.zeros((int(sel.sum()), con.shape[1]))
        onehot[np.arange(len(onehot)), gt_first[:n][sel]] = 1.0
        fig, axes = plt.subplots(1, 2, figsize=(12, 6))
        axes[0].matshow(onehot, aspect="auto")
        axes[0].set_title("GT contact (one-hot)")
        axes[1].matshow(con[:n][sel], aspect="auto")
        axes[1].set_title("pred contact distribution")
        for ax in axes:
            ax.set_xlabel("class")
            ax.set_ylabel("pair (time order)")
        name = object_classes[int(target)].replace("/", "_")
        out_path = os.path.join(out_dir, f"tempcons_{name}.png")
        os.makedirs(out_dir, exist_ok=True)
        fig.savefig(out_path, bbox_inches="tight", dpi=110)
        plt.close(fig)
        written.append(out_path)
    return written


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
