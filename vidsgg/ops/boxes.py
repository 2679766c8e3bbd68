"""Box utilities (xyxy convention, inclusive-pixel "+1" areas).

TPU-native replacements for the reference's Cython/CPU helpers:

* ``bbox_overlaps`` — pairwise IoU matrix, reference
  tools/utils/fpn/box_intersections_cpu (gitignored Cython; the jwyang /
  neural-motifs lineage uses the inclusive ``+1`` width/height convention,
  consumed at tools/utils/evaluation_recall.py:417-422 and
  tools/utils/funcs.py:37).
* ``center_size`` — xyxy -> (cx, cy, w, h), reference
  tools/utils/fpn/box_utils.center_size (call sites lib/tempura.py:251,
  tools/utils/object_classifier.py:242).
* ``bbox_transform_inv`` / ``clip_boxes`` — Faster R-CNN box decoding,
  reference tools/fasterRCNN/lib/model/rpn/bbox_transform (call site
  tools/utils/object_detector.py:105-106).
* ``box_union`` — per-pair union boxes (object_detector.py:372-373).

All functions are shape-polymorphic pure jnp and safe under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_overlaps(boxes: jnp.ndarray, query_boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between ``boxes`` [N,4] and ``query_boxes`` [K,4].

    Uses the inclusive-pixel convention ``w = x2 - x1 + 1`` of the reference's
    Cython kernel, so values match the reference evaluator bit-for-bit.
    """
    boxes = boxes.astype(jnp.float32)
    query_boxes = query_boxes.astype(jnp.float32)
    area_q = (query_boxes[:, 2] - query_boxes[:, 0] + 1.0) * (
        query_boxes[:, 3] - query_boxes[:, 1] + 1.0
    )  # [K]
    area_b = (boxes[:, 2] - boxes[:, 0] + 1.0) * (
        boxes[:, 3] - boxes[:, 1] + 1.0
    )  # [N]
    iw = (
        jnp.minimum(boxes[:, None, 2], query_boxes[None, :, 2])
        - jnp.maximum(boxes[:, None, 0], query_boxes[None, :, 0])
        + 1.0
    )
    ih = (
        jnp.minimum(boxes[:, None, 3], query_boxes[None, :, 3])
        - jnp.maximum(boxes[:, None, 1], query_boxes[None, :, 1])
        + 1.0
    )
    inter = jnp.clip(iw, 0.0) * jnp.clip(ih, 0.0)
    union = area_b[:, None] + area_q[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def center_size(boxes: jnp.ndarray) -> jnp.ndarray:
    """xyxy -> (cx, cy, w, h) with inclusive widths (w = x2-x1+1).

    Matches fpn/box_utils.center_size: cx = x1 + 0.5*(w-1).
    """
    wh = boxes[..., 2:4] - boxes[..., 0:2] + 1.0
    ctr = boxes[..., 0:2] + 0.5 * (wh - 1.0)
    return jnp.concatenate([ctr, wh], axis=-1)


def box_union(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise union of two aligned box sets [..., 4] (xyxy)."""
    lo = jnp.minimum(boxes_a[..., 0:2], boxes_b[..., 0:2])
    hi = jnp.maximum(boxes_a[..., 2:4], boxes_b[..., 2:4])
    return jnp.concatenate([lo, hi], axis=-1)


def bbox_transform_inv(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Decode class-specific regression deltas onto anchor/proposal boxes.

    boxes: [..., N, 4] xyxy; deltas: [..., N, 4*C] (dx,dy,dw,dh per class).
    Returns [..., N, 4*C] decoded boxes. Mirrors the jwyang Faster R-CNN
    ``bbox_transform_inv`` used at object_detector.py:105.
    """
    widths = boxes[..., 2] - boxes[..., 0] + 1.0
    heights = boxes[..., 3] - boxes[..., 1] + 1.0
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    shape = deltas.shape[:-1] + (deltas.shape[-1] // 4, 4)
    d = deltas.reshape(shape)
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]

    pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
    pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    out = jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=-1,
    )
    return out.reshape(deltas.shape)


def clip_boxes(boxes: jnp.ndarray, im_hw: jnp.ndarray) -> jnp.ndarray:
    """Clip xyxy(-packed) boxes [..., 4*C] to image bounds [H, W].

    Matches jwyang ``clip_boxes`` (clamps to 0 .. size-1), object_detector.py:106.

    ``im_hw`` is ``[2]`` (one size for every box) or ``[..., 2]`` with
    leading axes aligned to ``boxes``'s leading axes (per-frame sizes — the
    multi-video batched detect packs frames from videos of different true
    resolutions into one dispatch).
    """
    im_hw = jnp.asarray(im_hw)
    h, w = im_hw[..., 0], im_hw[..., 1]
    shape = boxes.shape[:-1] + (boxes.shape[-1] // 4, 4)
    b = boxes.reshape(shape)
    # align h/w ([..] leading axes) against b[..., 0] ([.., N, C]) by
    # appending broadcast axes
    extra = b[..., 0].ndim - h.ndim
    h = h.reshape(h.shape + (1,) * extra)
    w = w.reshape(w.shape + (1,) * extra)
    x1 = jnp.clip(b[..., 0], 0.0, w - 1.0)
    y1 = jnp.clip(b[..., 1], 0.0, h - 1.0)
    x2 = jnp.clip(b[..., 2], 0.0, w - 1.0)
    y2 = jnp.clip(b[..., 3], 0.0, h - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(boxes.shape)
