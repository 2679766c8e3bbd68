"""Masked, fixed-shape non-maximum suppression.

Replaces the reference's CUDA ``roi_layers.nms`` (thresh 0.4 in the detector
— object_detector.py:129; thresh 0.6 in the sgdet object classifier —
lib/tempura.py:369). The reference loops over classes in Python and calls a
CUDA kernel on data-dependent slices; here NMS is a pure function over padded
buffers with a validity mask so it can live inside a jitted step and be
vmapped over (frame, class) grids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vidsgg.ops.boxes import bbox_overlaps


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
) -> jnp.ndarray:
    """Greedy NMS. Returns a boolean keep mask in the original index order.

    Args:
      boxes: [N, 4] xyxy.
      scores: [N] scores (used only for ordering).
      valid: [N] bool mask of real entries.
      iou_thresh: suppress boxes with IoU > thresh against a kept box.
    """
    n = boxes.shape[0]
    neg_inf = jnp.finfo(jnp.float32).min
    order = jnp.argsort(
        jnp.where(valid, scores.astype(jnp.float32), neg_inf), descending=True
    )
    sboxes = boxes[order]
    svalid = valid[order]
    iou = bbox_overlaps(sboxes, sboxes)  # [N, N]

    def body(i, state):
        keep, suppressed = state
        is_kept = svalid[i] & ~suppressed[i]
        keep = keep.at[i].set(is_kept)
        later = jnp.arange(n) > i
        newly = is_kept & later & (iou[i] > iou_thresh)
        return keep, suppressed | newly

    keep_sorted, _ = jax.lax.fori_loop(
        0, n, body, (jnp.zeros(n, dtype=bool), jnp.zeros(n, dtype=bool))
    )
    # scatter back to original order
    keep = jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)
    return keep


def use_pallas_nms() -> bool:
    """Pallas kernel on accelerator backends, lax scan on CPU (where the
    Mosaic interpreter would be slower than XLA)."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover - backend probing
        return False


def batched_class_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
) -> jnp.ndarray:
    """NMS over leading batch axes (e.g. [frames, classes, N]); dispatches to
    the Pallas kernel (one program per problem) on TPU."""
    if use_pallas_nms():
        from vidsgg.ops.pallas_nms import nms_mask_pallas

        return nms_mask_pallas(boxes, scores, valid, iou_thresh)
    flat_shape = (-1,) + boxes.shape[-2:]
    fb = boxes.reshape(flat_shape)
    fs = scores.reshape(-1, scores.shape[-1])
    fv = valid.reshape(-1, valid.shape[-1])
    keep = jax.vmap(lambda b, s, v: nms_mask(b, s, v, iou_thresh))(fb, fs, fv)
    return keep.reshape(valid.shape)
