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


def use_pallas_nms() -> bool:  # retained for the alternative kernel path
    """True on accelerator backends (where the Pallas kernel can run)."""
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
    """NMS over leading batch axes (e.g. [frames, classes, N]).

    Two exact implementations, dispatched on problem size (v5e timings at
    the two shapes this pipeline hits):

    * small N (the sgdet class grid [20, 36, 128]): vmapped masked scan —
      vmap hoists the per-problem ``fori_loop`` into ONE N-step loop whose
      body advances every problem at once (3.9 ms vs 19.3 ms for the
      one-program-per-problem Pallas kernel v1);
    * large N (the RPN proposal NMS [20, 1000]): the batched Pallas kernel
      (`ops/pallas_nms.py:nms_mask_pallas_batched`, problems on sublanes,
      whole scan VMEM-resident: 2.1 ms vs 5.4 ms for the XLA loop, whose
      per-step while-loop overhead grows with N)."""
    n = boxes.shape[-2]
    if n >= 512 and use_pallas_nms():
        from vidsgg.ops.pallas_nms import nms_mask_pallas_batched

        return nms_mask_pallas_batched(boxes, scores, valid, iou_thresh)
    flat_shape = (-1,) + boxes.shape[-2:]
    fb = boxes.reshape(flat_shape)
    fs = scores.reshape(-1, scores.shape[-1])
    fv = valid.reshape(-1, valid.shape[-1])
    keep = jax.vmap(lambda b, s, v: nms_mask(b, s, v, iou_thresh))(fb, fs, fv)
    return keep.reshape(valid.shape)
