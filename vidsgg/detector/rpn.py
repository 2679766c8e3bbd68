"""Region Proposal Network + proposal layer (fixed-shape, masked).

Mirrors the jwyang RPN consumed by the reference's frozen Faster R-CNN
(tools/fasterRCNN/lib/model/rpn/, external): a 3x3/512 conv trunk with
2A-way objectness and 4A-way box-delta heads over stride-16 anchors, then
the proposal layer — decode, clip, top-K pre-NMS, NMS@0.7, top-N post-NMS.
The data-dependent NMS keep-set becomes a fixed-size proposal buffer with a
validity mask (TPU shape discipline); scores of invalid slots are zero.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.ops.boxes import bbox_transform_inv, clip_boxes
from vidsgg.ops.nms import nms_mask, use_pallas_nms


@dataclasses.dataclass(frozen=True)
class RPNConfig:
    anchor_scales: tuple = (4, 8, 16, 32)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    feat_stride: int = 16
    pre_nms_top_n: int = 6000
    # 100, not jwyang's 300 default: the reference's frozen detector serves
    # 100 rois/frame — its documented full-forward shapes are
    # rois [10, 100, 5] / roi_features [10, 100, 2048]
    # (tools/utils/object_detector.py:85-94, SURVEY §2.3), so 100 post-NMS
    # proposals per frame IS the parity serving load for ROIAlign + head.
    post_nms_top_n: int = 100
    nms_thresh: float = 0.7
    # NOTE: no min_size proposal filter. The reference's frozen detector is
    # the STTran-vendored jwyang faster-rcnn.pytorch
    # (tools/fasterRCNN/lib/model/rpn/, imported at object_detector.py:10-13),
    # whose proposal_layer.py ships the `_filter_boxes(proposals,
    # min_size * im_info[2])` step COMMENTED OUT — the filter is not applied
    # in that lineage, so applying one here would change which proposals
    # survive vs the converted faster_rcnn_ag.pth checkpoint.
    # TPU-native approximate top-k (jax.lax.approx_max_k, ~2x faster than
    # the exact sort at AG anchor counts) for the pre-NMS selection; off by
    # default to keep exact reference semantics. Proposal selection is
    # recall-tolerant, so the default 0.95 recall target is safe when speed
    # matters more than bit-parity.
    approx_topk: bool = False


def generate_anchors(cfg: RPNConfig, fh: int, fw: int) -> np.ndarray:
    """[fh*fw*A, 4] anchors in image coordinates (jwyang generate_anchors
    lineage: base 16 box, ratio then scale enumeration, centered)."""
    base = 16.0
    anchors = []
    for r in cfg.anchor_ratios:
        size = base * base
        ws = np.round(np.sqrt(size / r))
        hs = np.round(ws * r)
        for s in cfg.anchor_scales:
            w, h = ws * s, hs * s
            cx = cy = (base - 1) / 2.0
            anchors.append(
                [cx - 0.5 * (w - 1), cy - 0.5 * (h - 1),
                 cx + 0.5 * (w - 1), cy + 0.5 * (h - 1)]
            )
    anchors = np.array(anchors)  # [A, 4]
    sx = np.arange(fw) * cfg.feat_stride
    sy = np.arange(fh) * cfg.feat_stride
    sx, sy = np.meshgrid(sx, sy)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    all_anchors = (anchors[None, :, :] + shifts[:, None, :]).reshape(-1, 4)
    return all_anchors.astype(np.float32)


class RPN(nn.Module):
    """[B, fh, fw, 1024] -> (objectness [B, K], deltas [B, K, 4]) over
    K = fh*fw*A anchors."""

    num_anchors: int

    @nn.compact
    def __call__(self, feat):
        h = nn.relu(nn.Conv(512, (3, 3), padding=1, name="rpn_conv")(feat))
        score = nn.Conv(2 * self.num_anchors, (1, 1), name="rpn_cls_score")(h)
        bbox = nn.Conv(4 * self.num_anchors, (1, 1), name="rpn_bbox_pred")(h)
        b, fh, fw, _ = score.shape
        # softmax over (bg, fg) per anchor; jwyang layout groups bg then fg
        score = score.reshape(b, fh * fw, 2, self.num_anchors)
        fg = jax.nn.softmax(score, axis=2)[:, :, 1, :]
        fg = fg.reshape(b, fh * fw * self.num_anchors)
        bbox = bbox.reshape(b, fh * fw * self.num_anchors, 4)
        return fg, bbox


def proposal_layer(
    fg_scores: jnp.ndarray,   # [B, K]
    deltas: jnp.ndarray,      # [B, K, 4]
    anchors: jnp.ndarray,     # [K, 4]
    im_hw: jnp.ndarray,       # [2] or [B, 2] (H, W) network scale
    cfg: RPNConfig,
):
    """-> (rois [B, N, 4], roi_scores [B, N], roi_mask [B, N])."""
    from vidsgg.ops.nms import batched_class_nms

    def decode_topk(scores, d, hw):
        boxes = bbox_transform_inv(anchors, d.reshape(-1, 4 * 1))
        boxes = clip_boxes(boxes, hw)
        k = min(cfg.pre_nms_top_n, scores.shape[0])
        if cfg.approx_topk:
            top_scores, idx = jax.lax.approx_max_k(scores, k)
        else:
            top_scores, idx = jax.lax.top_k(scores, k)
        return boxes[idx], top_scores

    # per-frame clip bounds: one (H, W) broadcast to every frame, or [B, 2]
    # when one dispatch carries frames from differently-sized videos
    im_hw_b = jnp.broadcast_to(jnp.asarray(im_hw), (fg_scores.shape[0], 2))
    top_boxes, top_scores = jax.vmap(decode_topk)(
        fg_scores, deltas, im_hw_b
    )  # [B, K, 4]
    valid = jnp.ones(top_scores.shape, bool)
    if top_scores.shape[-1] >= 512 and use_pallas_nms():
        from vidsgg.ops.pallas_nms import nms_mask_pallas_batched

        # the scan consumes top_k's already-descending order (presorted) and
        # stops once every frame has post_nms_top_n keeps (max_keep): greedy
        # NMS is prefix-stable, and `select` below takes exactly that many
        keep = nms_mask_pallas_batched(
            top_boxes, top_scores, valid, cfg.nms_thresh,
            max_keep=cfg.post_nms_top_n, presorted=True)
    else:
        keep = batched_class_nms(top_boxes, top_scores, valid, cfg.nms_thresh)

    def select(boxes, scores, kp):
        k = boxes.shape[0]
        rank = jnp.where(kp, jnp.arange(k), k)
        # first post_nms_top_n keeps in score order; top_k on the negated
        # rank beats a full argsort at K=6000 and breaks ties (the padded
        # rank k) by index, exactly like a stable ascending argsort
        _, order = jax.lax.top_k(-rank, cfg.post_nms_top_n)
        mask = kp[order]
        return boxes[order] * mask[:, None], scores[order] * mask, mask

    return jax.vmap(select)(top_boxes, top_scores, keep)
