"""Faster R-CNN (frozen, inference-only) — the sgdet front-end network.

Flax equivalent of the reference's external
``tools/fasterRCNN/lib/model/faster_rcnn/resnet.resnet`` (consumed at
object_detector.py:28-31, :85-94): base features, RPN proposals, ROIAlign +
head, per-roi class scores and class-specific box deltas. Outputs match the
reference's tuple shapes — rois [B, N, 5], cls_prob [B, N, C],
bbox_pred [B, N, 4C], base_feat [B, h, w, 1024], roi_features [B, N, 2048] —
with N a fixed proposal capacity plus a validity mask instead of a ragged
keep-set.

Weights come from :mod:`vidsgg.detector.convert` (a name-mapped import of
the AG-finetuned ``faster_rcnn_ag.pth``); without that artifact the module
runs with random init, which exercises the full compute path (benchmarks)
but not detection quality.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vidsgg import constants as C
from vidsgg.detector.resnet import ResNet101Base, ResNetHead
from vidsgg.detector.rpn import RPN, RPNConfig, generate_anchors, proposal_layer
from vidsgg.ops.roi_align import roi_align_fused


class FasterRCNN(nn.Module):
    num_classes: int = C.NUM_OBJ_CLASSES
    rpn_cfg: RPNConfig = RPNConfig()
    base_blocks: tuple = (3, 4, 23)   # ResNet-101; tests shrink this
    head_blocks: int = 3
    dtype: object = jnp.float32       # set bf16 for inference throughput
    # int8 post-training-quantized backbone/head convs for serving
    # ("off" | "record" | "int8" — see vidsgg/detector/quant.py)
    quant: str = "off"

    def setup(self):
        self.base = ResNet101Base(blocks=self.base_blocks, dtype=self.dtype,
                                  quant=self.quant)
        self.head = ResNetHead(blocks=self.head_blocks, dtype=self.dtype,
                               quant=self.quant)
        na = len(self.rpn_cfg.anchor_scales) * len(self.rpn_cfg.anchor_ratios)
        self.rpn = RPN(num_anchors=na)
        self.cls_score = nn.Dense(self.num_classes)
        self.bbox_pred = nn.Dense(4 * self.num_classes)

    def base_features(self, images):
        """[B, H, W, 3] -> [B, H/16, W/16, 1024] (RCNN_base)."""
        return self.base(images)

    def head_to_tail(self, pooled):
        """[N, 7, 7, 1024] -> [N, 2048] (_head_to_tail)."""
        return self.head(pooled)

    def class_scores(self, feats):
        """[N, 2048] -> [N, C] raw logits (RCNN_cls_score)."""
        return self.cls_score(feats)

    def __call__(self, images, im_hw):
        """Full detection forward over a chunk of frames.

        Args:
          images: [B, H, W, 3] preprocessed (BGR mean-subtracted) frames.
          im_hw: [2] network-scale (H, W) for proposal clipping.

        Returns dict: rois [B, N, 5] (batch_idx, xyxy network scale),
        roi_mask [B, N], cls_prob [B, N, C], bbox_pred [B, N, 4C],
        base_feat [B, h, w, 1024], roi_features [B, N, 2048].
        """
        base_feat = self.base(images)
        b, fh, fw, _ = base_feat.shape
        anchors = jnp.asarray(generate_anchors(self.rpn_cfg, fh, fw))
        fg, deltas = self.rpn(base_feat)
        rois, roi_scores, roi_mask = proposal_layer(
            fg, deltas, anchors, im_hw, self.rpn_cfg
        )  # [B, N, 4]

        n = rois.shape[1]
        batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n)).astype(jnp.float32)
        rois5 = jnp.concatenate([batch_idx[..., None], rois], axis=-1)
        # proposals come N-per-frame, so pooling uses the per-frame fused
        # one-GEMM ROIAlign (no batch embedding, no HBM intermediate)
        pooled = roi_align_fused(
            base_feat, rois,
            out_size=C.ROI_ALIGN_OUT, spatial_scale=C.ROI_ALIGN_SCALE,
            compute_dtype=None if self.dtype == jnp.float32 else self.dtype,
        ).reshape(b * n, C.ROI_ALIGN_OUT, C.ROI_ALIGN_OUT, -1)
        feats = self.head(pooled).reshape(b, n, -1)
        cls_prob = nn.softmax(self.cls_score(feats), axis=-1)
        bbox_pred = self.bbox_pred(feats)
        m = roi_mask[..., None]
        return {
            "rois": rois5 * m,
            "roi_mask": roi_mask,
            "cls_prob": cls_prob * m,
            "bbox_pred": bbox_pred * m,
            "base_feat": base_feat,
            "roi_features": feats * m,
        }
