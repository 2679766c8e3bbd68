"""Stage-level timing of the PARITY-config detect path (RPN 6000/300).

Times each sub-stage of `FasterRCNN.__call__` as its own jit at the serving
CLI's exact defaults (16 frames, 608x1008, RPN 6000 pre / 300 post, bf16) so
the 87 ms/video detect cost (docs/PERF.md) can be attributed and attacked.

Run on the TPU:  python scripts/profile_parity_detect.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vidsgg import constants as C
from vidsgg.detector.faster_rcnn import FasterRCNN
from vidsgg.detector.rpn import RPNConfig, generate_anchors, proposal_layer
from vidsgg.ops.roi_align import roi_align_fused

FRAMES, H, W = 16, 608, 1008


def _sync(x):
    return float(jnp.asarray(x).sum())


def bench(name, fn, *args, iters=8):
    jitted = jax.jit(fn)
    out = jitted(*args)
    _sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    _sync(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt * 1e3:8.2f} ms")
    return out, dt


def main():
    rng = jax.random.PRNGKey(0)
    model = FasterRCNN(rpn_cfg=RPNConfig(), dtype=jnp.bfloat16)
    im_hw = jnp.array([float(H), float(W)])
    chunk0 = jnp.zeros((1, H, W, 3), jnp.float32)
    det_vars = jax.jit(model.init)(rng, chunk0, im_hw)
    video = jnp.asarray(
        np.random.RandomState(0).rand(FRAMES, H, W, 3).astype(np.float32))

    cfg = model.rpn_cfg

    # 1) backbone base features
    def base_fn(v, imgs):
        return model.apply(v, imgs, method=model.base_features)

    base_feat, dt_base = bench("base (ResNet-101 conv1-layer3)", base_fn,
                               det_vars, video)
    b, fh, fw, _ = base_feat.shape
    anchors = jnp.asarray(generate_anchors(cfg, fh, fw))

    # 2) RPN conv heads
    def rpn_fn(v, feat):
        return model.apply(v, feat,
                           method=lambda m, f: m.rpn(f))

    (fg, deltas), dt_rpn = bench("rpn conv heads", rpn_fn, det_vars, base_feat)

    # 3) proposal layer, split into decode+topk vs NMS+select
    def decode_topk_fn(fg_, deltas_):
        from vidsgg.ops.boxes import bbox_transform_inv, clip_boxes

        def one(scores, d):
            boxes = bbox_transform_inv(anchors, d.reshape(-1, 4))
            boxes = clip_boxes(boxes, im_hw)
            return jax.lax.top_k(scores, cfg.pre_nms_top_n), boxes

        (ts, idx), boxes = jax.vmap(one)(fg_, deltas_)
        gi = jnp.arange(fg_.shape[0])[:, None]
        return boxes[gi, idx], ts

    (top_boxes, top_scores), dt_topk = bench(
        "proposal decode + top_k(6000)", decode_topk_fn, fg, deltas)

    def nms_fn(tb, tsc):
        from vidsgg.ops.nms import batched_class_nms
        return batched_class_nms(tb, tsc, jnp.ones(tsc.shape, bool),
                                 cfg.nms_thresh)

    keep, dt_nms = bench("RPN NMS (pallas, 16x6000)", nms_fn,
                         top_boxes, top_scores)

    def prop_fn(fg_, deltas_):
        return proposal_layer(fg_, deltas_, anchors, im_hw, cfg)

    (rois, roi_scores, roi_mask), dt_prop = bench(
        "proposal layer TOTAL", prop_fn, fg, deltas)

    # 4) ROIAlign at [16, 300] rois
    def roi_fn(feat, r):
        return roi_align_fused(feat, r, out_size=C.ROI_ALIGN_OUT,
                               spatial_scale=C.ROI_ALIGN_SCALE,
                               compute_dtype=jnp.bfloat16)

    pooled, dt_roi = bench("ROIAlign fused (16x300 rois)", roi_fn,
                           base_feat, rois)

    # 5) layer4 head + cls/bbox at 4800 rois
    def head_fn(v, p):
        def run(m, pp):
            feats = m.head(pp.reshape(-1, C.ROI_ALIGN_OUT, C.ROI_ALIGN_OUT,
                                      pp.shape[-1]))
            return m.cls_score(feats), m.bbox_pred(feats)
        return model.apply(v, p, method=run)

    _, dt_head = bench("layer4 head + cls/bbox (4800 rois)", head_fn,
                       det_vars, pooled)

    # 6) full detect jit for reference
    def full_fn(v, imgs):
        return model.apply(v, imgs, im_hw)

    _, dt_full = bench("FULL detect jit", full_fn, det_vars, video)

    parts = dt_base + dt_rpn + dt_prop + dt_roi + dt_head
    print(f"{'sum of parts':36s} {parts * 1e3:8.2f} ms")
    print(f"{'  (topk part of proposal)':36s} {dt_topk * 1e3:8.2f} ms")
    print(f"{'  (nms part of proposal)':36s} {dt_nms * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
