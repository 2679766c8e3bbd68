"""Detector front-end: RPN/proposals, full Faster R-CNN forward, sgdet
detection + entry assembly (tiny backbone, random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsgg.data import EntryCapacity, synthetic_video_annotation
from vidsgg.detector.faster_rcnn import FasterRCNN
from vidsgg.detector.rpn import RPNConfig, generate_anchors
from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend, assign_relations

RPN_SMALL = RPNConfig(pre_nms_top_n=64, post_nms_top_n=16)


def test_rpn_serving_default_is_reference_roi_load():
    """Regression pin for the PRODUCTION RPN default (every other test
    uses tiny configs): the reference's frozen detector serves 100
    rois/frame — its documented full-forward shapes are
    rois [10, 100, 5] / roi_features [10, 100, 2048]
    (tools/utils/object_detector.py:88-94) — so 100 post-NMS proposals
    IS the parity serving load. The r4 300->100 change tripled serving
    throughput (docs/PERF.md proposal-count sensitivity); a silent
    revert to jwyang's 300 library default would cost it back."""
    cfg = RPNConfig()
    assert cfg.post_nms_top_n == 100
    assert cfg.pre_nms_top_n == 6000
    assert cfg.nms_thresh == 0.7


def test_generate_anchors_layout():
    cfg = RPNConfig()
    a = generate_anchors(cfg, 3, 4)
    assert a.shape == (3 * 4 * 12, 4)
    # first anchor centered at (7.5, 7.5); shifts advance by stride 16
    assert np.allclose((a[:12, 0] + a[:12, 2]) / 2, 7.5)
    assert np.allclose(a[12, 0] - a[0, 0], 16.0)


@pytest.fixture(scope="module")
def tiny_rcnn():
    model = FasterRCNN(
        rpn_cfg=RPN_SMALL, base_blocks=(1, 1, 1), head_blocks=1
    )
    frames = jnp.zeros((2, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), frames, jnp.array([64.0, 96.0]))
    return model, variables


def test_faster_rcnn_forward_shapes(tiny_rcnn):
    model, variables = tiny_rcnn
    frames = jnp.asarray(np.random.RandomState(0).rand(2, 64, 96, 3), jnp.float32)
    out = model.apply(variables, frames, jnp.array([64.0, 96.0]))
    n = RPN_SMALL.post_nms_top_n
    assert out["rois"].shape == (2, n, 5)
    assert out["cls_prob"].shape == (2, n, 37)
    assert out["bbox_pred"].shape == (2, n, 4 * 37)
    assert out["base_feat"].shape == (2, 4, 6, 1024)
    assert out["roi_features"].shape == (2, n, 2048)
    # class probabilities sum to one on valid rois
    probs = np.asarray(out["cls_prob"])[np.asarray(out["roi_mask"])]
    assert np.allclose(probs.sum(-1), 1.0, atol=1e-4)


def test_assign_relations_matching():
    ann = synthetic_video_annotation(num_frames=2, objs_per_frame=2, seed=0)
    # perfect detections: GT boxes echoed back
    frame_boxes, frame_labels = [], []
    for frame in ann:
        boxes = [np.asarray(frame[0]["person_bbox"]).reshape(-1)[:4]]
        labels = [1]
        for o in frame[1:]:
            boxes.append(np.asarray(o["bbox"]))
            labels.append(o["class"])
        frame_boxes.append(np.asarray(boxes))
        frame_labels.append(np.asarray(labels))
    found, gts, supply, assigned = assign_relations(frame_boxes, frame_labels, ann)
    for i in range(2):
        assert len(supply[i]) == 0
        assert len(found[i]) == 3
        assert sorted(found[i]) == [0, 1, 2]
        assert assigned[i][0] == 1


def test_assign_relations_supply_for_missed_gt():
    ann = synthetic_video_annotation(num_frames=1, objs_per_frame=2, seed=1)
    # detector only found the person
    frame_boxes = [np.asarray(ann[0][0]["person_bbox"]).reshape(1, 4)]
    frame_labels = [np.array([1])]
    found, gts, supply, _ = assign_relations(frame_boxes, frame_labels, ann)
    assert len(found[0]) >= 1
    assert len(supply[0]) == 2 - (len(found[0]) - 1)


def test_sgdet_frontend_end_to_end(tiny_rcnn):
    model, variables = tiny_rcnn
    ann = synthetic_video_annotation(
        num_frames=2, objs_per_frame=2, seed=2, image_wh=(96, 64)
    )
    frontend = SgdetFrontend(
        model, variables, SgdetCaps(dets_per_frame=8),
        EntryCapacity(max_frames=4, max_objs=32, max_pairs=16),
    )
    frames = jnp.asarray(np.random.RandomState(1).rand(2, 64, 96, 3), jnp.float32)

    entry, fmaps = frontend(
        frames, jnp.array([64.0, 96.0]), 1.0, gt_annotation=ann, is_train=True
    )
    n = int(np.asarray(entry.obj_mask).sum())
    p = int(np.asarray(entry.pair_mask).sum())
    assert p == 4  # 2 frames x 2 GT objects (SUPPLY guarantees every GT pair)
    assert n >= 3  # at least person+objects per SUPPLY
    labels = np.asarray(entry.labels)[:n]
    assert (labels[np.asarray(entry.pair_idx)[:p, 1]] != 1).all()
    assert np.isfinite(np.asarray(entry.features)[:n]).all()

    entry_t, _ = frontend(frames, jnp.array([64.0, 96.0]), 1.0, is_train=False)
    nt = int(np.asarray(entry_t.obj_mask).sum())
    assert (np.asarray(entry_t.pred_labels)[:nt] >= 1).all()
    d = np.asarray(entry_t.distribution)[:nt]
    assert np.allclose(d.sum(1), 1.0, atol=1e-4)


def test_device_test_entry_matches_host_pack(tiny_rcnn):
    """The on-device masked-compaction test frontend (make_test_entry_fn)
    produces exactly the host `_test_entry` packing — same object order,
    boxes, features, distributions, labels and masks."""
    model, variables = tiny_rcnn
    frontend = SgdetFrontend(
        model, variables, SgdetCaps(dets_per_frame=8),
        EntryCapacity(max_frames=4, max_objs=32, max_pairs=16),
    )
    frames = jnp.asarray(np.random.RandomState(5).rand(2, 64, 96, 3), jnp.float32)
    im_hw = jnp.array([64.0, 96.0])

    e_host, fm_host = frontend(frames, im_hw, 1.0, is_train=False,
                               device_pack=False)
    e_dev, fm_dev = frontend(frames, im_hw, 1.0, is_train=False,
                             device_pack=True)

    assert int(np.asarray(e_dev.obj_mask).sum()) == int(
        np.asarray(e_host.obj_mask).sum()
    )
    for field in ("boxes", "scores", "distribution", "features"):
        np.testing.assert_allclose(
            np.asarray(getattr(e_dev, field)),
            np.asarray(getattr(e_host, field)),
            rtol=1e-5, atol=1e-5, err_msg=field,
        )
    for field in ("labels", "pred_labels", "obj_mask", "frame_mask"):
        np.testing.assert_array_equal(
            np.asarray(getattr(e_dev, field)),
            np.asarray(getattr(e_host, field)), err_msg=field,
        )
    np.testing.assert_allclose(
        np.asarray(fm_dev), np.asarray(fm_host), rtol=1e-5, atol=1e-5
    )
    assert float(e_dev.im_scale) == float(e_host.im_scale)
    assert int(e_dev.num_frames) == int(e_host.num_frames)


def test_frontend_canvas_padding_is_transparent(tiny_rcnn):
    """Spatial canvas + frame-bucket padding with num_frames masking gives
    the same entry as the exact-shape call (detections in padded frames and
    beyond the true (h, w) are dropped)."""
    model, variables = tiny_rcnn
    cap = EntryCapacity(max_frames=6, max_objs=48, max_pairs=16)
    frontend = SgdetFrontend(model, variables, SgdetCaps(dets_per_frame=8), cap)
    rng = np.random.RandomState(9)
    frames = rng.rand(2, 64, 96, 3).astype(np.float32)
    im_hw = jnp.array([64.0, 96.0])

    # spatial canvas only (2 true frames)
    sp = np.zeros((2, 80, 112, 3), np.float32)
    sp[:, :64, :96] = frames
    e_sp, _ = frontend(jnp.asarray(sp), im_hw, 1.0, is_train=False)

    # same canvas + 2 zero padding frames, masked via num_frames: frames
    # are independent in the detector, so this must match exactly
    pad = np.zeros((4, 80, 112, 3), np.float32)
    pad[:2, :64, :96] = frames
    e_pad, _ = frontend(jnp.asarray(pad), im_hw, 1.0, is_train=False,
                        num_frames=2)

    n_sp = int(np.asarray(e_sp.obj_mask).sum())
    n_pad = int(np.asarray(e_pad.obj_mask).sum())
    assert n_pad == n_sp
    for field in ("boxes", "scores", "distribution", "features"):
        np.testing.assert_allclose(
            np.asarray(getattr(e_pad, field))[:n_pad],
            np.asarray(getattr(e_sp, field))[:n_sp],
            rtol=1e-5, atol=1e-5, err_msg=field,
        )
    if n_pad:
        frames_used = np.asarray(e_pad.boxes)[:n_pad, 0]
        assert (frames_used <= 1).all()
    assert int(np.asarray(e_pad.num_frames)) == 2
    assert np.asarray(e_pad.frame_mask)[:2].all()
    assert not np.asarray(e_pad.frame_mask)[2:].any()
