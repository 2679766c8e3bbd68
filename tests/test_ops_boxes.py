import jax.numpy as jnp
import numpy as np

from vidsgg.ops import bbox_overlaps, bbox_transform_inv, box_union, center_size, clip_boxes
from vidsgg.eval.evaluator import np_bbox_overlaps


def test_bbox_overlaps_identity():
    boxes = jnp.array([[0.0, 0.0, 9.0, 9.0], [10.0, 10.0, 19.0, 19.0]])
    iou = bbox_overlaps(boxes, boxes)
    assert np.allclose(np.diag(np.array(iou)), 1.0)
    assert iou[0, 1] == 0.0


def test_bbox_overlaps_half_overlap_inclusive_convention():
    # [0,0,9,9] is 10x10=100 px inclusive; [5,0,14,9] overlaps 5x10=50 px
    a = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    b = jnp.array([[5.0, 0.0, 14.0, 9.0]])
    iou = bbox_overlaps(a, b)
    assert np.allclose(np.array(iou), 50.0 / 150.0)


def test_bbox_overlaps_matches_numpy_reference():
    rng = np.random.RandomState(0)
    x1y1 = rng.rand(20, 2) * 50
    wh = rng.rand(20, 2) * 30 + 1
    boxes = np.concatenate([x1y1, x1y1 + wh], 1)
    got = np.array(bbox_overlaps(jnp.array(boxes), jnp.array(boxes[:7])))
    want = np_bbox_overlaps(boxes, boxes[:7])
    assert np.allclose(got, want, atol=1e-5)


def test_center_size():
    boxes = jnp.array([[0.0, 0.0, 9.0, 19.0]])
    cs = np.array(center_size(boxes))
    # w=10, h=20 inclusive; cx = 0 + 0.5*9 = 4.5, cy = 9.5
    assert np.allclose(cs, [[4.5, 9.5, 10.0, 20.0]])


def test_box_union():
    a = jnp.array([[0.0, 0.0, 5.0, 5.0]])
    b = jnp.array([[3.0, -1.0, 8.0, 4.0]])
    assert np.allclose(np.array(box_union(a, b)), [[0.0, -1.0, 8.0, 5.0]])


def test_bbox_transform_inv_identity_and_clip():
    boxes = jnp.array([[10.0, 10.0, 29.0, 29.0]])
    deltas = jnp.zeros((1, 8))  # two classes, zero deltas
    out = np.array(bbox_transform_inv(boxes, deltas)).reshape(1, 2, 4)
    # jwyang decode with zero deltas shifts x2 by the +1 width convention:
    # w = 29-10+1 = 20, ctr = 20, x2' = ctr + 0.5w = 30
    assert np.allclose(out[0, 0], [10.0, 10.0, 30.0, 30.0], atol=1e-5)
    clipped = np.array(clip_boxes(jnp.array([[-5.0, -5.0, 100.0, 100.0]]), jnp.array([50.0, 60.0])))
    assert np.allclose(clipped, [[0.0, 0.0, 59.0, 49.0]])
