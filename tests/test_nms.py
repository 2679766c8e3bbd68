import jax.numpy as jnp
import numpy as np

from vidsgg.ops import nms_mask, batched_class_nms


def _np_nms(boxes, scores, thresh):
    """Straightforward reference greedy NMS (inclusive IoU)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            iw = max(0.0, xx2 - xx1 + 1)
            ih = max(0.0, yy2 - yy1 + 1)
            inter = iw * ih
            a_i = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
            a_j = (boxes[j, 2] - boxes[j, 0] + 1) * (boxes[j, 3] - boxes[j, 1] + 1)
            if inter / (a_i + a_j - inter) > thresh:
                suppressed[j] = True
    return sorted(keep)


def test_nms_suppresses_overlaps():
    boxes = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],
            [1.0, 1.0, 11.0, 11.0],  # heavy overlap with 0
            [20.0, 20.0, 30.0, 30.0],
        ]
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.array(nms_mask(boxes, scores, jnp.ones(3, bool), 0.4))
    assert keep.tolist() == [True, False, True]


def test_nms_respects_validity_mask():
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [100.0, 100.0, 110.0, 110.0]])
    scores = jnp.array([0.1, 0.99])
    keep = np.array(nms_mask(boxes, scores, jnp.array([True, False]), 0.4))
    assert keep.tolist() == [True, False]


def test_nms_matches_numpy_reference_randomized():
    rng = np.random.RandomState(42)
    for _ in range(5):
        n = 24
        x1y1 = rng.rand(n, 2) * 40
        wh = rng.rand(n, 2) * 30 + 2
        boxes = np.concatenate([x1y1, x1y1 + wh], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        keep = np.array(nms_mask(jnp.array(boxes), jnp.array(scores), jnp.ones(n, bool), 0.5))
        want = _np_nms(boxes, scores, 0.5)
        assert sorted(np.where(keep)[0].tolist()) == want


def test_batched_class_nms_shape():
    rng = np.random.RandomState(0)
    boxes = rng.rand(3, 4, 8, 4).astype(np.float32) * 50
    boxes[..., 2:] += boxes[..., :2] + 5
    scores = rng.rand(3, 4, 8).astype(np.float32)
    valid = rng.rand(3, 4, 8) > 0.3
    keep = np.array(batched_class_nms(jnp.array(boxes), jnp.array(scores), jnp.array(valid), 0.5))
    assert keep.shape == (3, 4, 8)
    assert not (keep & ~valid).any()
