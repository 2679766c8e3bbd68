"""Native C++ preprocessing: builds with g++ and matches the NumPy/cv2 math."""

import numpy as np
import pytest

from vidsgg.data import native
from vidsgg.eval.evaluator import np_bbox_overlaps


@pytest.fixture(scope="module")
def lib():
    native.build()
    assert native.available()
    return native


def test_bbox_overlaps_matches_numpy(lib):
    rng = np.random.RandomState(0)
    x1y1 = rng.rand(30, 2) * 50
    wh = rng.rand(30, 2) * 30 + 1
    boxes = np.concatenate([x1y1, x1y1 + wh], 1).astype(np.float32)
    got = lib.bbox_overlaps(boxes, boxes[:11])
    want = np_bbox_overlaps(boxes, boxes[:11])
    assert np.allclose(got, want, atol=1e-5)


def test_prep_frames_scale_and_means(lib):
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 255, size=(3, 40, 60, 3), dtype=np.uint8)
    target = 80  # min side 40 -> scale 2.0 -> output 80x120
    means = (10.0, 20.0, 30.0)
    out, scale = lib.prep_frames(frames, target, means, 80, 128)
    assert scale == 2.0
    assert out.shape == (3, 80, 128, 3)
    # padding region stays zero
    assert np.allclose(out[:, :, 120:], 0.0)
    # constant image resizes to the constant minus means
    const = np.full((1, 40, 60, 3), 100, np.uint8)
    out_c, _ = lib.prep_frames(const, target, means, 80, 128)
    for c in range(3):
        assert np.allclose(out_c[0, :80, :120, c], 100.0 - means[c], atol=1e-4)


def test_prep_frames_matches_cv2_bilinear(lib):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 255, size=(1, 48, 64, 3), dtype=np.uint8)
    means = (102.9801, 115.9465, 122.7717)
    out, scale = lib.prep_frames(frames, 96, means, 96, 128)
    ref = cv2.resize(
        frames[0].astype(np.float32) - np.asarray(means)[None, None],
        None, fx=2.0, fy=2.0, interpolation=cv2.INTER_LINEAR,
    )
    assert np.allclose(out[0, :96, :128], ref[:, :128], atol=0.75)
