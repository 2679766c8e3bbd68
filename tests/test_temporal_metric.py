import numpy as np
import pytest

from vidsgg.eval.temporal import (
    evaluate_temporal_consistency,
    find_consecutive_duplicates,
    temporal_consistency_summary,
)


def _pairs(p):
    """person-first frame-major pair_idx for one (person, obj) pair/frame."""
    return np.stack([np.arange(p) * 2, np.arange(p) * 2 + 1], 1)


def test_find_consecutive_duplicates_basic():
    # label repeats 8 times -> run counter reaches 7 (>= window 6).
    # Trailing-run quirk (temporal_consistency.py:22-23): the reference
    # appends [id-cnt, id] with id = the LAST index, so the final element
    # of the run is excluded -> [0, 7], not [1, 8].
    tb = [True] * 8
    gt = [2] * 8
    itv = find_consecutive_duplicates(tb, gt, window=6)
    assert itv == [[0, 7]]


def test_find_consecutive_duplicates_breaks_on_change():
    tb = [True] * 12
    gt = [1] * 5 + [2] * 7
    itv = find_consecutive_duplicates(tb, gt, window=6)
    # run of 7 twos: counter 1..6 over indices 6..11, trailing [11-6, 11]
    assert itv == [[5, 11]]


def test_find_consecutive_duplicates_midrun_break():
    # a broken run appends the IN-LOOP form [i-cnt, i] (run start excluded,
    # temporal_consistency.py:17-18 quirk)
    tb = [True] * 12
    gt = [2] * 8 + [5] * 4
    itv = find_consecutive_duplicates(tb, gt, window=6)
    assert itv == [[1, 8]]


def test_find_consecutive_no_interval_when_short():
    assert find_consecutive_duplicates([True] * 4, [1] * 4, window=6) == []


def test_evaluate_temporal_consistency_sgdet_skipped():
    assert evaluate_temporal_consistency({}, "sgdet") == (None, None)


def test_evaluate_temporal_consistency_scores():
    p = 10
    pred = {
        "spatial_gt": [[1]] * p,
        "contacting_gt": [[3]] * p,
        "spatial_distribution": np.tile(np.eye(6)[1] * 5.0, (p, 1)),
        "contacting_distribution": np.tile(np.eye(17)[3] * 5.0, (p, 1)),
        # one person + one object of class 4 per frame: labels over boxes
        "pred_labels": np.array([1, 4] * p),
        "pair_idx": _pairs(p),
    }
    s, c = evaluate_temporal_consistency(pred, "predcls", window=6)
    assert len(s) == 1 and len(c) == 1
    # confident (but not one-hot) prediction vs one-hot GT: small positive KL
    assert s[0] > 0 and c[0] > 0

    summ = temporal_consistency_summary(s, c)
    assert summ["num_spatial_intervals"] == 1
    assert np.isclose(summ["combined"], (summ["spatial"] + summ["contacting"]) / 2)


def test_kl_matches_manual_computation():
    p = 8
    rng = np.random.RandomState(0)
    sdist = rng.rand(p, 6)
    pred = {
        "spatial_gt": [[2]] * p,
        "contacting_gt": [[0]] * p,
        "spatial_distribution": sdist,
        "contacting_distribution": np.zeros((p, 17)),
        "pred_labels": np.array([1, 9] * p),
        "pair_idx": _pairs(p),
    }
    s, _ = evaluate_temporal_consistency(pred, "predcls", window=6)
    # manual: trailing interval [0, 7) per the reference's quirk
    seg = sdist[0:7].astype(np.float64)
    gt_1h = np.eye(6)[[2] * 7]
    lp = gt_1h - gt_1h.max(1, keepdims=True)
    log_p = lp - np.log(np.exp(lp).sum(1, keepdims=True))
    e = np.exp(seg - seg.max(1, keepdims=True))
    q = e / e.sum(1, keepdims=True)
    want = np.where(q > 0, q * (np.log(q) - log_p), 0.0).sum() / 7
    assert np.isclose(s[0], want)


def test_permuted_box_order_fails_loudly():
    """The metric's direct box indexing assumes person-first frame-major
    box order (i-th non-person box == object of i-th pair). A permuted box
    list must raise, not silently mis-score."""
    p = 8
    pred = {
        "spatial_gt": [[1]] * p,
        "contacting_gt": [[3]] * p,
        "spatial_distribution": np.zeros((p, 6)),
        "contacting_distribution": np.zeros((p, 17)),
        # objects of two classes; box list order swapped vs pair order
        "pred_labels": np.array(([1, 4] * (p // 2)) + ([1, 9] * (p // 2))),
        "pair_idx": np.concatenate([
            _pairs(p)[p // 2:], _pairs(p)[: p // 2]
        ]),
    }
    with pytest.raises(ValueError, match="person-first"):
        evaluate_temporal_consistency(pred, "predcls", window=6)


def test_person_misclassified_object_truncates_like_reference():
    """An object box classified as person (possible in sgcls) shortens the
    non-person sequence; the reference zip-truncates rather than erroring —
    so must we."""
    p = 8
    labels = np.array([1, 4] * p)
    labels[2 * 3 + 1] = 1  # 4th object predicted as person
    pred = {
        "spatial_gt": [[1]] * p,
        "contacting_gt": [[3]] * p,
        "spatial_distribution": np.tile(np.eye(6)[1] * 5.0, (p, 1)),
        "contacting_distribution": np.tile(np.eye(17)[3] * 5.0, (p, 1)),
        "pred_labels": labels,
        "pair_idx": _pairs(p),
    }
    s, c = evaluate_temporal_consistency(pred, "sgcls", window=3)
    assert all(np.isfinite(s)) and all(np.isfinite(c))
