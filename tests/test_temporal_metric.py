import numpy as np

from vidsgg.eval.temporal import (
    evaluate_temporal_consistency,
    find_consecutive_duplicates,
    temporal_consistency_summary,
)


def test_find_consecutive_duplicates_basic():
    # label repeats 8 times -> run counter reaches 7 (>= window 6)
    tb = [True] * 8
    gt = [2] * 8
    itv = find_consecutive_duplicates(tb, gt, window=6)
    assert itv == [[1, 8]]


def test_find_consecutive_duplicates_breaks_on_change():
    tb = [True] * 12
    gt = [1] * 5 + [2] * 7
    itv = find_consecutive_duplicates(tb, gt, window=6)
    assert itv == [[6, 12]]


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
        "pred_labels": np.array([1, 4] * p)[: p + p],
        "pair_idx": np.stack([np.zeros(p, int), np.arange(p)], 1),
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
        "pair_idx": np.stack([np.zeros(p, int), np.arange(p)], 1),
    }
    s, _ = evaluate_temporal_consistency(pred, "predcls", window=6)
    # manual: interval [1, 8) per find_consecutive semantics
    seg = sdist[1:8].astype(np.float64)
    gt_1h = np.eye(6)[[2] * 7]
    lp = gt_1h - gt_1h.max(1, keepdims=True)
    log_p = lp - np.log(np.exp(lp).sum(1, keepdims=True))
    e = np.exp(seg - seg.max(1, keepdims=True))
    q = e / e.sum(1, keepdims=True)
    want = np.where(q > 0, q * (np.log(q) - log_p), 0.0).sum() / 7
    assert np.isclose(s[0], want)
