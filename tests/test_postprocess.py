import numpy as np

from vidsgg.models.postprocess import (
    ObjectsView,
    sgcls_postprocess,
    sgdet_postprocess,
)


def _view(boxes, dist, labels=None):
    n = len(boxes)
    return ObjectsView(
        boxes=np.asarray(boxes, np.float32),
        distribution=np.asarray(dist, np.float32),
        features=np.arange(n * 4, dtype=np.float32).reshape(n, 4),
        mem_features=np.arange(n * 3, dtype=np.float32).reshape(n, 3),
        pred_labels=np.zeros(n, np.int64),
        pred_scores=np.zeros(n, np.float32),
        labels=np.asarray(labels if labels is not None else np.zeros(n), np.int64),
    )


def test_sgcls_human_selection_and_labels():
    # frame 0: box0 person-ish, box1 object class 5 (col 4), box2 class 7
    nc = 36
    dist = np.full((3, nc), 0.01, np.float32)
    dist[0, 0] = 0.9   # person score
    dist[1, 4] = 0.8   # label 2 + argmax(cols 1:) -> col 4 => label 5... cols1: idx3 -> +2 = 5
    dist[2, 6] = 0.7
    boxes = [[0, 0, 0, 10, 10], [0, 20, 20, 30, 30], [0, 40, 40, 50, 50]]
    o, human_idx, im_idx, pairs = sgcls_postprocess(_view(boxes, dist), 1)
    assert human_idx.tolist() == [0]
    assert o.pred_labels[0] == 1
    # label = argmax over cols 1.. (+2): box1 col4 -> 4-1+2 = 5
    assert o.pred_labels[1] == 5
    assert o.pred_labels[2] == 7
    assert pairs.tolist() == [[0, 1], [0, 2]]
    assert im_idx.tolist() == [0, 0]


def test_sgcls_dedup_suppresses_modal_duplicates():
    nc = 36
    dist = np.full((3, nc), 0.01, np.float32)
    dist[0, 0] = 0.9
    # two boxes both argmax to label 5 (col 4); second has higher class score
    dist[1, 4] = 0.6
    dist[1, 8] = 0.5   # runner-up -> label 9
    dist[2, 4] = 0.8
    boxes = [[0, 0, 0, 10, 10], [0, 20, 20, 30, 30], [0, 22, 22, 32, 32]]
    o, _, _, pairs = sgcls_postprocess(_view(boxes, dist), 1)
    labels = set(o.pred_labels.tolist())
    assert 1 in labels and 5 in labels
    # the weaker duplicate was pushed to its runner-up class
    assert o.pred_labels[1] == 9
    assert o.pred_labels[2] == 5
    assert len(pairs) == 2


def test_sgdet_nms_removes_near_duplicates():
    nc = 36
    # frame 0: person + two heavily-overlapping boxes of the same class
    dist = np.full((4, nc), 1e-4, np.float32)
    dist[0, 0] = 0.9
    dist[1, 10] = 0.8
    dist[2, 10] = 0.7   # IoU ~0.9 with box1 -> suppressed
    dist[3, 20] = 0.6
    boxes = [
        [0, 0, 0, 10, 10],
        [0, 20, 20, 40, 40],
        [0, 21, 21, 41, 41],
        [0, 60, 60, 80, 80],
    ]
    o, human_idx, im_idx, pairs = sgdet_postprocess(_view(boxes, dist), 1)
    # clean_class(5/8/17) did not trigger (no such labels), NMS dropped box2
    assert len(o.boxes) == 3
    assert sorted(o.pred_labels.tolist()) == [1, 11, 21]
    assert len(pairs) == 2
    # features stayed aligned with their boxes through reordering
    for i in range(len(o.boxes)):
        orig = [b[1] for b in boxes].index(o.boxes[i, 1])
        assert np.allclose(o.features[i], np.arange(4) + orig * 4)


def test_sgdet_clean_class_duplicates_special_classes():
    nc = 36
    # one box predicted as class 5 (a clean_class target) with a runner-up
    dist = np.full((2, nc), 1e-4, np.float32)
    dist[0, 0] = 0.9
    dist[1, 4] = 0.8    # argmax over [1:] -> label 5
    dist[1, 12] = 0.5   # runner-up label 13
    boxes = [[0, 0, 0, 10, 10], [0, 30, 30, 60, 60]]
    v = _view(boxes, dist)
    v.pred_labels = np.array([1, 5])  # detector labels drive clean_class
    o, _, _, pairs = sgdet_postprocess(v, 1)
    # the class-5 box was duplicated with its runner-up label; both survive
    # NMS because they sit in different argmax-class groups
    assert len(o.boxes) == 3
    assert 5 in o.pred_labels and 13 in o.pred_labels
    assert len(pairs) == 2
