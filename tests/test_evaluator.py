import numpy as np

from vidsgg.eval import SceneGraphEvaluator, get_ag_evaluators


def _one_frame_fixture():
    """Person + 2 objects with known relations.

    GT relations (26-way predicate ids):
      obj A (class 3): att 0 -> 0, spatial 1 -> 4, contact {2,4} -> {11,13}
      obj B (class 5): att 1 -> 1, spatial {0,2} -> {3,5}, contact 0 -> 9
    """
    gt = [
        [
            {"person_bbox": np.array([[0.0, 0.0, 10.0, 10.0]]), "frame": "v/0"},
            {
                "bbox": np.array([20.0, 20.0, 30.0, 30.0]),
                "class": 3,
                "attention_relationship": [0],
                "spatial_relationship": [1],
                "contacting_relationship": [2, 4],
            },
            {
                "bbox": np.array([40.0, 40.0, 50.0, 50.0]),
                "class": 5,
                "attention_relationship": [1],
                "spatial_relationship": [0, 2],
                "contacting_relationship": [0],
            },
        ]
    ]

    att = np.array([[0.98, 0.01, 0.01], [0.01, 0.98, 0.01]])
    spa = np.full((2, 6), 0.01)
    spa[0, 1] = 0.95
    spa[1, 0] = 0.95
    spa[1, 2] = 0.95
    con = np.full((2, 17), 0.01)
    con[0, 2] = 0.95
    con[0, 4] = 0.95
    con[1, 0] = 0.95

    pred = {
        "boxes": np.array(
            [
                [0.0, 0.0, 0.0, 10.0, 10.0],
                [0.0, 20.0, 20.0, 30.0, 30.0],
                [0.0, 40.0, 40.0, 50.0, 50.0],
            ]
        ),
        "labels": np.array([1, 3, 5]),
        "scores": np.array([1.0, 1.0, 1.0]),
        "im_idx": np.array([0, 0]),
        "pair_idx": np.array([[0, 1], [0, 2]]),
        "attention_distribution": att,
        "spatial_distribution": spa,
        "contacting_distribution": con,
    }
    return gt, pred


def test_with_constraint_single_prediction_per_pair():
    gt, pred = _one_frame_fixture()
    ev = SceneGraphEvaluator("predcls", constraint="with")
    ev.evaluate_scene_graph(gt, pred)
    # with-constraint: one predicate per relation row; the multi-label GT
    # (contact {11,13} for A, spatial {3,5} for B) can only be half-hit
    assert np.isclose(ev.recall_at(10), 6.0 / 8.0)
    assert np.isclose(ev.recall_at(100), 6.0 / 8.0)


def test_semi_constraint_recovers_multilabels():
    gt, pred = _one_frame_fixture()
    ev = SceneGraphEvaluator("predcls", constraint="semi", semithreshold=0.9)
    ev.evaluate_scene_graph(gt, pred)
    assert np.isclose(ev.recall_at(10), 1.0)


def test_no_constraint_top100():
    gt, pred = _one_frame_fixture()
    ev = SceneGraphEvaluator("predcls", constraint="no")
    ev.evaluate_scene_graph(gt, pred)
    assert np.isclose(ev.recall_at(100), 1.0)


def test_mean_recall_counts_per_predicate():
    gt, pred = _one_frame_fixture()
    ev = SceneGraphEvaluator("predcls", constraint="semi", semithreshold=0.9)
    ev.evaluate_scene_graph(gt, pred)
    m = ev.calc_mrecall()
    # 8 predicates hit exactly once out of once each -> those contribute 1.0;
    # 18 predicates have zero count -> contribute 0 (ref's +1e-10 denominator)
    assert np.isclose(m[10], 8.0 / 26.0)
    hit = ev.result_dict["predcls_recall_hit"][10]
    cnt = ev.result_dict["predcls_recall_count"][10]
    assert sum(hit) == 8 and sum(cnt) == 8
    assert cnt[0] == 1 and cnt[4] == 1 and cnt[11] == 1 and cnt[13] == 1


def test_iou_threshold_rejects_displaced_boxes():
    gt, pred = _one_frame_fixture()
    pred = dict(pred)
    pred["boxes"] = pred["boxes"].copy()
    pred["boxes"][1, 1:] += 25.0  # object A box displaced -> IoU < 0.5
    ev = SceneGraphEvaluator("predcls", constraint="semi", semithreshold=0.9)
    ev.evaluate_scene_graph(gt, pred)
    # A carries 4 of the 8 GT relations
    assert np.isclose(ev.recall_at(10), 4.0 / 8.0)


def test_sgcls_uses_pred_labels_and_penalizes_misclassification():
    gt, pred = _one_frame_fixture()
    pred = dict(pred)
    pred["pred_labels"] = np.array([1, 3, 7])  # object B misclassified
    pred["pred_scores"] = np.array([0.9, 0.9, 0.9])
    ev = SceneGraphEvaluator("sgcls", constraint="semi", semithreshold=0.9)
    ev.evaluate_scene_graph(gt, pred)
    assert np.isclose(ev.recall_at(10), 4.0 / 8.0)


def test_evaluator_triple_and_reset():
    w, s, n = get_ag_evaluators("predcls")
    gt, pred = _one_frame_fixture()
    for ev in (w, s, n):
        ev.evaluate_scene_graph(gt, pred)
        assert len(ev.result_dict["predcls_recall"][20]) == 1
        ev.reset_result()
        assert len(ev.result_dict["predcls_recall"][20]) == 0


def test_multi_frame_accumulation():
    gt, pred = _one_frame_fixture()
    gt2 = gt + gt  # same frame twice
    pred2 = dict(pred)
    pred2["im_idx"] = np.array([0, 0, 1, 1])
    pred2["pair_idx"] = np.array([[0, 1], [0, 2], [0, 1], [0, 2]])
    for k in ("attention_distribution", "spatial_distribution", "contacting_distribution"):
        pred2[k] = np.concatenate([pred[k], pred[k]], 0)
    ev = SceneGraphEvaluator("predcls", constraint="semi", semithreshold=0.9)
    ev.evaluate_scene_graph(gt2, pred2)
    assert len(ev.result_dict["predcls_recall"][20]) == 2
    assert np.isclose(ev.recall_at(20), 1.0)
