"""Torch-oracle parity for THE metric: the reference's own
``BasicSceneGraphEvaluator`` (tools/utils/evaluation_recall.py) vs our
``SceneGraphEvaluator`` on identical (gt, pred) inputs.

Both evaluators consume the same AG annotation structure and prediction
dict, so no converter is involved — the gate is that every R@K list entry,
every per-predicate hit/count, and the mR@K summaries agree exactly across
all three constraint settings and both mode families (predcls, sgcls), on
imperfect predictions that exercise matching, the semi threshold (0.9), and
multi-label spatial/contacting GT.

Stubbed imports (the reference's metric logic itself runs verbatim):

* ``h5py`` / ``dill`` — imported by tools/utils/pytorch_misc.py at module
  scope, untouched by intersect_2d/argsort_desc;
* ``tools.utils.fpn.box_intersections_cpu.bbox.bbox_overlaps`` — the
  vendored Cython kernel is absent from the checkout; the stub supplies the
  jwyang lineage formula verbatim (inclusive +1 widths — the same
  convention our evaluator re-derives at eval/evaluator.py:53-73).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")


def _stub(name, **attrs):
    m = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _bbox_overlaps_pyx(boxes, query_boxes):
    """tools/utils/fpn/box_intersections_cpu/bbox.pyx semantics: [N, K]
    IoU with inclusive (+1) widths, 0 where no positive overlap."""
    boxes = np.asarray(boxes, np.float64)
    query = np.asarray(query_boxes, np.float64)
    iw = (np.minimum(boxes[:, None, 2], query[None, :, 2])
          - np.maximum(boxes[:, None, 0], query[None, :, 0]) + 1)
    ih = (np.minimum(boxes[:, None, 3], query[None, :, 3])
          - np.maximum(boxes[:, None, 1], query[None, :, 1]) + 1)
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    area_b = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    area_q = (query[:, 2] - query[:, 0] + 1) * (query[:, 3] - query[:, 1] + 1)
    return inter / (area_b[:, None] + area_q[None, :] - inter)


_stub("h5py")
_stub("dill")
for _name in ("tools.utils.fpn", "tools.utils.fpn.box_intersections_cpu"):
    _stub(_name)
_stub("tools.utils.fpn.box_intersections_cpu.bbox",
      bbox_overlaps=_bbox_overlaps_pyx)
# funcs.py / box_utils are untouched by the evaluator but pulled in by the
# package __init__ chain on some import orders
_stub("tools.utils.fpn.box_utils", bbox_overlaps=_bbox_overlaps_pyx)

from vidsgg import constants as C  # noqa: E402
from vidsgg.eval.evaluator import SceneGraphEvaluator  # noqa: E402

KS = (10, 20, 50, 100)


def _make_gt(rng, num_frames=4, objs_per_frame=3):
    """AG-format annotation: person + objects per frame, multi-label
    spatial/contacting (torch tensors like the reference dataloader)."""
    gt = []
    for f in range(num_frames):
        px, py = rng.uniform(50, 300, 2)
        frame = [{
            "person_bbox": np.array([[px, py, px + 120, py + 260]]),
            "frame": f"v/{f:06d}.png",
        }]
        for o in range(objs_per_frame):
            x, y = rng.uniform(30, 400, 2)
            frame.append({
                "bbox": np.array([x, y, x + rng.uniform(40, 150),
                                  y + rng.uniform(40, 150)]),
                "class": int(rng.integers(2, 37)),
                "attention_relationship": torch.tensor(
                    [int(rng.integers(0, 3))]),
                "spatial_relationship": torch.tensor(
                    sorted(rng.choice(6, rng.integers(1, 3),
                                      replace=False).tolist())),
                "contacting_relationship": torch.tensor(
                    sorted(rng.choice(17, rng.integers(1, 4),
                                      replace=False).tolist())),
            })
        gt.append(frame)
    return gt


def _make_pred(rng, gt, jitter=20.0, label_noise=0.3):
    """Imperfect predictions over the GT boxes: jittered coordinates, some
    wrong labels, random-but-biased distributions so with/semi/no disagree
    and recall sits strictly between 0 and 1."""
    boxes, labels, scores, im_idx, pair_idx = [], [], [], [], []
    att, spa, con = [], [], []
    base = 0
    for f, frame in enumerate(gt):
        nf = len(frame)
        person = np.asarray(frame[0]["person_bbox"]).reshape(-1)
        boxes.append([f, *(person + rng.normal(0, jitter / 4, 4))])
        labels.append(1)
        scores.append(rng.uniform(0.6, 1.0))
        for m, o in enumerate(frame[1:]):
            boxes.append([f, *(np.asarray(o["bbox"])
                               + rng.normal(0, jitter, 4))])
            wrong = rng.uniform() < label_noise
            labels.append(int(rng.integers(2, 37)) if wrong else o["class"])
            scores.append(rng.uniform(0.2, 1.0))
            im_idx.append(f)
            pair_idx.append([base, base + 1 + m])
            a = rng.uniform(0.05, 1.0, 3)
            a[int(np.asarray(o["attention_relationship"])[0])] += 1.0
            att.append(a / a.sum())
            s = rng.uniform(0.05, 1.0, 6)
            s[int(np.asarray(o["spatial_relationship"])[0])] = rng.uniform(
                0.85, 1.0)  # some entries above the 0.9 semi threshold
            spa.append(s)
            c = rng.uniform(0.05, 1.0, 17)
            c[int(np.asarray(o["contacting_relationship"])[0])] = rng.uniform(
                0.85, 1.0)
            con.append(c)
        base += nf
    pred = {
        "boxes": np.asarray(boxes, np.float64),
        "labels": np.asarray(labels, np.int64),
        "scores": np.asarray(scores, np.float64),
        "im_idx": np.asarray(im_idx, np.float64),
        "pair_idx": np.asarray(pair_idx, np.int64),
        "attention_distribution": np.asarray(att, np.float64),
        "spatial_distribution": np.asarray(spa, np.float64),
        "contacting_distribution": np.asarray(con, np.float64),
    }
    # sgcls/sgdet read pred_labels/pred_scores while predcls reads
    # labels/scores — make them DIFFERENT arrays so a key-selection mix-up
    # in either evaluator shows up as a mode-dependent mismatch
    relab = pred["labels"].copy()
    flip = rng.uniform(size=relab.shape) < 0.2
    relab[flip] = rng.integers(1, 37, flip.sum())
    pred["pred_labels"] = relab
    pred["pred_scores"] = rng.uniform(0.1, 1.0, pred["scores"].shape)
    return pred


def _torch_pred(pred):
    return {k: torch.from_numpy(np.asarray(v)) for k, v in pred.items()}


def _build_reference(mode, constraint, semithreshold):
    from tools.utils.evaluation_recall import BasicSceneGraphEvaluator

    return BasicSceneGraphEvaluator(
        mode=mode,
        AG_object_classes=list(C.AG_OBJECT_CLASSES),
        AG_all_predicates=list(C.AG_RELATIONSHIP_CLASSES),
        AG_attention_predicates=list(C.AG_ATTENTION_RELATIONSHIPS),
        AG_spatial_predicates=list(C.AG_SPATIAL_RELATIONSHIPS),
        AG_contacting_predicates=list(C.AG_CONTACTING_RELATIONSHIPS),
        iou_threshold=0.5, constraint=constraint,
        semithreshold=semithreshold, output_dir=None,
    )


@pytest.mark.parametrize("mode", ["predcls", "sgcls"])
@pytest.mark.parametrize("constraint,semi", [("with", None), ("semi", 0.9),
                                             ("no", None)])
def test_evaluator_matches_reference(mode, constraint, semi):
    rng = np.random.default_rng(97)
    ours = SceneGraphEvaluator(mode, constraint=constraint,
                               semithreshold=semi, iou_threshold=0.5)
    ref = _build_reference(mode, constraint, semi)

    for seed in range(3):  # three videos
        vid_rng = np.random.default_rng(1000 + seed)
        gt = _make_gt(vid_rng, num_frames=3 + seed, objs_per_frame=2 + seed % 2)
        pred = _make_pred(vid_rng, gt)
        ours.evaluate_scene_graph(gt, pred)
        ref.evaluate_scene_graph(gt, _torch_pred(pred))

    ref_rec = ref.result_dict[mode + "_recall"]
    our_rec = ours.result_dict[mode + "_recall"]
    zeros = [0] * len(C.AG_RELATIONSHIP_CLASSES)
    for k in KS:
        assert len(our_rec[k]) == len(ref_rec[k]), f"R@{k} list length"
        np.testing.assert_allclose(our_rec[k], ref_rec[k], atol=1e-12,
                                   err_msg=f"R@{k} per-frame list")
        # reference quirk: hit/count dicts are created lazily on the first
        # match at that k (evaluation_recall.py:253-273) — a k with zero
        # matches leaves the key absent (and would crash the reference's
        # own calc_mrecall); our evaluator pre-initializes to zeros
        np.testing.assert_array_equal(
            ours.result_dict[mode + "_recall_hit"][k],
            ref.result_dict.get(mode + "_recall_hit", {}).get(k, zeros),
            err_msg=f"hit@{k}")
        np.testing.assert_array_equal(
            ours.result_dict[mode + "_recall_count"][k],
            ref.result_dict.get(mode + "_recall_count", {}).get(k, zeros),
            err_msg=f"count@{k}")
    mr_ours = ours.calc_mrecall()
    if all(k in ref.result_dict.get(mode + "_recall_hit", {}) for k in KS):
        mr_ref = ref.calc_mrecall()
        for k in KS:
            np.testing.assert_allclose(mr_ours[k], mr_ref[k], atol=1e-12,
                                       err_msg=f"mR@{k}")
    # sanity: the inputs actually exercise the metric
    assert 0.0 < np.mean(our_rec[20]) < 1.0


# ---------------------------------------------------------------------------
# assign_relations (tools/utils/funcs.py:6-77) — the GT assignment that
# supervises sgdet training — vs detector/sgdet.py:assign_relations
# ---------------------------------------------------------------------------

def test_assign_relations_matches_reference():
    """Inputs crafted to hit every quirk: two GT boxes whose argmax is the
    SAME detection (dedup walk), a dedup fallback that lands on a
    below-threshold detection, all-detections-taken (duplicate index kept),
    unmatched GT (supply), a frame with zero detections, and the two-stage
    assigned_labels overwrite (bulk per-detection argmax, then per-GT
    candidates for objects only)."""
    from tools.utils.funcs import assign_relations as ref_assign

    from vidsgg.detector.sgdet import assign_relations as our_assign

    def box(x, y, s=40.0):
        return [x, y, x + s, y + s]

    # frame 0: person + 2 objects; obj A and obj B both overlap det 1 most
    # frame 1: zero detections
    # frame 2: person matched; object with NO overlapping det -> supply
    gt = [
        [
            {"person_bbox": np.array([box(0, 0, 60)])},
            {"bbox": np.array(box(100, 100, 50)), "class": 7},
            {"bbox": np.array(box(104, 104, 50)), "class": 12},  # same argmax
        ],
        [
            {"person_bbox": np.array([box(10, 10, 60)])},
            {"bbox": np.array(box(200, 200, 50)), "class": 5},
        ],
        [
            {"person_bbox": np.array([box(0, 0, 60)])},
            {"bbox": np.array(box(400, 400, 30)), "class": 9},
        ],
    ]
    dets = [
        # frame 0: det0 ~ person, det1 ~ both objects, det2 far (fallback
        # target below threshold)
        (0, box(2, 2, 60)),
        (0, box(101, 101, 50)),
        (0, box(300, 5, 40)),
        # frame 2: det ~ person only
        (2, box(1, 1, 60)),
        (2, box(90, 300, 40)),
    ]
    fb = np.array([[f, *b] for f, b in dets], np.float64)
    fl = np.array([1, 7, 3, 1, 15], np.int64)

    ref_found, ref_gts, ref_supply, ref_assigned = ref_assign(
        {"FINAL_BBOXES": torch.from_numpy(fb),
         "FINAL_LABELS": torch.from_numpy(fl)},
        gt, assign_IOU_threshold=0.5)

    frame_boxes = [fb[fb[:, 0] == i, 1:] for i in range(3)]
    frame_labels = [fl[fb[:, 0] == i] for i in range(3)]
    our_found, our_gts, our_supply, our_assigned = our_assign(
        frame_boxes, frame_labels, gt, iou_thresh=0.5)

    assert [list(map(int, f)) for f in our_found] == [
        list(map(int, f)) for f in ref_found]
    # same GT items matched/supplied, in order
    for a, b in zip(our_gts, ref_gts):
        assert len(a) == len(b) and all(x is y for x, y in zip(a, b))
    for a, b in zip(our_supply, ref_supply):
        assert len(a) == len(b) and all(x is y for x, y in zip(a, b))
    np.testing.assert_array_equal(np.concatenate(our_assigned), ref_assigned)
    # the fixture actually exercised the quirks
    assert len(our_found[0]) == 3 and len(set(our_found[0])) == 3  # dedup walk
    assert len(our_supply[2]) == 1  # unmatched GT
    assert our_found[1] == [] if isinstance(our_found[1], list) else True


# ---------------------------------------------------------------------------
# obj_edge_vectors (tools/utils/word_vectors.py:15-35) — the GloVe label
# embedding init — vs models/embeddings.py, from one shared synthetic cache
# ---------------------------------------------------------------------------

def test_obj_edge_vectors_matches_reference(tmp_path):
    """Build a tiny glove-format txt covering the three lookup paths
    (direct split('/')[0] hit, longest-space-separated-word fallback, total
    miss), load it through BOTH stacks (the reference's txt->pt loader and
    our txt->npz builder + loader), and assert matched rows are equal and
    the same rows miss (misses keep each stack's random init by design)."""
    from tools.utils.word_vectors import obj_edge_vectors as ref_wv

    from vidsgg.models.embeddings import build_npz_from_glove_txt
    from vidsgg.models.embeddings import obj_edge_vectors as our_wv

    dim = 8
    rng = np.random.default_rng(3)
    words = ["sofa", "cup", "glass", "person", "table"]
    txt = tmp_path / f"glove.6B.{dim}d.txt"
    with open(txt, "w") as f:
        for w in words:
            vals = " ".join(f"{v:.6f}" for v in rng.standard_normal(dim))
            f.write(f"{w} {vals}\n")

    names = [
        "sofa/couch",        # split('/')[0] hit
        "cup/glass/bottle",  # split('/')[0] hit
        "wine glass",        # miss on 'wine glass'.split('/')[0] -> longest word 'glass'
        "person",            # direct hit
        "doorknob",          # total miss (random/pseudo init)
    ]
    ref = ref_wv(names, wv_type="glove.6B", wv_dir=str(tmp_path), wv_dim=dim)

    npz = tmp_path / "wv.npz"
    build_npz_from_glove_txt(str(txt), str(npz), wv_dim=dim)
    ours = our_wv(names, wv_dim=dim, wv_path=str(npz))

    hit = [0, 1, 2, 3]
    np.testing.assert_allclose(ours[hit], ref.numpy()[hit], atol=1e-6,
                               err_msg="matched GloVe rows")
    # the miss row keeps random init on the torch side — only assert OUR
    # miss is the documented deterministic pseudo-vector, not a table row
    from vidsgg.models.embeddings import _pseudo_vector
    np.testing.assert_allclose(ours[4], _pseudo_vector("doorknob", dim))
