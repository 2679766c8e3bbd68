"""int8 PTQ accuracy gate, SCORED: f32 vs --int8 R/mR delta on a disk fixture.

The bench advertises int8 serving throughput; this test backs it with a
measured accuracy delta on real (fixture) data — the same
``scripts/compare_int8_metrics.py`` flow a user runs on the full AG assets,
here on an AG-format disk fixture with the tiny detector.  predcls isolates
the quantized component: the detector extracts the 2048-d object features
the relation model consumes (GT boxes), so the delta is exactly the PTQ
feature perturbation carried through STTran + the GMM heads to the printed
R@K/mR@K grid (reference serving stack: object_detector.py feature path).

Gate: the with-constraint R@K drop must stay within the script's default
PTQ budget (0.005 absolute) — the same acceptance bar the script enforces
for production runs. docs/PERF.md publishes the scored delta.
"""

import os
import pickle
import sys

import numpy as np
import pytest

FRAME_H, FRAME_W = 48, 64
SPATIAL = ["above", "beneath", "in_front_of", "behind", "on_the_side_of", "in"]
CONTACT = ["holding", "leaning_on", "sitting_on", "touching"]
ATTENTION = ["looking_at", "not_looking_at", "unsure"]


@pytest.fixture(scope="module")
def ag_root(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("ag_int8")
    os.makedirs(root / "annotations")
    person, objects = {}, {}
    rng = np.random.RandomState(5)

    def add_frame(vid, f, objs):
        key = f"{vid}/{f:06d}.png"
        person[key] = {
            "bbox": np.array([[4.0, 4.0, 36.0, 44.0]], np.float32),
            "bbox_size": (FRAME_W, FRAME_H),
        }
        objects[key] = [{
            "class": cls,
            # spread boxes so ROI features differ per object
            "bbox": [6.0 + 9 * k, 6.0 + 5 * k, 20.0 + 3 * k, 18.0 + 4 * k],
            "attention_relationship": [ATTENTION[(f + k) % 3]],
            "spatial_relationship": [SPATIAL[(f + 2 * k) % 6]],
            "contacting_relationship": [CONTACT[(f + k) % 4]],
            "visible": True,
            "metadata": {"set": "test"},
        } for k, cls in enumerate(objs)]
        os.makedirs(root / "frames" / vid, exist_ok=True)
        img = rng.randint(0, 255, (FRAME_H, FRAME_W, 3), np.uint8)
        assert cv2.imwrite(str(root / "frames" / key), img)

    # 4 objects/frame -> 12 GT triplets vs 4*26 ranked candidates per
    # frame: R@10 sits strictly inside (0, 1), so a PTQ-induced rank flip
    # is visible in the grid
    for f in range(4):
        add_frame("A.mp4", f, ("chair", "book", "cup/glass/bottle", "bag"))
    for f in range(3):
        add_frame("B.mp4", f, ("bed", "blanket", "box", "clothes"))
    with open(root / "annotations/person_bbox.pkl", "wb") as fh:
        pickle.dump(person, fh)
    with open(root / "annotations/object_bbox_and_relationship.pkl", "wb") as fh:
        pickle.dump(objects, fh)
    return str(root)


def test_int8_accuracy_gate_scored(ag_root):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.compare_int8_metrics import compare

    rows, worst, ok = compare([
        "--mode", "predcls", "--data_path", ag_root,
        "--tiny_detector", "--frame_size", str(FRAME_H),
        "--int8_calib", "1",
    ])
    print("int8 gate rows:", rows)
    # the gate itself: worst with-constraint R@K delta within the budget
    assert ok, f"int8 accuracy gate FAILED: worst delta {worst:+.6f}\n{rows}"
    # and the comparison must be non-degenerate: a real grid, not all-zero
    assert 0.0 < rows["with_R@10"]["f32"] < 1.0
    assert 0.0 < rows["with_R@10"]["int8"] < 1.0
