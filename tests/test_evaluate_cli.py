"""Qualitative-evaluation CLI: JSON + PNG suite actually gets written.

Covers the reference's evaluate surface (TEMPURA_evaluate.py:52-88 +
tools/utils/visualize.py:135-293): the CLI runs videos through the model
and emits triplet JSON, per-frame scene-graph overlays, a GT-vs-pred
heatmap, and a contacting t-SNE. One synthetic run per family (fast), plus
one AG-format disk-fixture run through the real source + tiny detector
(frames reloaded + denormalized for the overlays).
"""

import json
import os
import pickle

import numpy as np
import pytest

FRAME_H, FRAME_W = 48, 64


@pytest.fixture(scope="module")
def ag_root(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("ag_eval")
    os.makedirs(root / "annotations")
    person, objects = {}, {}
    rng = np.random.RandomState(3)

    def add_frame(vid, f, objs=("chair",)):
        key = f"{vid}/{f:06d}.png"
        person[key] = {
            "bbox": np.array([[4.0, 4.0, 36.0, 44.0]], np.float32),
            "bbox_size": (FRAME_W, FRAME_H),
        }
        objects[key] = [{
            "class": cls,
            "bbox": [14.0 + 6 * k, 8.0 + 4 * k, 22.0, 24.0],
            "attention_relationship": ["looking_at"],
            "spatial_relationship": ["in_front_of"],
            "contacting_relationship": ["sitting_on"],
            "visible": True,
            "metadata": {"set": "test"},
        } for k, cls in enumerate(objs)]
        os.makedirs(root / "frames" / vid, exist_ok=True)
        img = rng.randint(0, 255, (FRAME_H, FRAME_W, 3), np.uint8)
        assert cv2.imwrite(str(root / "frames" / key), img)

    for f in range(3):
        add_frame("E.mp4", f)
    for f in range(3):
        add_frame("F.mp4", f, objs=("chair", "food"))
    with open(root / "annotations/person_bbox.pkl", "wb") as fh:
        pickle.dump(person, fh)
    with open(root / "annotations/object_bbox_and_relationship.pkl", "wb") as fh:
        pickle.dump(objects, fh)
    return str(root)


def _assert_outputs(out, n_videos, expect_frames=True):
    with open(os.path.join(out, "predictions.json")) as f:
        preds = json.load(f)
    assert len(preds) == n_videos
    v0 = preds["video_000"]
    frame0 = next(iter(v0.values()))
    trip = next(iter(frame0.values()))
    assert {"subject", "attention_rel", "spatial_rel", "contact_rel",
            "object"} <= set(trip)
    assert os.path.exists(os.path.join(out, "video_000", "gt_vs_pred.png"))
    vdir = os.path.join(out, "video_000")
    if expect_frames:
        pngs = [p for p in os.listdir(vdir) if p.startswith("frame_")]
        assert pngs, "no scene-graph overlay PNGs written"
        # GT-side overlays (Viz_GT_Scene_Graph equivalent)
        gt_pngs = [p for p in os.listdir(vdir) if p.startswith("gt_frame_")]
        assert gt_pngs, "no GT scene-graph overlay PNGs written"
    # per-object temporal-consistency matrices (Viz_Temporal_Consistency)
    tc_pngs = [p for p in os.listdir(vdir) if p.startswith("tempcons_")]
    assert tc_pngs, "no temporal-consistency matrix PNGs written"
    assert os.path.exists(os.path.join(out, "tsne_contact.png"))


def test_tempura_evaluate_synthetic_viz(tmp_path):
    from vidsgg.cli import tempura_evaluate

    out = str(tmp_path / "viz")
    tempura_evaluate.main([
        "--mode", "predcls", "--synthetic", "3", "--viz", "--out", out,
        "-enc_layer", "1", "-dec_layer", "1", "-K", "2",
    ])
    _assert_outputs(out, 3)


def test_teatgt_evaluate_synthetic_viz(tmp_path):
    from vidsgg.cli import teatgt_evaluate

    out = str(tmp_path / "viz_tg")
    teatgt_evaluate.main([
        "--mode", "predcls", "--synthetic", "2", "--viz", "--out", out,
        "--encoder_layers", "1", "--encoder_attention_heads", "2",
    ])
    _assert_outputs(out, 2)


def test_tempura_evaluate_ag_fixture_viz(ag_root, tmp_path):
    """Real(-format) path: AG pickles + frames -> GT-box source -> pipeline
    -> overlays drawn on the reloaded, denormalized frames."""
    from vidsgg.cli import tempura_evaluate

    out = str(tmp_path / "viz_ag")
    tempura_evaluate.main([
        "--mode", "predcls", "--data_path", ag_root, "--viz", "--out", out,
        "--frame_size", str(FRAME_H), "--tiny_detector",
        "--bucket_frames", "16",
        "-enc_layer", "1", "-dec_layer", "1", "-K", "2",
    ])
    _assert_outputs(out, 2)
    # overlay was drawn on a real decoded frame (exists and is non-trivial)
    p = os.path.join(out, "video_000")
    png = sorted(os.listdir(p))[0]
    assert os.path.getsize(os.path.join(p, png)) > 1000
