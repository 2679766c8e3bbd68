"""KCC demo CLI end-to-end: frames on disk -> sgdet -> triplet JSON
(reference KCC_TEMPURA.py surface), paired serving included."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def kcc_root(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("kcc")
    for i, name in enumerate(("vidA", "vidB", "vidC")):
        d = root / "dataset" / name / "frame"
        os.makedirs(d)
        rng = np.random.RandomState(i)
        for f in range(3):
            img = rng.randint(0, 255, (48, 64, 3), np.uint8)
            assert cv2.imwrite(str(d / f"{f:06d}.png"), img)
    return str(root)


def test_kcc_demo_paired_matches_single(kcc_root, tmp_path):
    """The demo runs from disk with the tiny-detector rehearsal hooks, and
    --pair_detect 2 (3 videos -> one pair + one flush remainder) produces
    the same triplet JSON as the single-video path."""
    from vidsgg.cli import kcc_demo

    flags = ["--data_path", kcc_root, "--tiny_detector",
             "--frame_size", "48", "--max_frames", "8"]
    out1 = str(tmp_path / "single.json")
    kcc_demo.main(flags + ["--out", out1])
    out2 = str(tmp_path / "paired.json")
    kcc_demo.main(flags + ["--out", out2, "--pair_detect", "2"])

    with open(out1) as f:
        single = json.load(f)
    with open(out2) as f:
        paired = json.load(f)
    assert set(single) == {"vidA", "vidB", "vidC"}
    assert paired == single


def test_kcc_demo_int8_serving(kcc_root, tmp_path):
    """--int8 drives calibrate -> quantized detector through the full demo
    surface: the run completes and emits well-formed per-video JSON (exact
    triplet equality with f32 is not required — detection top-k under
    quantization noise is legitimately unstable with random weights)."""
    from vidsgg.cli import kcc_demo

    out = str(tmp_path / "int8.json")
    kcc_demo.main(["--data_path", kcc_root, "--tiny_detector",
                   "--frame_size", "48", "--max_frames", "8",
                   "--int8", "--int8_calib", "2", "--out", out])
    with open(out) as f:
        preds = json.load(f)
    assert set(preds) == {"vidA", "vidB", "vidC"}
    assert all(isinstance(v, dict) for v in preds.values())
    assert any(preds.values())  # the quantized path still detects/relates
