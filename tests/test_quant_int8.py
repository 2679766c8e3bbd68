"""Int8 detector serving path (vidsgg/detector/quant.py).

No reference counterpart — the reference serves its frozen Faster R-CNN in
fp32 (object_detector.py:85-94); int8 PTQ is TPU deployment capability this
port adds. Correctness contract tested here:

- record mode is bit-identical to the plain conv and accumulates abs-max
  activation scales;
- the quantized conv tracks the f32 conv within the 8-bit error budget;
- one param tree serves all modes (off/record/int8);
- the calibrate -> int8 flow holds through the full tiny FasterRCNN and
  the SgdetFrontend detect jit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsgg.detector.faster_rcnn import FasterRCNN
from vidsgg.detector.quant import QuantConv, calibrate, quantize_symmetric
from vidsgg.detector.resnet import ResNet101Base
from vidsgg.detector.rpn import RPNConfig


def test_quantize_symmetric_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(64, 32).astype(np.float32))
    s = jnp.abs(x).max()
    xq = quantize_symmetric(x, s)
    assert xq.dtype == jnp.int8
    back = xq.astype(jnp.float32) * (s / 127.0)
    # symmetric abs-max quantization: error <= half a quantization step
    assert float(jnp.abs(back - x).max()) <= float(s) / 127.0 / 2 + 1e-6
    # extremes hit the int8 rails exactly
    assert int(jnp.abs(xq).max()) == 127


def _conv_pair(mode, x, rng):
    qc = QuantConv(8, (3, 3), strides=2, padding=1, mode=mode)
    vars_ = qc.init(rng, x)
    return qc, vars_


def test_record_mode_matches_plain_conv_and_records_scale():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4)) * 3.0
    qc, vars_ = _conv_pair("record", x, rng)
    assert float(vars_["quant"]["act_scale"]) == 0.0  # init is neutral

    y, muts = qc.apply(vars_, x, mutable=["quant"])
    ref = jax.lax.conv_general_dilated(
        x, vars_["params"]["kernel"], (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))
    assert float(muts["quant"]["act_scale"]) == pytest.approx(
        float(jnp.abs(x).max())
    )

    # abs-max accumulates across calibration batches (max, not last-wins)
    vars2 = {**vars_, **muts}
    _, muts2 = qc.apply(vars2, x * 0.1, mutable=["quant"])
    assert float(muts2["quant"]["act_scale"]) == pytest.approx(
        float(jnp.abs(x).max())
    )


def test_int8_conv_tracks_f32_within_8bit_budget():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16)) * 2.0
    qc_rec, vars_ = _conv_pair("record", x, rng)
    _, muts = qc_rec.apply(vars_, x, mutable=["quant"])
    vars_ = {**vars_, **muts}

    qc_int8 = QuantConv(8, (3, 3), strides=2, padding=1, mode="int8")
    y8 = qc_int8.apply(vars_, x)
    yref = qc_rec.apply(vars_, x, mutable=["quant"])[0]
    # error budget: each of the two int8 operands contributes <=1/254
    # relative step noise; across a 3x3x16 reduction the output SNR stays
    # well under 2% rms relative to the activation magnitude
    denom = float(jnp.abs(yref).max())
    rms = float(jnp.sqrt(jnp.mean((y8 - yref) ** 2))) / denom
    assert rms < 0.02, rms
    assert y8.dtype == yref.dtype


def test_one_param_tree_serves_all_modes():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 32, 32, 3))
    off = ResNet101Base(blocks=(1, 1, 1), quant="off")
    rec = ResNet101Base(blocks=(1, 1, 1), quant="record")
    v_off = off.init(rng, x)
    v_rec = rec.init(rng, x)
    # identical param trees (same names, shapes) -> weights load once
    assert jax.tree_util.tree_structure(
        v_off["params"]
    ) == jax.tree_util.tree_structure(v_rec["params"])
    leaves_off = jax.tree_util.tree_leaves(v_off["params"])
    leaves_rec = jax.tree_util.tree_leaves(v_rec["params"])
    assert [a.shape for a in leaves_off] == [a.shape for a in leaves_rec]
    # record mode with frozen-detector params is bit-identical to off mode
    y_off = off.apply(v_off, x)
    y_rec, _ = rec.apply(v_off | {"quant": v_rec["quant"]}, x,
                         mutable=["quant"])
    np.testing.assert_array_equal(np.asarray(y_off), np.asarray(y_rec))


def _tiny_detector(quant):
    return FasterRCNN(
        rpn_cfg=RPNConfig(pre_nms_top_n=64, post_nms_top_n=16),
        base_blocks=(1, 1, 1), head_blocks=1, quant=quant,
    )


def test_calibrated_int8_backbone_tracks_f32():
    rng = jax.random.PRNGKey(0)
    chunks = [
        jnp.asarray(
            np.random.RandomState(i).rand(2, 64, 96, 3).astype(np.float32)
        ) * 120.0 - 60.0
        for i in range(3)
    ]
    im_hw = jnp.array([64.0, 96.0])
    rec = _tiny_detector("record")
    vars_ = rec.init(rng, chunks[0], im_hw)
    vars_ = calibrate(rec, vars_, [(c, im_hw) for c in chunks])
    # every QuantConv saw data: no act_scale left at its zero init
    scales = jax.tree_util.tree_leaves(vars_["quant"])
    assert all(float(s) > 0 for s in scales)

    srv = _tiny_detector("int8")
    base8 = srv.apply(vars_, chunks[0], method="base_features")
    basef = _tiny_detector("off").apply(
        {k: vars_[k] for k in ("params", "batch_stats")},
        chunks[0], method="base_features",
    )
    denom = float(jnp.abs(basef).max()) + 1e-6
    rms = float(jnp.sqrt(jnp.mean((base8 - basef) ** 2))) / denom
    assert rms < 0.05, rms  # 3 quantized convs deep + residual glue
    # quantization noise must not be degenerate (all-zero / saturated)
    assert float(jnp.abs(base8).max()) > 0


def test_quantize_calibration_stays_on_serving_grid(monkeypatch):
    """Calibration compiles must land on the serving (canvas, bucket) grid:
    with ``max_frames`` given, over-long videos truncate to the largest
    serving frame bucket instead of compiling a one-off shape (the record
    passes would otherwise pay a throwaway multi-minute remote compile, or
    OOM padding a 100+-frame video)."""
    from vidsgg.cli.data_source import build_detector, quantize_detector_int8
    from vidsgg.data import synthetic_video_annotation

    class _LongVideoDataset:
        gt_annotations = [
            synthetic_video_annotation(num_frames=40, objs_per_frame=2,
                                       seed=0, image_wh=(64, 48))
        ]

        def __len__(self):
            return 1

        def load_video_frames(self, i):
            return np.zeros((40, 48, 64, 3), np.float32), 1.0

    captured = {}

    def fake_calibrate(rec, vars_, inputs):
        captured["shapes"] = [tuple(np.shape(a)) for a, _ in inputs]
        return vars_

    monkeypatch.setattr("vidsgg.detector.quant.calibrate", fake_calibrate)
    det, det_vars, canvases = build_detector(None, tiny=True, frame_size=48)
    quantize_detector_int8(
        det, det_vars, _LongVideoDataset(), canvases, num_videos=1,
        max_frames=16,
    )
    f = captured["shapes"][0][0]
    assert f == 16, captured["shapes"]


def test_int8_detector_feeds_gt_featurize_source():
    """--int8 on the TRAIN CLIs also covers predcls/sgcls: the quantized
    detector's base_features/head_to_tail methods feed make_ag_source's GT
    featurization (cli/tempura_train.py applies quantize_detector_int8
    before the mode branch). Entries must stay finite and track the f32
    source within the quantization error budget."""
    from vidsgg.cli.data_source import (
        build_detector,
        default_buckets,
        make_ag_source,
        quantize_detector_int8,
    )
    from vidsgg.data import synthetic_video_annotation

    class _RandFrameDataset:
        def __init__(self, frame_counts):
            self.gt_annotations = [
                synthetic_video_annotation(
                    num_frames=f, objs_per_frame=2, seed=i, image_wh=(64, 48)
                )
                for i, f in enumerate(frame_counts)
            ]

        def __len__(self):
            return len(self.gt_annotations)

        def load_video_frames(self, i):
            f = len(self.gt_annotations[i])
            frames = np.random.RandomState(i).rand(f, 48, 64, 3)
            return (frames * 120.0 - 60.0).astype(np.float32), 1.0

    ds = _RandFrameDataset([4, 6])
    det, det_vars, canvases = build_detector(None, tiny=True, frame_size=48)
    det8, vars8 = quantize_detector_int8(
        det, det_vars, ds, canvases, num_videos=1, max_frames=16
    )
    buckets = default_buckets(max_frames=16)

    def pull(model, variables):
        src = make_ag_source(ds, buckets[-1], model, variables,
                             shuffle=False, buckets=buckets,
                             canvases=canvases)
        return list(src())

    got8, gotf = pull(det8, vars8), pull(det, det_vars)
    assert len(got8) == len(gotf) == 2
    for (e8, _, _), (ef, _, _) in zip(got8, gotf):
        n = int(np.asarray(e8.obj_mask).sum())
        f8 = np.asarray(e8.features)[:n]
        ff = np.asarray(ef.features)[:n]
        assert np.isfinite(f8).all()
        rms = float(np.sqrt(np.mean((f8 - ff) ** 2)))
        assert rms < 0.05 * (float(np.abs(ff).max()) + 1e-6), rms


def test_sgdet_frontend_runs_int8():
    from vidsgg.data.entry import EntryCapacity
    from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend

    rng = jax.random.PRNGKey(0)
    frames = jnp.asarray(
        np.random.RandomState(0).rand(4, 64, 96, 3).astype(np.float32)
    ) * 120.0 - 60.0
    im_hw = jnp.array([64.0, 96.0])
    rec = _tiny_detector("record")
    vars_ = rec.init(rng, frames, im_hw)
    vars_ = calibrate(rec, vars_, [(frames, im_hw)])

    frontend = SgdetFrontend(
        _tiny_detector("int8"), vars_,
        SgdetCaps(dets_per_frame=4, supply_cap=8),
        EntryCapacity(max_frames=4, max_objs=16, max_pairs=24),
    )
    entry, fmaps = frontend(frames, im_hw, 1.0, is_train=False)
    assert entry.boxes.shape[0] == 16
    assert np.isfinite(np.asarray(entry.boxes)).all()
    assert np.isfinite(np.asarray(fmaps)).all()
