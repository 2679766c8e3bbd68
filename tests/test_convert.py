"""Checkpoint-converter audit: a synthesized full jwyang-layout state_dict
(the ``faster_rcnn_ag.pth`` schema, object_detector.py:28-31) round-trips
with (a) every torch key consumed, (b) every Flax param/batch_stat written
at the right shape, (c) numeric forward parity of a bottleneck and the RPN
conv against a NumPy transcription of the torch semantics."""

import numpy as np
import pytest

from vidsgg.detector.convert import (
    convert_jwyang_state_dict,
    expected_variable_shapes,
    validate_converted,
)

RNG = np.random.RandomState(0)


def _bn_keys(prefix, c, sd):
    sd[f"{prefix}.weight"] = RNG.randn(c).astype(np.float32)
    sd[f"{prefix}.bias"] = RNG.randn(c).astype(np.float32)
    sd[f"{prefix}.running_mean"] = RNG.randn(c).astype(np.float32)
    sd[f"{prefix}.running_var"] = RNG.rand(c).astype(np.float32) + 0.5
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(100)


def _bottleneck_keys(prefix, inplanes, planes, sd, downsample):
    sd[f"{prefix}.conv1.weight"] = RNG.randn(planes, inplanes, 1, 1).astype(np.float32)
    _bn_keys(f"{prefix}.bn1", planes, sd)
    sd[f"{prefix}.conv2.weight"] = RNG.randn(planes, planes, 3, 3).astype(np.float32)
    _bn_keys(f"{prefix}.bn2", planes, sd)
    sd[f"{prefix}.conv3.weight"] = RNG.randn(planes * 4, planes, 1, 1).astype(np.float32)
    _bn_keys(f"{prefix}.bn3", planes * 4, sd)
    if downsample:
        sd[f"{prefix}.downsample.0.weight"] = RNG.randn(
            planes * 4, inplanes, 1, 1
        ).astype(np.float32)
        _bn_keys(f"{prefix}.downsample.1", planes * 4, sd)


def synth_jwyang_state_dict():
    """Full ResNet-101 Faster R-CNN state_dict in the jwyang layout."""
    sd = {}
    sd["RCNN_base.0.weight"] = RNG.randn(64, 3, 7, 7).astype(np.float32)
    _bn_keys("RCNN_base.1", 64, sd)
    inplanes = 64
    for stem, (planes, blocks) in zip(
        ("4", "5", "6"), ((64, 3), (128, 4), (256, 23))
    ):
        for b in range(blocks):
            _bottleneck_keys(
                f"RCNN_base.{stem}.{b}", inplanes if b == 0 else planes * 4,
                planes, sd, downsample=b == 0,
            )
        inplanes = planes * 4
    for b in range(3):  # RCNN_top.0 = layer4
        _bottleneck_keys(
            f"RCNN_top.0.{b}", 1024 if b == 0 else 2048, 512, sd, downsample=b == 0
        )
    sd["RCNN_rpn.RPN_Conv.weight"] = RNG.randn(512, 1024, 3, 3).astype(np.float32)
    sd["RCNN_rpn.RPN_Conv.bias"] = RNG.randn(512).astype(np.float32)
    sd["RCNN_rpn.RPN_cls_score.weight"] = RNG.randn(24, 512, 1, 1).astype(np.float32)
    sd["RCNN_rpn.RPN_cls_score.bias"] = RNG.randn(24).astype(np.float32)
    sd["RCNN_rpn.RPN_bbox_pred.weight"] = RNG.randn(48, 512, 1, 1).astype(np.float32)
    sd["RCNN_rpn.RPN_bbox_pred.bias"] = RNG.randn(48).astype(np.float32)
    sd["RCNN_cls_score.weight"] = RNG.randn(37, 2048).astype(np.float32)
    sd["RCNN_cls_score.bias"] = RNG.randn(37).astype(np.float32)
    sd["RCNN_bbox_pred.weight"] = RNG.randn(148, 2048).astype(np.float32)
    sd["RCNN_bbox_pred.bias"] = RNG.randn(148).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def round_trip():
    sd = synth_jwyang_state_dict()
    converted = convert_jwyang_state_dict(sd, strict=True)
    return sd, converted


def test_full_coverage_of_flax_tree(round_trip):
    """Every Flax param/batch_stat of the REAL ResNet-101 FasterRCNN is
    written with the right shape — nothing can silently stay at init."""
    _, converted = round_trip
    validate_converted(converted, expected_variable_shapes())


def test_unconsumed_torch_key_raises():
    sd = synth_jwyang_state_dict()
    sd["RCNN_base.4.0.bogus.weight"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError, match="not consumed"):
        convert_jwyang_state_dict(sd, strict=True)


def test_missing_torch_key_fails_validation():
    sd = synth_jwyang_state_dict()
    del sd["RCNN_base.6.12.conv2.weight"]  # deep inside layer3
    converted = convert_jwyang_state_dict(sd, strict=True)
    with pytest.raises(ValueError, match="MISSING.*layer3_12"):
        validate_converted(converted, expected_variable_shapes())


def test_transpose_conventions(round_trip):
    sd, converted = round_trip
    p = converted["params"]
    assert np.array_equal(
        p["base"]["conv1"]["kernel"],
        np.transpose(sd["RCNN_base.0.weight"], (2, 3, 1, 0)),
    )
    assert np.array_equal(
        p["cls_score"]["kernel"], sd["RCNN_cls_score.weight"].T
    )
    assert np.array_equal(
        p["base"]["layer2_1"]["conv2"]["kernel"],
        np.transpose(sd["RCNN_base.5.1.conv2.weight"], (2, 3, 1, 0)),
    )
    assert np.array_equal(
        converted["batch_stats"]["head"]["layer4_0"]["downsample_bn"]["mean"],
        sd["RCNN_top.0.0.downsample.1.running_mean"],
    )


# ---------------------------------------------------------------------------
# numeric forward parity vs a NumPy transcription of torch semantics
# ---------------------------------------------------------------------------


def _np_conv2d(x, w, stride=1, pad=0, bias=None):
    """NCHW-free NumPy conv: x [H, W, Cin], w torch-layout [O, I, kh, kw]."""
    o, i, kh, kw = w.shape
    xp = np.pad(x, ((pad, pad), (pad, pad), (0, 0)))
    H = (xp.shape[0] - kh) // stride + 1
    W = (xp.shape[1] - kw) // stride + 1
    cols = np.zeros((H, W, i * kh * kw), np.float64)
    for y in range(H):
        for xx in range(W):
            patch = xp[y * stride : y * stride + kh, xx * stride : xx * stride + kw]
            cols[y, xx] = patch.transpose(2, 0, 1).reshape(-1)
    wm = w.reshape(o, -1).astype(np.float64)  # [O, I*kh*kw]
    out = cols @ wm.T
    if bias is not None:
        out = out + bias
    return out


def _np_bn(x, sd, prefix, eps=1e-5):
    return (
        (x - sd[f"{prefix}.running_mean"])
        / np.sqrt(sd[f"{prefix}.running_var"] + eps)
        * sd[f"{prefix}.weight"]
        + sd[f"{prefix}.bias"]
    )


def test_bottleneck_forward_parity(round_trip):
    import jax
    import jax.numpy as jnp

    from vidsgg.detector.resnet import Bottleneck

    sd, converted = round_trip
    pre = "RCNN_base.4.0"  # layer1 block 0 (with downsample)
    x = RNG.randn(6, 6, 64).astype(np.float32)

    # NumPy transcription of the torch bottleneck
    h = np.maximum(_np_bn(_np_conv2d(x, sd[f"{pre}.conv1.weight"]), sd, f"{pre}.bn1"), 0)
    h = np.maximum(
        _np_bn(_np_conv2d(h, sd[f"{pre}.conv2.weight"], pad=1), sd, f"{pre}.bn2"), 0
    )
    h = _np_bn(_np_conv2d(h, sd[f"{pre}.conv3.weight"]), sd, f"{pre}.bn3")
    idn = _np_bn(
        _np_conv2d(x, sd[f"{pre}.downsample.0.weight"]), sd, f"{pre}.downsample.1"
    )
    want = np.maximum(h + idn, 0)

    block = Bottleneck(planes=64, stride=1, downsample=True)
    variables = {
        "params": converted["params"]["base"]["layer1_0"],
        "batch_stats": converted["batch_stats"]["base"]["layer1_0"],
    }
    got = np.asarray(block.apply(variables, jnp.asarray(x)[None]))[0]
    assert np.allclose(got, want, atol=2e-2), np.abs(got - want).max()


def _flax_conv(x, p, pad=0):
    """Apply a converted flax conv param dict in NumPy (NHWC kernel)."""
    k = np.asarray(p["kernel"])  # [kh, kw, I, O]
    w_torch = np.transpose(k, (3, 2, 0, 1))
    return _np_conv2d(x, w_torch, pad=pad, bias=np.asarray(p["bias"]))


def test_rpn_head_forward_parity(round_trip):
    """Converted RPN convs reproduce the torch RPN head numerically (conv
    3x3 relu -> 1x1 score / 1x1 bbox), validating layout + bias handling."""
    sd, converted = round_trip
    x = RNG.randn(4, 4, 1024).astype(np.float32)
    h = np.maximum(
        _np_conv2d(x, sd["RCNN_rpn.RPN_Conv.weight"], pad=1,
                   bias=sd["RCNN_rpn.RPN_Conv.bias"]),
        0,
    )
    want_score = _np_conv2d(h.astype(np.float32),
                            sd["RCNN_rpn.RPN_cls_score.weight"],
                            bias=sd["RCNN_rpn.RPN_cls_score.bias"])
    want_bbox = _np_conv2d(h.astype(np.float32),
                           sd["RCNN_rpn.RPN_bbox_pred.weight"],
                           bias=sd["RCNN_rpn.RPN_bbox_pred.bias"])

    p = converted["params"]["rpn"]
    hh = np.maximum(_flax_conv(x, p["rpn_conv"], pad=1), 0)
    got_score = _flax_conv(hh.astype(np.float32), p["rpn_cls_score"])
    got_bbox = _flax_conv(hh.astype(np.float32), p["rpn_bbox_pred"])
    assert np.allclose(got_score, want_score, atol=1e-4)
    assert np.allclose(got_bbox, want_bbox, atol=1e-4)
