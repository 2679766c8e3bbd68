"""Paired sgdet eval frontend: several same-canvas videos through ONE
detect dispatch must reproduce the single-video device frontend exactly —
including videos whose TRUE resolutions/scales differ under the shared
padded canvas (per-frame im_hw/im_scale thread through proposal clipping,
object_detector.py:106, and box rescaling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsgg.data import EntryCapacity
from vidsgg.detector.faster_rcnn import FasterRCNN
from vidsgg.detector.rpn import RPNConfig
from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend

CAP = EntryCapacity(max_frames=4, max_objs=32, max_pairs=16)
H, W = 64, 96
F = 2


@pytest.fixture(scope="module")
def frontend():
    model = FasterRCNN(
        rpn_cfg=RPNConfig(pre_nms_top_n=64, post_nms_top_n=16),
        base_blocks=(1, 1, 1), head_blocks=1,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), jnp.array([float(H), float(W)])
    )
    return SgdetFrontend(
        model, variables, SgdetCaps(dets_per_frame=8, supply_cap=16), CAP
    )


def _videos():
    rng = np.random.RandomState(7)
    vids = []
    # two videos on the same (H, W) canvas with DIFFERENT true sizes/scales
    for true_hw, scale in (((H, W), 1.0), ((48, 80), 1.25)):
        frames = np.zeros((F, H, W, 3), np.float32)
        frames[:, : true_hw[0], : true_hw[1]] = rng.rand(
            F, true_hw[0], true_hw[1], 3
        )
        vids.append(
            (
                jnp.asarray(frames),
                (float(true_hw[0]), float(true_hw[1])),
                scale,
                (true_hw[1] / scale, true_hw[0] / scale),
                F,
            )
        )
    return vids


def test_pair_matches_single(frontend):
    vids = _videos()
    paired = frontend.eval_pair(vids)
    for (frames, hw, scale, vsize, nf), (pe, pbf) in zip(vids, paired):
        se, sbf = frontend(
            frames, jnp.asarray(hw), scale, is_train=False,
            video_size=vsize, num_frames=nf,
        )
        np.testing.assert_allclose(
            np.asarray(pbf), np.asarray(sbf), rtol=2e-5, atol=1e-5
        )
        for name in (
            "boxes", "scores", "distribution", "features", "obj_mask",
            "pred_labels", "im_scale", "num_frames", "video_size",
        ):
            np.testing.assert_allclose(
                np.asarray(getattr(pe, name)),
                np.asarray(getattr(se, name)),
                rtol=2e-5, atol=1e-5, err_msg=name,
            )


def test_per_frame_hw_scale_detect_matches_per_video(frontend):
    """make_detect_fn with [F,2]/[F] operands == two scalar-operand calls."""
    vids = _videos()
    frames = jnp.concatenate([v[0] for v in vids], axis=0)
    hw_pf = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(v[1]), (F, 2)) for v in vids]
    )
    sc_pf = jnp.concatenate([jnp.full((F,), v[2], jnp.float32) for v in vids])
    batched = frontend.detect(frontend.variables, frames, hw_pf, sc_pf)
    for i, v in enumerate(vids):
        single = frontend.detect(
            frontend.variables, v[0], jnp.asarray(v[1]), jnp.asarray(v[2])
        )
        for k in ("boxes", "scores", "mask", "dists"):
            np.testing.assert_allclose(
                np.asarray(batched[k][i * F : (i + 1) * F]),
                np.asarray(single[k]),
                rtol=2e-5, atol=1e-5, err_msg=k,
            )
