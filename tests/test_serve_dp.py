"""Multi-chip SERVING (--data_parallel on the test CLIs): the pair group
shards over the device mesh — detect along the video/frame axis, the fused
relation stage along the video axis — and must equal the unsharded path.
Runs on the virtual 8-device CPU mesh (tests/conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsgg.data import EntryCapacity
from vidsgg.detector.faster_rcnn import FasterRCNN
from vidsgg.detector.rpn import RPNConfig
from vidsgg.detector.sgdet import SgdetCaps, SgdetFrontend
from vidsgg.runtime.mesh import make_mesh, replicate_sharding

CAP = EntryCapacity(max_frames=4, max_objs=32, max_pairs=16)
H, W = 64, 96
F = 2


@pytest.fixture(scope="module")
def det():
    model = FasterRCNN(
        rpn_cfg=RPNConfig(pre_nms_top_n=64, post_nms_top_n=16),
        base_blocks=(1, 1, 1), head_blocks=1,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        jnp.array([float(H), float(W)]),
    )
    return model, variables


def _videos(n=2):
    rng = np.random.RandomState(7)
    return [
        (jnp.asarray(rng.rand(F, H, W, 3), jnp.float32),
         (float(H), float(W)), 1.0, (float(W), float(H)), F)
        for _ in range(n)
    ]


def test_sharded_frontend_pair_matches_unsharded(det):
    model, variables = det
    mesh = make_mesh(2)
    plain = SgdetFrontend(model, variables, SgdetCaps(dets_per_frame=8), CAP)
    sharded = SgdetFrontend(model, variables, SgdetCaps(dets_per_frame=8),
                            CAP, mesh=mesh)
    vids = _videos(2)
    e_p, bf_p, n_p = plain.eval_pair_batched(vids)
    e_s, bf_s, n_s = sharded.eval_pair_batched(vids)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_s))
    np.testing.assert_allclose(np.asarray(bf_p), np.asarray(bf_s),
                               rtol=1e-5, atol=1e-5)
    for name in ("boxes", "scores", "distribution", "features", "obj_mask",
                 "pred_labels"):
        np.testing.assert_allclose(
            np.asarray(getattr(e_p, name)), np.asarray(getattr(e_s, name)),
            rtol=1e-5, atol=1e-5, err_msg=name,
        )


def _sgdet_entry(seed, cap):
    from vidsgg.data import build_gt_entry, synthetic_video_annotation
    from vidsgg.data.synthetic import synthetic_base_fmaps
    from vidsgg.detector import featurize_gt_entry

    ann = synthetic_video_annotation(num_frames=4, objs_per_frame=2, seed=seed)
    entry = build_gt_entry(ann, cap)
    fmaps = jnp.array(synthetic_base_fmaps(cap.max_frames, hw=(12, 20), seed=seed))
    w = jax.random.normal(jax.random.PRNGKey(7), (1024, 2048)) * 0.02
    entry = jax.jit(
        lambda e, f: featurize_gt_entry(e, f, lambda p: p.mean(axis=(1, 2)) @ w)
    )(entry, fmaps)
    rng = np.random.RandomState(seed)
    dist = rng.rand(cap.max_objs, 36).astype(np.float32)
    dist = dist / dist.sum(1, keepdims=True)
    dist *= np.asarray(entry.obj_mask)[:, None]
    det_labels = rng.randint(1, 37, cap.max_objs)
    det_labels = (det_labels * np.asarray(entry.obj_mask)).astype(np.int32)
    return entry.replace(
        distribution=jnp.asarray(dist), pred_labels=jnp.asarray(det_labels)
    ), fmaps


def test_paired_eval_on_mesh_matches_single():
    from vidsgg.models import Tempura, TempuraConfig
    from vidsgg.train import create_train_state, make_optimizer
    from vidsgg.train.eval_pipeline import EvalPipeline
    from vidsgg.train.pair_eval import PairedSgdetEval

    cap = EntryCapacity(max_frames=8, max_objs=24, max_pairs=16)
    mesh = make_mesh(2)
    vids = [_sgdet_entry(s, cap) for s in (3, 5)]
    cfg = TempuraConfig.for_mode("sgdet", rel_head="gmm", enc_layers=1,
                                 dec_layers=1)
    state = create_train_state(
        Tempura(cfg), cfg, vids[0][0], jax.random.PRNGKey(0),
        make_optimizer(steps_per_epoch=1),
    )
    pipeline = EvalPipeline("sgdet", cap)
    paired = PairedSgdetEval(pipeline, group=2, mesh=mesh)
    state_r = jax.device_put(state, replicate_sharding(mesh))

    got = []
    for i, (e, f) in enumerate(vids):
        got.extend(paired.add(state_r, e, f, gt_entry=e, payload=i))
    assert len(got) == 2

    keys = ("pred_labels", "boxes", "im_idx", "pair_idx", "pred_scores",
            "attention_distribution", "spatial_distribution",
            "contacting_distribution")
    for pred, i in got:
        ref = pipeline(state, vids[i][0], vids[i][1], gt_entry=vids[i][0])
        for k in keys:
            np.testing.assert_allclose(
                np.asarray(pred[k]), np.asarray(ref[k]),
                rtol=1e-4, atol=2e-4, err_msg=f"video {i}: {k}",
            )


def test_setup_serve_mesh_clamps_and_rounds():
    from vidsgg.cli.data_source import setup_serve_mesh

    # disabled cases
    assert setup_serve_mesh(1, 3) == (None, 3)
    assert setup_serve_mesh(4, 3, max_videos=10) == (None, 3)
    # group rounds up to a multiple of the mesh size
    mesh, group = setup_serve_mesh(2, 3)
    assert mesh.size == 2 and group == 4
    mesh, group = setup_serve_mesh(4, 1)
    assert mesh.size == 4 and group == 4
    # more devices requested than exist (8 virtual CPU devices): clamps
    mesh, group = setup_serve_mesh(16, 1)
    assert mesh.size == 8 and group == 8
