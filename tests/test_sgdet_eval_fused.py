"""The one-jit-region sgdet eval path (device clean_class + NMS + relabel +
pair rebuild) produces the same evaluator-ready predictions as the host
3-stage path."""

import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.data import EntryCapacity, build_gt_entry, synthetic_video_annotation
from vidsgg.data.synthetic import synthetic_base_fmaps
from vidsgg.detector import featurize_gt_entry
from vidsgg.eval import SceneGraphEvaluator
from vidsgg.models import Tempura, TempuraConfig
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.eval_pipeline import EvalPipeline

CAP = EntryCapacity(max_frames=8, max_objs=24, max_pairs=16)


def _sgdet_entry(seed):
    ann = synthetic_video_annotation(num_frames=4, objs_per_frame=2, seed=seed)
    entry = build_gt_entry(ann, CAP)
    fmaps = jnp.array(synthetic_base_fmaps(CAP.max_frames, hw=(12, 20), seed=seed))
    w = jax.random.normal(jax.random.PRNGKey(7), (1024, 2048)) * 0.02
    entry = jax.jit(
        lambda e, f: featurize_gt_entry(e, f, lambda p: p.mean(axis=(1, 2)) @ w)
    )(entry, fmaps)
    rng = np.random.RandomState(seed)
    n = int(np.asarray(entry.obj_mask).sum())
    dist = rng.rand(CAP.max_objs, 36).astype(np.float32)
    dist = dist / dist.sum(1, keepdims=True)
    dist *= np.asarray(entry.obj_mask)[:, None]
    det_labels = rng.randint(1, 37, CAP.max_objs)
    det_labels[1] = 5  # trigger clean_class
    det_labels[min(2, n - 1)] = 17
    det_labels = (det_labels * np.asarray(entry.obj_mask)).astype(np.int32)
    entry = entry.replace(
        distribution=jnp.asarray(dist), pred_labels=jnp.asarray(det_labels)
    )
    return ann, entry, fmaps


def test_fused_sgdet_eval_matches_host():
    ann, entry, fmaps = _sgdet_entry(3)
    cfg = TempuraConfig.for_mode("sgdet", rel_head="gmm", enc_layers=1, dec_layers=1)
    model = Tempura(cfg)
    state = create_train_state(
        model, cfg, entry, jax.random.PRNGKey(0), make_optimizer(steps_per_epoch=1)
    )

    pred_host = EvalPipeline("sgdet", CAP, device_postprocess=False)(
        state, entry, fmaps, gt_entry=entry
    )
    pred_dev = EvalPipeline("sgdet", CAP, device_postprocess=True)(
        state, entry, fmaps, gt_entry=entry
    )

    np.testing.assert_array_equal(pred_dev["pred_labels"], pred_host["pred_labels"])
    np.testing.assert_allclose(pred_dev["boxes"], pred_host["boxes"], atol=1e-5)
    np.testing.assert_array_equal(pred_dev["im_idx"], pred_host["im_idx"])
    np.testing.assert_array_equal(pred_dev["pair_idx"], pred_host["pair_idx"])
    np.testing.assert_allclose(
        pred_dev["pred_scores"], pred_host["pred_scores"], atol=1e-5
    )
    for k in ("attention_distribution", "spatial_distribution",
              "contacting_distribution"):
        np.testing.assert_allclose(
            pred_dev[k], pred_host[k], atol=2e-4, err_msg=k
        )

    # and both feed the evaluator identically
    ev_h = SceneGraphEvaluator("sgdet", constraint="with")
    ev_d = SceneGraphEvaluator("sgdet", constraint="with")
    ev_h.evaluate_scene_graph(ann, pred_host)
    ev_d.evaluate_scene_graph(ann, pred_dev)
    for k in ev_h.KS:
        assert ev_h.recall_at(k) == ev_d.recall_at(k)


def test_serving_precision_bf16_close_to_f32():
    """EvalPipeline(compute_dtype=bf16) runs the whole fused sgdet stage in
    bf16 and stays within bf16 rounding of the f32 predictions."""
    ann, entry, fmaps = _sgdet_entry(5)
    cfg = TempuraConfig.for_mode("sgdet", rel_head="gmm", enc_layers=1, dec_layers=1)
    model = Tempura(cfg)
    state = create_train_state(
        model, cfg, entry, jax.random.PRNGKey(0), make_optimizer(steps_per_epoch=1)
    )
    p32 = EvalPipeline("sgdet", CAP)(state, entry, fmaps, gt_entry=entry)
    p16 = EvalPipeline("sgdet", CAP, compute_dtype=jnp.bfloat16)(
        state, entry, fmaps, gt_entry=entry
    )
    assert p16["pred_labels"].shape == p32["pred_labels"].shape
    # object decisions should overwhelmingly agree; distributions within
    # bf16 tolerance
    agree = (np.asarray(p16["pred_labels"]) == np.asarray(p32["pred_labels"])).mean()
    assert agree > 0.9
    np.testing.assert_allclose(
        np.asarray(p16["attention_distribution"], np.float32),
        np.asarray(p32["attention_distribution"], np.float32),
        atol=0.08,
    )


def test_grouped_union_features_match_general():
    """Per-frame grouped union pooling == the general flat path, and the
    overflow flag fires exactly when a frame exceeds the bound."""
    from vidsgg.detector.featurize import (
        pair_union_features, pair_union_features_grouped,
    )

    ann, entry, fmaps = _sgdet_entry(7)
    want_u, want_b, want_m = pair_union_features(entry, fmaps)
    got_u, got_b, got_m, ovf = pair_union_features_grouped(entry, fmaps, 16)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b))
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m))

    p_valid = int(np.asarray(entry.pair_mask).sum())
    max_per_frame = max(
        np.bincount(np.asarray(entry.im_idx)[:p_valid]).max(), 1
    )
    if max_per_frame > 1:
        _, _, _, ovf2 = pair_union_features_grouped(
            entry, fmaps, int(max_per_frame) - 1
        )
        assert bool(ovf2)


def test_fused_sgdet_eval_grouped_union_matches():
    """The fused stage with union_pairs_per_frame set produces the same
    predictions as the general union path."""
    ann, entry, fmaps = _sgdet_entry(3)
    cfg = TempuraConfig.for_mode("sgdet", rel_head="gmm", enc_layers=1, dec_layers=1)
    model = Tempura(cfg)
    state = create_train_state(
        model, cfg, entry, jax.random.PRNGKey(0), make_optimizer(steps_per_epoch=1)
    )
    base = EvalPipeline("sgdet", CAP)(state, entry, fmaps, gt_entry=entry)
    grp = EvalPipeline("sgdet", CAP, union_pairs_per_frame=16)(
        state, entry, fmaps, gt_entry=entry
    )
    for k in ("pred_labels", "pair_idx"):
        np.testing.assert_array_equal(np.asarray(base[k]), np.asarray(grp[k]))
    np.testing.assert_allclose(
        np.asarray(grp["contacting_distribution"]),
        np.asarray(base["contacting_distribution"]),
        rtol=1e-4, atol=1e-5,
    )
