"""TEAT-GT sgcls: the 3-stage eval pipeline routes through its OSPU classify
stage and its union-free relation stage."""

import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.data import EntryCapacity, build_gt_entry, synthetic_video_annotation
from vidsgg.data.synthetic import synthetic_base_fmaps
from vidsgg.detector import featurize_gt_entry
from vidsgg.eval import SceneGraphEvaluator
from vidsgg.models.graph_build import ClipCaps
from vidsgg.models.teatgt import TeatGT, TeatGTConfig
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.eval_pipeline import EvalPipeline

CAP = EntryCapacity(max_frames=8, max_objs=24, max_pairs=16)
CLIPS = ClipCaps(clip_size=5, n_clips=2, tokens_per_clip=24, edges_per_clip=64,
                 tokens_per_frame=6)


class _MemCfg:
    tracking = True
    num_classes = 37


def test_teatgt_sgcls_eval_pipeline():
    ann = synthetic_video_annotation(num_frames=4, objs_per_frame=2, seed=11)
    entry = build_gt_entry(ann, CAP)
    fmaps = jnp.array(synthetic_base_fmaps(CAP.max_frames, hw=(12, 20), seed=11))
    w = jax.random.normal(jax.random.PRNGKey(7), (1024, 2048)) * 0.02
    entry = jax.jit(
        lambda e, f: featurize_gt_entry(e, f, lambda p: p.mean(axis=(1, 2)) @ w)
    )(entry, fmaps)
    rng = np.random.RandomState(0)
    dist = rng.rand(CAP.max_objs, 36).astype(np.float32)
    dist = dist / dist.sum(1, keepdims=True) * np.asarray(entry.obj_mask)[:, None]
    entry = entry.replace(
        distribution=jnp.asarray(dist),
        video_size=jnp.array([480.0, 270.0]),
    )

    cfg = TeatGTConfig.for_mode(
        "sgcls", encoder_layers=2, encoder_attention_heads=4, caps=CLIPS
    )
    assert cfg.tracking and cfg.encoder_layers == 2  # explicit overrides kept
    model = TeatGT(cfg)
    state = create_train_state(
        model, _MemCfg(), entry, jax.random.PRNGKey(0),
        make_optimizer(steps_per_epoch=1),
    )

    pipe = EvalPipeline("sgcls", CAP, needs_union=False)
    pred = pipe(state, entry, fmaps, gt_entry=entry)
    assert pred["attention_distribution"].shape[1] == 3
    assert (pred["pred_labels"] >= 1).all()
    ev = SceneGraphEvaluator("sgcls", constraint="with")
    ev.evaluate_scene_graph(ann, pred)
    assert 0.0 <= ev.recall_at(20) <= 1.0


def test_teatgt_sgdet_eval_pipeline():
    """TEAT-GT sgdet (the KCC demo path): detector-style entry -> fused or
    host sgdet postprocess -> union-free relation stage."""
    ann = synthetic_video_annotation(num_frames=4, objs_per_frame=2, seed=13)
    entry = build_gt_entry(ann, CAP)
    fmaps = jnp.array(synthetic_base_fmaps(CAP.max_frames, hw=(12, 20), seed=13))
    w = jax.random.normal(jax.random.PRNGKey(7), (1024, 2048)) * 0.02
    entry = jax.jit(
        lambda e, f: featurize_gt_entry(e, f, lambda p: p.mean(axis=(1, 2)) @ w)
    )(entry, fmaps)
    rng = np.random.RandomState(1)
    n = int(np.asarray(entry.obj_mask).sum())
    dist = rng.rand(CAP.max_objs, 36).astype(np.float32)
    dist = dist / dist.sum(1, keepdims=True) * np.asarray(entry.obj_mask)[:, None]
    det_labels = (rng.randint(1, 37, CAP.max_objs) *
                  np.asarray(entry.obj_mask)).astype(np.int32)
    entry = entry.replace(
        distribution=jnp.asarray(dist),
        pred_labels=jnp.asarray(det_labels),
        scores=jnp.asarray(dist.max(1)),
        video_size=jnp.array([480.0, 270.0]),
    )

    cfg = TeatGTConfig.for_mode(
        "sgdet", encoder_layers=2, encoder_attention_heads=4, caps=CLIPS
    )
    model = TeatGT(cfg)
    state = create_train_state(
        model, _MemCfg(), entry, jax.random.PRNGKey(0),
        make_optimizer(steps_per_epoch=1),
    )

    pipe = EvalPipeline("sgdet", CAP, needs_union=False)
    pred = pipe(state, entry, fmaps, gt_entry=entry)
    assert pred["attention_distribution"].shape[1] == 3
    assert (pred["pred_labels"] >= 1).all()
    ev = SceneGraphEvaluator("sgdet", constraint="with")
    ev.evaluate_scene_graph(ann, pred)
    assert 0.0 <= ev.recall_at(20) <= 1.0
