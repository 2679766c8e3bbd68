"""sgcls end-to-end: OSPU with tracking trains, and the 3-stage eval
pipeline (classify -> host postprocess -> relation forward) produces
evaluator-ready predictions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsgg.data import EntryCapacity, build_gt_entry, synthetic_video_annotation
from vidsgg.data.synthetic import synthetic_base_fmaps
from vidsgg.detector import featurize_gt_entry
from vidsgg.eval import SceneGraphEvaluator
from vidsgg.models import Tempura, TempuraConfig
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.eval_pipeline import EvalPipeline
from vidsgg.train.steps import LossFlags, make_train_step

CAP = EntryCapacity(max_frames=8, max_objs=24, max_pairs=16)


@pytest.fixture(scope="module")
def sgcls_setup():
    ann = synthetic_video_annotation(num_frames=4, objs_per_frame=2, seed=3)
    entry = build_gt_entry(ann, CAP)
    fmaps = jnp.array(synthetic_base_fmaps(CAP.max_frames, hw=(12, 20), seed=3))
    w = jax.random.normal(jax.random.PRNGKey(7), (1024, 2048)) * 0.02
    head = lambda pooled: pooled.mean(axis=(1, 2)) @ w
    entry = jax.jit(lambda e, f: featurize_gt_entry(e, f, head))(entry, fmaps)

    # synthesize detector class scores: mostly-correct softmax over 36
    n = CAP.max_objs
    rng = np.random.RandomState(0)
    logits = rng.randn(n, 36).astype(np.float32)
    lbl = np.asarray(entry.labels)
    logits[np.arange(n), np.clip(lbl - 1, 0, 35)] += 4.0
    dist = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    dist = dist * np.asarray(entry.obj_mask)[:, None]
    entry = entry.replace(distribution=jnp.asarray(dist))

    cfg = TempuraConfig.for_mode("sgcls", obj_head="gmm", rel_head="gmm")
    assert cfg.tracking and cfg.k == 4  # reference mode-derived overrides
    model = Tempura(cfg)
    tx = make_optimizer(base_lr=1e-4, steps_per_epoch=1000)
    state = create_train_state(model, cfg, entry, jax.random.PRNGKey(0), tx)
    return ann, entry, fmaps, cfg, state


def test_sgcls_train_step(sgcls_setup):
    _, entry, _, _, state = sgcls_setup
    flags = LossFlags(mode="sgcls", obj_con_loss="euc_con", eos_coef=1.0)
    step = make_train_step(flags)
    state = jax.tree.map(jnp.copy, state)
    rng = jax.random.PRNGKey(2)
    losses = []
    for _ in range(8):
        rng, sub = jax.random.split(rng)
        state, m = step(state, entry, sub)
        losses.append(float(m["total_loss"]))
    assert all(np.isfinite(losses))
    assert "object_loss" in m and "object_contrastive_loss" in m
    assert losses[-1] < losses[0]


def test_sgcls_eval_pipeline(sgcls_setup):
    ann, entry, fmaps, _, state = sgcls_setup
    pipe = EvalPipeline("sgcls", CAP)
    pred = pipe(state, entry, fmaps, gt_entry=entry)
    n = len(pred["pred_labels"])
    assert n == int(np.asarray(entry.obj_mask).sum())
    assert pred["attention_distribution"].shape[1] == 3
    assert (pred["pred_labels"] >= 1).all()
    # one human per frame among rebuilt pairs
    for f in np.unique(pred["im_idx"]):
        subs = pred["pair_idx"][pred["im_idx"] == f][:, 0]
        assert len(np.unique(subs)) == 1

    ev = SceneGraphEvaluator("sgcls", constraint="with")
    ev.evaluate_scene_graph(ann, pred)
    assert 0.0 <= ev.recall_at(20) <= 1.0


def test_sgcls_eval_outputs_are_wellformed(sgcls_setup):
    ann, entry, fmaps, _, state = sgcls_setup
    pipe = EvalPipeline("sgcls", CAP)
    pred = pipe(state, entry, fmaps, gt_entry=entry)
    # OSPU's own (untrained) decoder produces the labels, so only structure
    # is asserted: valid label range, scores in [0,1], GT lists preserved in
    # original pair order for the temporal metric
    assert (pred["pred_labels"] >= 1).all() and (pred["pred_labels"] <= 36).all()
    assert (pred["pred_scores"] >= 0).all() and (pred["pred_scores"] <= 1).all()
    assert len(pred["spatial_gt"]) == int(np.asarray(entry.pair_mask).sum())


def test_fused_device_pipeline_matches_host(sgcls_setup):
    ann, entry, fmaps, _, state = sgcls_setup
    host = EvalPipeline("sgcls", CAP, device_postprocess=False)
    dev = EvalPipeline("sgcls", CAP, device_postprocess=True)
    ph = host(state, entry, fmaps, gt_entry=entry)
    pd = dev(state, entry, fmaps, gt_entry=entry)
    n = len(ph["pred_labels"])
    np.testing.assert_array_equal(pd["pred_labels"][:n], ph["pred_labels"])
    np.testing.assert_array_equal(pd["pair_idx"], ph["pair_idx"])
    np.testing.assert_allclose(
        pd["attention_distribution"], ph["attention_distribution"], atol=2e-4
    )
    np.testing.assert_allclose(
        pd["contacting_distribution"], ph["contacting_distribution"], atol=2e-4
    )
