"""Paired sgdet serving (vmapped fused stage) == the single-video path."""

import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.data import EntryCapacity, build_gt_entry, synthetic_video_annotation
from vidsgg.data.synthetic import synthetic_base_fmaps
from vidsgg.detector import featurize_gt_entry
from vidsgg.models import Tempura, TempuraConfig
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.eval_pipeline import EvalPipeline
from vidsgg.train.pair_eval import PairedSgdetEval

CAP = EntryCapacity(max_frames=8, max_objs=24, max_pairs=16)

PRED_KEYS = (
    "pred_labels", "boxes", "im_idx", "pair_idx", "pred_scores",
    "attention_distribution", "spatial_distribution",
    "contacting_distribution",
)


def _sgdet_entry(seed):
    ann = synthetic_video_annotation(num_frames=4, objs_per_frame=2, seed=seed)
    entry = build_gt_entry(ann, CAP)
    fmaps = jnp.array(synthetic_base_fmaps(CAP.max_frames, hw=(12, 20), seed=seed))
    w = jax.random.normal(jax.random.PRNGKey(7), (1024, 2048)) * 0.02
    entry = jax.jit(
        lambda e, f: featurize_gt_entry(e, f, lambda p: p.mean(axis=(1, 2)) @ w)
    )(entry, fmaps)
    rng = np.random.RandomState(seed)
    dist = rng.rand(CAP.max_objs, 36).astype(np.float32)
    dist = dist / dist.sum(1, keepdims=True)
    dist *= np.asarray(entry.obj_mask)[:, None]
    det_labels = rng.randint(1, 37, CAP.max_objs)
    det_labels = (det_labels * np.asarray(entry.obj_mask)).astype(np.int32)
    entry = entry.replace(
        distribution=jnp.asarray(dist), pred_labels=jnp.asarray(det_labels)
    )
    return ann, entry, fmaps


def _state(entry):
    cfg = TempuraConfig.for_mode("sgdet", rel_head="gmm", enc_layers=1,
                                 dec_layers=1)
    model = Tempura(cfg)
    return create_train_state(
        model, cfg, entry, jax.random.PRNGKey(0),
        make_optimizer(steps_per_epoch=1),
    )


def test_paired_matches_single():
    vids = [_sgdet_entry(s) for s in (3, 5, 9)]
    state = _state(vids[0][1])
    pipeline = EvalPipeline("sgdet", CAP)
    paired = PairedSgdetEval(pipeline, group=2)

    singles = [
        pipeline(state, e, f, gt_entry=e) for _, e, f in vids
    ]

    got = []
    for i, (_, e, f) in enumerate(vids):
        got.extend(paired.add(state, e, f, gt_entry=e, payload=i))
    assert len(got) == 2  # first group of two flushed, one pending
    got.extend(paired.flush(state))
    assert len(got) == 3 and paired.flush(state) == []

    for pred, i in got:
        ref = singles[i]
        for k in PRED_KEYS:
            np.testing.assert_allclose(
                np.asarray(pred[k]), np.asarray(ref[k]),
                rtol=1e-4, atol=2e-4, err_msg=f"video {i}: {k}",
            )
        # GT predicate lists attach identically
        assert pred["attention_gt"] == ref["attention_gt"]
        assert pred["spatial_gt"] == ref["spatial_gt"]
        assert pred["contacting_gt"] == ref["contacting_gt"]


def test_paired_groups_by_shape():
    """Different fmap canvases never stack into one group."""
    ann, e1, f1 = _sgdet_entry(3)
    _, e2, f2 = _sgdet_entry(5)
    f2 = jnp.array(
        synthetic_base_fmaps(CAP.max_frames, hw=(10, 16), seed=5)
    )
    state = _state(e1)
    pipeline = EvalPipeline("sgdet", CAP)
    paired = PairedSgdetEval(pipeline, group=2)
    assert paired.add(state, e1, f1, gt_entry=e1, payload="a") == []
    assert paired.add(state, e2, f2, gt_entry=e2, payload="b") == []
    out = paired.flush(state)
    assert sorted(p for _, p in out) == ["a", "b"]


def test_pending_bound_drains_stragglers():
    """Straggler videos across many shape signatures must not pin their
    base-feature maps in device memory until the end-of-run flush: past
    ``max_pending`` buffered videos, the oldest other signature drains
    through the single-video pipeline (bit-identical to flush)."""
    state = None
    pipeline = EvalPipeline("sgdet", CAP)
    paired = PairedSgdetEval(pipeline, group=2, max_pending=3)

    outs = []
    hws = [(12, 20), (10, 16), (8, 12), (14, 24), (6, 8)]
    for i, hw in enumerate(hws):
        _, e, _ = _sgdet_entry(3)
        if state is None:
            state = _state(e)
        f = jnp.array(synthetic_base_fmaps(CAP.max_frames, hw=hw, seed=i))
        outs.extend(paired.add(state, e, f, gt_entry=e, payload=i))
        assert sum(len(b) for b in paired._pending.values()) <= 3
    # adds 4 and 5 pushed the buffer past the bound -> oldest two drained
    assert [p for _, p in outs] == [0, 1]
    outs.extend(paired.flush(state))
    assert sorted(p for _, p in outs) == [0, 1, 2, 3, 4]


def test_requires_sgdet_device_postprocess():
    import pytest

    with pytest.raises(ValueError):
        PairedSgdetEval(EvalPipeline("sgcls", CAP))
    with pytest.raises(ValueError):
        PairedSgdetEval(EvalPipeline("sgdet", CAP, device_postprocess=False))


def test_run_batched_matches_single():
    """The zero-restack group path (run_batched on a pre-batched entry)
    equals the single-video pipeline, GT attachment included."""
    from vidsgg.train.pair_eval import _stack_trees

    vids = [_sgdet_entry(s) for s in (3, 5)]
    state = _state(vids[0][1])
    pipeline = EvalPipeline("sgdet", CAP)
    paired = PairedSgdetEval(pipeline, group=2)

    entry_b = _stack_trees(tuple(e for _, e, _ in vids))
    fm_b = jnp.stack([f for _, _, f in vids])
    got = paired.run_batched(state, entry_b, fm_b, payloads=[0, 1])
    assert [p for _, p in got] == [0, 1]

    for (pred, i), (_, e, f) in zip(got, vids):
        ref = pipeline(state, e, f, gt_entry=e)
        for k in PRED_KEYS:
            np.testing.assert_allclose(
                np.asarray(pred[k]), np.asarray(ref[k]),
                rtol=1e-4, atol=2e-4, err_msg=f"video {i}: {k}",
            )
        assert pred["attention_gt"] == ref["attention_gt"]
        assert pred["spatial_gt"] == ref["spatial_gt"]
        assert pred["contacting_gt"] == ref["contacting_gt"]
