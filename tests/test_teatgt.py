"""TEAT-GT end-to-end on synthetic data: graph construction, TokenGT
forward, temporal-consistency regularizer, training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsgg.data import EntryCapacity, build_gt_entry, synthetic_video_annotation
from vidsgg.data.synthetic import synthetic_base_fmaps
from vidsgg.detector import featurize_gt_entry
from vidsgg.models.graph_build import ClipCaps, build_token_layout
from vidsgg.models.teatgt import TeatGT, TeatGTConfig
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.steps import LossFlags, make_train_step

CAP = EntryCapacity(max_frames=8, max_objs=24, max_pairs=16)
CLIPS = ClipCaps(clip_size=5, n_clips=2, tokens_per_clip=16, edges_per_clip=64,
                 tokens_per_frame=4)


def _entry(seed=0, num_frames=6, objs=2):
    ann = synthetic_video_annotation(num_frames=num_frames, objs_per_frame=objs, seed=seed)
    entry = build_gt_entry(ann, CAP)
    fmaps = jnp.array(synthetic_base_fmaps(CAP.max_frames, hw=(12, 20), seed=seed))
    w = jax.random.normal(jax.random.PRNGKey(7), (1024, 2048)) * 0.02
    entry = jax.jit(
        lambda e, f: featurize_gt_entry(e, f, lambda p: p.mean(axis=(1, 2)) @ w)
    )(entry, fmaps)
    return ann, entry.replace(video_size=jnp.array([480.0, 270.0]))


def test_token_layout_routing():
    _, entry = _entry()
    layout = build_token_layout(entry, CLIPS)
    nf = int(entry.num_frames)
    npairs = int(entry.pair_mask.sum())
    # one person token per frame + one object token per pair
    assert int(layout.token_valid.sum()) == nf + npairs
    # every valid token routed to exactly one clip slot
    assert int(layout.clip_mask.sum()) == nf + npairs
    # frame-major order inside clips; person first per frame
    ct, cm = np.asarray(layout.clip_tokens), np.asarray(layout.clip_mask)
    frames = np.asarray(layout.token_frame)
    is_person = np.asarray(layout.token_is_person)
    for c in range(CLIPS.n_clips):
        toks = ct[c][cm[c]]
        f = frames[toks]
        assert (np.diff(f) >= 0).all()
        for fr in np.unique(f):
            grp = toks[f == fr]
            assert is_person[grp[0]]  # person leads its frame
            assert not is_person[grp[1:]].any()


@pytest.fixture(scope="module")
def teatgt_setup():
    cfg = TeatGTConfig.for_mode(
        "predcls", encoder_layers=2, encoder_attention_heads=4, caps=CLIPS,
        use_cons_str_loss=True, use_cons_sem_loss=True,
    )
    model = TeatGT(cfg)
    ann, entry = _entry()
    tx = make_optimizer(base_lr=3e-4, steps_per_epoch=1000)
    state = create_train_state(model, _DummyCfg(), entry, jax.random.PRNGKey(0), tx)
    return cfg, model, ann, entry, state


class _DummyCfg:
    # create_train_state only reads tracking/num_classes for memory dims
    tracking = False
    num_classes = 37


def test_forward_shapes_and_ranges(teatgt_setup):
    _, _, _, entry, state = teatgt_setup
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        entry, phase="test",
    )
    p = entry.pair_mask.shape[0]
    assert out["attention_distribution"].shape == (p, 3)
    a = np.asarray(out["attention_distribution"])
    valid = np.asarray(entry.pair_mask)
    assert np.allclose(a[valid].sum(1), 1.0, atol=1e-5)
    assert np.allclose(a[~valid], 0.0)
    assert out["clip_hidden_state"].shape == (CLIPS.n_clips, 768)


def test_consistency_losses_finite_and_nonnegative(teatgt_setup):
    _, _, _, entry, state = teatgt_setup
    out, _ = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        entry, phase="train",
        rngs={"dropout": jax.random.PRNGKey(0), "gmm": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    s = float(out["structure_temp_loss"])
    m = float(out["semantic_temp_loss"])
    assert np.isfinite(s) and np.isfinite(m)
    assert s >= 0 and m >= 0


def test_teatgt_training_reduces_loss(teatgt_setup):
    _, _, _, entry, state = teatgt_setup
    flags = LossFlags(
        mode="predcls", use_cons_str_loss=True, use_cons_sem_loss=True,
        cons_weight=2500.0,
    )
    step = make_train_step(flags)
    state = jax.tree.map(jnp.copy, state)
    rng = jax.random.PRNGKey(3)
    losses = []
    for _ in range(10):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, entry, sub)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(losses))
    assert "structure_temp_loss" in metrics
    assert losses[-1] < losses[0]


def test_consistency_losses_skipped_when_flags_off():
    """With both cons-loss flags off (the default TEMPURA-style config), the
    regularizer's GraphTransformers and second eigendecomposition are not
    built or run at all — no wasted train-time FLOPs."""
    _, entry = _entry(seed=5)
    cfg = TeatGTConfig.for_mode(
        "predcls", encoder_layers=2, encoder_attention_heads=4, caps=CLIPS
    )
    model = TeatGT(cfg)
    state = create_train_state(
        model, _DummyCfg(), entry, jax.random.PRNGKey(0),
        make_optimizer(steps_per_epoch=1),
    )
    out, _ = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        entry, phase="train",
        rngs={"dropout": jax.random.PRNGKey(0), "gmm": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert "structure_temp_loss" not in out
    assert "semantic_temp_loss" not in out
    # the regularizer modules left no parameters behind
    assert "gat" not in state.params and "gat_semantic" not in state.params
