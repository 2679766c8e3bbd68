"""Checkpoint round-trip incl. memory banks (the reference's test scripts
forget to restore banks — here it must round-trip completely)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.data import EntryCapacity, build_gt_entry, synthetic_video_annotation
from vidsgg.models import Tempura, TempuraConfig
from vidsgg.train import create_train_state, make_optimizer
from vidsgg.train.checkpoint import restore_checkpoint, save_checkpoint

CAP = EntryCapacity(max_frames=4, max_objs=12, max_pairs=8)


def test_checkpoint_roundtrip(tmp_path):
    cfg = TempuraConfig.for_mode("predcls", rel_head="linear")
    model = Tempura(cfg)
    ann = synthetic_video_annotation(num_frames=3, objs_per_frame=1, seed=0)
    entry = build_gt_entry(ann, CAP)
    entry = entry.replace(
        features=jnp.ones_like(entry.features),
        union_feat=jnp.ones_like(entry.union_feat),
    )
    tx = make_optimizer(steps_per_epoch=10)
    state = create_train_state(model, cfg, entry, jax.random.PRNGKey(0), tx)

    # mutate: fill memory + bump step
    state = state.with_memory(
        jnp.full_like(state.rel_memory, 0.25), jnp.full_like(state.obj_memory, 0.5)
    ).replace(step=jnp.asarray(7, jnp.int32))

    path = os.path.join(tmp_path, "ckpt")
    save_checkpoint(path, state, "best_recall")

    fresh = create_train_state(model, cfg, entry, jax.random.PRNGKey(1), tx)
    # some leaves (e.g. GloVe-init embedding tables) are rng-independent,
    # but at least one randomly-initialized kernel must differ
    diffs = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(fresh.params), jax.tree.leaves(state.params))
    ]
    assert any(diffs)
    restored = restore_checkpoint(path, fresh, "best_recall")
    assert int(restored.step) == 7
    assert bool(restored.mem_active)
    assert np.allclose(np.asarray(restored.rel_memory), 0.25)
    assert np.allclose(np.asarray(restored.obj_memory), 0.5)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        assert np.allclose(np.asarray(a), np.asarray(b))
