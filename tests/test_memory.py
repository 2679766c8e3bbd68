"""Device-resident memory bank accumulation (replaces the reference's
.npy-file epoch-end recompute; semantics per Memory.py/Uncertainty.py)."""

import jax.numpy as jnp
import numpy as np

from vidsgg import constants as C
from vidsgg.data import EntryCapacity, build_gt_entry, synthetic_video_annotation
from vidsgg.debias import MemoryAccumulator, accumulate_memory, finalize_memory, uncertainty_stats

CAP = EntryCapacity(max_frames=8, max_objs=24, max_pairs=16)


def _entry_and_out(seed=0):
    ann = synthetic_video_annotation(num_frames=4, objs_per_frame=2, seed=seed)
    entry = build_gt_entry(ann, CAP)
    rng = np.random.RandomState(seed)
    p = CAP.max_pairs
    out = {
        "rel_features": jnp.asarray(rng.randn(p, 1936).astype(np.float32)),
        "object_features": jnp.asarray(rng.randn(CAP.max_objs, 1024).astype(np.float32)),
        "attention_al_uc": jnp.asarray(rng.rand(p, 3).astype(np.float32)),
        "attention_ep_uc": jnp.asarray(rng.rand(p, 3).astype(np.float32)),
        "spatial_al_uc": jnp.asarray(rng.rand(p, 6).astype(np.float32)),
        "spatial_ep_uc": jnp.asarray(rng.rand(p, 6).astype(np.float32)),
        "contacting_al_uc": jnp.asarray(rng.rand(p, 17).astype(np.float32)),
        "contacting_ep_uc": jnp.asarray(rng.rand(p, 17).astype(np.float32)),
        "obj_al_uc": jnp.asarray(rng.rand(CAP.max_objs, C.NUM_OBJ_CLASSES).astype(np.float32)),
        "obj_ep_uc": jnp.asarray(rng.rand(CAP.max_objs, C.NUM_OBJ_CLASSES).astype(np.float32)),
    }
    return ann, entry, out


def test_simple_weighting_is_classwise_mean():
    _, entry, out = _entry_and_out()
    acc = MemoryAccumulator.zeros()
    acc = accumulate_memory(acc, entry, out, "simple", "simple", obj_mem=True)
    rel_mem, obj_mem = finalize_memory(acc)
    assert rel_mem.shape == (26, 1936)

    # manual check for one attention class
    p = int(entry.pair_mask.sum())
    att = np.asarray(entry.attention_gt)[:p]
    feats = np.asarray(out["rel_features"])[:p]
    for cls in np.unique(att):
        sel = att == cls
        want = feats[sel].mean(0)
        np.testing.assert_allclose(np.asarray(rel_mem[cls]), want, rtol=2e-5, atol=1e-5)

    # object bank: classwise mean over non-background valid boxes
    n = int(entry.obj_mask.sum())
    labels = np.asarray(entry.labels)[:n]
    ofeats = np.asarray(out["object_features"])[:n]
    for cls in np.unique(labels[labels != 0]):
        want = ofeats[labels == cls].mean(0)
        np.testing.assert_allclose(np.asarray(obj_mem[cls - 1]), want, rtol=2e-5, atol=1e-5)


def test_uncertainty_weighting_is_exp_weighted_mean():
    _, entry, out = _entry_and_out(1)
    acc = MemoryAccumulator.zeros()
    acc = accumulate_memory(acc, entry, out, "both", "simple")
    rel_mem, _ = finalize_memory(acc, "both", "simple")

    p = int(entry.pair_mask.sum())
    att = np.asarray(entry.attention_gt)[:p]
    feats = np.asarray(out["rel_features"])[:p]
    al = np.asarray(out["attention_al_uc"])[:p]
    ep = np.asarray(out["attention_ep_uc"])[:p]
    cls = int(att[0])
    sel = att == cls
    w = np.exp((al + ep)[sel, cls])
    # reference 'both' normalizer for relations: 2 * sum(exp(al)) + 1e-12
    # (stats2's list-concat quirk, Uncertainty.py:65 — see debias/memory.py)
    den = 2.0 * np.exp(al[sel, cls]).sum() + 1e-12
    want = (w[:, None] * feats[sel]).sum(0) / den
    np.testing.assert_allclose(np.asarray(rel_mem[cls]), want, rtol=2e-5, atol=1e-5)


def test_accumulation_over_videos_and_empty_classes_zero():
    acc = MemoryAccumulator.zeros()
    for s in range(3):
        _, entry, out = _entry_and_out(s)
        acc = accumulate_memory(acc, entry, out, "simple", "simple")
    rel_mem, obj_mem = finalize_memory(acc)
    counts = np.asarray(acc.rel_w)
    # classes never seen must stay exactly zero
    assert np.allclose(np.asarray(rel_mem)[counts == 0], 0.0)
    assert np.isfinite(np.asarray(rel_mem)).all()

    stats = uncertainty_stats(acc)
    assert stats["rel_count"].shape == (26,)
