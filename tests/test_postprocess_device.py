"""Device sgcls postprocess must exactly match the host version."""

import jax.numpy as jnp
import numpy as np

from vidsgg.data import EntryCapacity, build_gt_entry, synthetic_video_annotation
from vidsgg.models.postprocess import ObjectsView, sgcls_postprocess
from vidsgg.models.postprocess_device import sgcls_postprocess_device

CAP = EntryCapacity(max_frames=8, max_objs=24, max_pairs=24)


def _case(seed):
    ann = synthetic_video_annotation(num_frames=5, objs_per_frame=3, seed=seed)
    entry = build_gt_entry(ann, CAP)
    rng = np.random.RandomState(seed)
    dist = rng.rand(CAP.max_objs, 36).astype(np.float32)
    # engineer duplicates: give several boxes the same dominant class
    n = int(np.asarray(entry.obj_mask).sum())
    dist[: n // 2, 7] += 1.5
    dist = dist / dist.sum(1, keepdims=True)
    dist *= np.asarray(entry.obj_mask)[:, None]
    return entry, dist


def test_device_matches_host_sgcls():
    for seed in range(4):
        entry, dist = _case(seed)
        n = int(np.asarray(entry.obj_mask).sum())
        num_frames = int(np.asarray(entry.num_frames))

        o = ObjectsView(
            boxes=np.asarray(entry.boxes)[:n],
            distribution=dist[:n].copy(),
            features=np.zeros((n, 4), np.float32),
            mem_features=np.zeros((n, 4), np.float32),
            pred_labels=np.zeros(n, np.int64),
            pred_scores=np.zeros(n, np.float32),
            labels=np.asarray(entry.labels)[:n],
        )
        ho, h_human, h_im, h_pairs = sgcls_postprocess(o, num_frames)

        de = sgcls_postprocess_device(entry, jnp.asarray(dist))
        d_labels = np.asarray(de.pred_labels)[:n]
        d_scores = np.asarray(de.scores)[:n]
        d_dist = np.asarray(de.distribution)[:n]
        p = int(np.asarray(de.pair_mask).sum())

        np.testing.assert_array_equal(d_labels, ho.pred_labels, err_msg=f"seed {seed}")
        np.testing.assert_allclose(d_scores, ho.pred_scores, atol=1e-6)
        np.testing.assert_allclose(d_dist, ho.distribution, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(de.human_idx)[:num_frames], h_human
        )
        np.testing.assert_array_equal(np.asarray(de.im_idx)[:p], h_im)
        np.testing.assert_array_equal(np.asarray(de.pair_idx)[:p], h_pairs)


def test_device_postprocess_is_jittable():
    import jax

    entry, dist = _case(0)
    out = jax.jit(sgcls_postprocess_device)(entry, jnp.asarray(dist))
    assert bool(out.pair_mask.any())
