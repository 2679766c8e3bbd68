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


# ---------------------------------------------------------------------------
# sgdet device postprocess must exactly match the host version
# ---------------------------------------------------------------------------


def _sgdet_case(seed):
    ann = synthetic_video_annotation(num_frames=5, objs_per_frame=3, seed=seed)
    entry = build_gt_entry(ann, CAP)
    rng = np.random.RandomState(100 + seed)
    n = int(np.asarray(entry.obj_mask).sum())
    dist = rng.rand(CAP.max_objs, 36).astype(np.float32)
    dist = dist / dist.sum(1, keepdims=True)
    dist *= np.asarray(entry.obj_mask)[:, None]
    # detector labels with guaranteed clean_class hits (5, 8, 17)
    det_labels = rng.randint(1, 37, CAP.max_objs)
    det_labels[1 % n] = 5
    det_labels[2 % n] = 8
    det_labels[3 % n] = 17
    det_labels = det_labels * np.asarray(entry.obj_mask)
    # overlapping boxes to exercise NMS suppression: clone a few boxes
    boxes = np.asarray(entry.boxes).copy()
    if n >= 4:
        boxes[2, 1:] = boxes[1, 1:]
        boxes[2, 0] = boxes[1, 0]
        dist[2] = dist[1]  # same argmax class -> same NMS group
    feats = rng.randn(CAP.max_objs, 16).astype(np.float32)
    feats *= np.asarray(entry.obj_mask)[:, None]
    mem = rng.randn(CAP.max_objs, 8).astype(np.float32)
    mem *= np.asarray(entry.obj_mask)[:, None]
    entry = entry.replace(
        boxes=jnp.asarray(boxes),
        pred_labels=jnp.asarray(det_labels.astype(np.int32)),
        features=jnp.asarray(feats),
    )
    return entry, dist, mem, n


def test_device_matches_host_sgdet():
    from vidsgg.models.postprocess import sgdet_postprocess
    from vidsgg.models.postprocess_device import sgdet_postprocess_device

    for seed in range(5):
        entry, dist, mem, n = _sgdet_case(seed)
        num_frames = int(np.asarray(entry.num_frames))

        o = ObjectsView(
            boxes=np.asarray(entry.boxes)[:n],
            distribution=dist[:n].copy(),
            features=np.asarray(entry.features)[:n],
            mem_features=mem[:n],
            pred_labels=np.asarray(entry.pred_labels)[:n].astype(np.int64),
            pred_scores=np.zeros(n, np.float32),
            labels=np.asarray(entry.labels)[:n],
        )
        ho, h_human, h_im, h_pairs = sgdet_postprocess(o, num_frames)

        de, d_mem, overflow = sgdet_postprocess_device(
            entry, jnp.asarray(dist), jnp.asarray(mem)
        )
        assert not bool(overflow)
        k = len(ho.boxes)
        assert int(np.asarray(de.obj_mask).sum()) == k, f"seed {seed}"
        np.testing.assert_allclose(
            np.asarray(de.boxes)[:k], ho.boxes, atol=1e-6, err_msg=f"seed {seed}"
        )
        np.testing.assert_array_equal(np.asarray(de.pred_labels)[:k], ho.pred_labels)
        np.testing.assert_allclose(np.asarray(de.scores)[:k], ho.pred_scores, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(de.distribution)[:k], ho.distribution, atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(de.features)[:k], ho.features, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d_mem)[:k], ho.mem_features, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(de.labels)[:k], ho.labels)
        np.testing.assert_array_equal(
            np.asarray(de.human_idx)[:num_frames], h_human
        )
        p = int(np.asarray(de.pair_mask).sum())
        assert p == len(h_im)
        np.testing.assert_array_equal(np.asarray(de.im_idx)[:p], h_im)
        np.testing.assert_array_equal(np.asarray(de.pair_idx)[:p], h_pairs)


def test_sgdet_device_overflow_flag():
    from vidsgg.models.postprocess_device import sgdet_postprocess_device

    entry, dist, mem, n = _sgdet_case(0)
    # every box labeled 5 -> clean_class would double the whole valid set
    # three times; expand=1 cannot hold it
    labels = np.where(np.asarray(entry.obj_mask), 5, 0).astype(np.int32)
    entry = entry.replace(pred_labels=jnp.asarray(labels))
    _, _, overflow = sgdet_postprocess_device(
        entry, jnp.asarray(dist), jnp.asarray(mem), expand=1
    )
    assert bool(overflow)
