"""Vectorized TEAT-GT edge construction vs a brute-force transcription of
the reference's itertools loops (lib/teatgt.py:199-234)."""

import itertools

import jax.numpy as jnp
import numpy as np

from vidsgg.models.graph_build import clip_edge_masks, masks_to_edge_list


def _brute_force_edges(frames, centers, feats, valid, thr, sim_thr):
    """Reference-style per-frame loops over one clip."""
    n = len(frames)
    spatial, temporal = set(), set()
    frame_ids = sorted({int(f) for f, v in zip(frames, valid) if v})
    past = []
    for fi in frame_ids:
        cur = [i for i in range(n) if valid[i] and frames[i] == fi]
        for u, v in itertools.combinations(cur, 2):
            d = np.sqrt(((centers[u] - centers[v]) ** 2).sum())
            if d <= thr:
                spatial.add((u, v))
                spatial.add((v, u))
        # temporal only against the immediately previous frame id
        if past and past_fi == fi - 1:
            for u, v in itertools.product(past, cur):
                fu = feats[u] / max(np.linalg.norm(feats[u]), 1e-12)
                fv = feats[v] / max(np.linalg.norm(feats[v]), 1e-12)
                if float(fu @ fv) >= sim_thr:
                    temporal.add((u, v))
                    temporal.add((v, u))
        past, past_fi = cur, fi
    return spatial, temporal


def test_edge_masks_match_brute_force():
    rng = np.random.RandomState(0)
    tc = 12
    frames = np.array([0, 0, 0, 1, 1, 2, 2, 2, 3, 0, 0, 0])
    valid = np.array([True] * 9 + [False] * 3)
    centers = rng.rand(tc, 2).astype(np.float32) * 100
    feats = rng.randn(tc, 16).astype(np.float32)
    # make some temporal pairs very similar
    feats[3] = feats[0] + 0.01
    feats[5] = feats[3] + 0.01
    thr, sim = 60.0, 0.75

    sp, tp = clip_edge_masks(
        jnp.asarray(frames)[None], jnp.asarray(centers)[None],
        jnp.asarray(feats)[None], jnp.asarray(valid)[None],
        jnp.asarray(thr), sim,
    )
    sp, tp = np.asarray(sp[0]), np.asarray(tp[0])
    want_sp, want_tp = _brute_force_edges(frames, centers, feats, valid, thr, sim)
    got_sp = {(i, j) for i in range(tc) for j in range(tc) if sp[i, j]}
    got_tp = {(i, j) for i in range(tc) for j in range(tc) if tp[i, j]}
    assert got_sp == want_sp
    assert got_tp == want_tp


def test_edge_list_and_fallback():
    # clip with NO edges -> fallback (0,1)/(1,0) spatial pair
    tc = 8
    frames = jnp.zeros((1, tc), jnp.int32)
    centers = jnp.asarray(np.arange(tc * 2).reshape(1, tc, 2) * 1000.0)
    feats = jnp.asarray(np.eye(tc)[None].astype(np.float32))  # orthogonal
    valid = jnp.ones((1, tc), bool)
    sp, tp = clip_edge_masks(frames, centers, feats, valid, jnp.asarray(1.0), 0.75)
    assert not bool(np.asarray(sp).any()) and not bool(np.asarray(tp).any())
    ei, et, em, adj = masks_to_edge_list(sp, tp, 16)
    assert int(np.asarray(em).sum()) == 2
    got = {tuple(r) for r in np.asarray(ei[0])[np.asarray(em[0])]}
    assert got == {(0, 1), (1, 0)}
    assert np.asarray(adj)[0, 0, 1] == 1.0 and np.asarray(adj)[0, 1, 0] == 1.0


def test_edge_list_capacity_truncation_by_validity():
    # dense spatial clique exceeding the edge cap -> exactly cap edges kept
    tc = 8
    frames = jnp.zeros((1, tc), jnp.int32)
    centers = jnp.zeros((1, tc, 2))
    feats = jnp.asarray(np.random.RandomState(0).randn(1, tc, 4).astype(np.float32))
    valid = jnp.ones((1, tc), bool)
    sp, tp = clip_edge_masks(frames, centers, feats, valid, jnp.asarray(10.0), 2.0)
    # 8*7 = 56 directed spatial edges; cap at 32
    ei, et, em, _ = masks_to_edge_list(sp, tp, 32)
    assert int(np.asarray(em).sum()) == 32
    assert (np.asarray(et)[np.asarray(em)] == 0).all()
