"""Pallas NMS kernel (interpret mode on CPU) vs the lax reference."""

import jax.numpy as jnp
import numpy as np

from vidsgg.ops import nms_mask
from vidsgg.ops.pallas_nms import nms_mask_pallas


def _random_problem(rng, n):
    x1y1 = rng.rand(n, 2).astype(np.float32) * 60
    wh = rng.rand(n, 2).astype(np.float32) * 40 + 2
    boxes = np.concatenate([x1y1, x1y1 + wh], 1)
    scores = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) > 0.25
    return boxes, scores, valid


def test_pallas_nms_matches_reference_single():
    rng = np.random.RandomState(0)
    for t in (0.3, 0.5, 0.7):
        boxes, scores, valid = _random_problem(rng, 40)
        want = np.asarray(
            nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), t)
        )
        got = np.asarray(
            nms_mask_pallas(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), t,
                True,
            )
        )
        assert (got == want).all(), f"mismatch at thresh {t}"


def test_pallas_nms_batched_grid():
    rng = np.random.RandomState(1)
    g, n = 6, 32
    boxes = np.stack([_random_problem(rng, n)[0] for _ in range(g)])
    scores = rng.rand(g, n).astype(np.float32)
    valid = rng.rand(g, n) > 0.2
    got = np.asarray(
        nms_mask_pallas(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, True)
    )
    for i in range(g):
        want = np.asarray(
            nms_mask(jnp.asarray(boxes[i]), jnp.asarray(scores[i]), jnp.asarray(valid[i]), 0.5)
        )
        assert (got[i] == want).all()


def test_pallas_nms_all_invalid_and_identical_boxes():
    n = 16
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (n, 1))
    scores = np.linspace(1, 0, n).astype(np.float32)
    got = np.asarray(
        nms_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5, True
        )
    )
    assert got.sum() == 1 and got[0]  # only the top-scored survives
    got2 = np.asarray(
        nms_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.zeros(n, bool), 0.5, True
        )
    )
    assert not got2.any()


def test_pallas_nms_batched_scan_variant():
    """The problems-on-sublanes batched kernel (one N-step scan for the
    whole grid) matches the lax reference on a 3-d (frame, class) grid and
    on a long-N two-problem case."""
    from vidsgg.ops.pallas_nms import nms_mask_pallas_batched

    rng = np.random.RandomState(2)
    f, c, n = 3, 5, 24
    boxes = np.stack(
        [np.stack([_random_problem(rng, n)[0] for _ in range(c)]) for _ in range(f)]
    )
    scores = rng.rand(f, c, n).astype(np.float32)
    valid = rng.rand(f, c, n) > 0.2
    got = np.asarray(
        nms_mask_pallas_batched(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.4, True
        )
    )
    for i in range(f):
        for j in range(c):
            want = np.asarray(
                nms_mask(
                    jnp.asarray(boxes[i, j]), jnp.asarray(scores[i, j]),
                    jnp.asarray(valid[i, j]), 0.4,
                )
            )
            assert (got[i, j] == want).all(), (i, j)

    n2 = 150  # > one lane tile, pads to 256
    b2 = np.stack([_random_problem(rng, n2)[0] for _ in range(2)])
    s2 = rng.rand(2, n2).astype(np.float32)
    v2 = rng.rand(2, n2) > 0.3
    got2 = np.asarray(
        nms_mask_pallas_batched(
            jnp.asarray(b2), jnp.asarray(s2), jnp.asarray(v2), 0.6, True
        )
    )
    for i in range(2):
        want2 = np.asarray(
            nms_mask(jnp.asarray(b2[i]), jnp.asarray(s2[i]), jnp.asarray(v2[i]), 0.6)
        )
        assert (got2[i] == want2).all()


def _kept_in_rank_order(boxes, scores, valid, mask):
    """Indices of kept boxes ordered by descending score (stable)."""
    order = np.argsort(np.where(valid, -scores, np.inf), kind="stable")
    return [i for i in order if mask[i]]


def test_pallas_nms_max_keep_prefix_exact():
    """Early exit is prefix-stable: the first ``max_keep`` keeps per problem
    (in score order) match the full scan exactly; with max_keep >= the true
    keep count the masks are identical."""
    from vidsgg.ops.pallas_nms import nms_mask_pallas_batched

    rng = np.random.RandomState(7)
    g, n = 4, 80
    boxes = np.stack([_random_problem(rng, n)[0] for _ in range(g)])
    scores = rng.rand(g, n).astype(np.float32)
    valid = rng.rand(g, n) > 0.3
    full = np.asarray(nms_mask_pallas_batched(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5,
        True))
    for mk in (1, 3, 5, n):
        got = np.asarray(nms_mask_pallas_batched(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5,
            True, mk))
        for i in range(g):
            full_keeps = _kept_in_rank_order(
                boxes[i], scores[i], valid[i], full[i])
            have = _kept_in_rank_order(boxes[i], scores[i], valid[i], got[i])
            # every problem's keeps are a rank-order prefix of the full
            # scan's keeps, at least max_keep long (the block exits
            # together, so overshoot is allowed; undershoot is not)
            assert have == full_keeps[: len(have)], (mk, i)
            assert len(have) >= min(mk, len(full_keeps)), (mk, i)
        if mk == n:
            assert (got == full).all()


def test_pallas_nms_max_keep_all_invalid_problem():
    """A problem with zero valid boxes must not stall the early exit and
    must keep nothing."""
    from vidsgg.ops.pallas_nms import nms_mask_pallas_batched

    rng = np.random.RandomState(8)
    n = 40
    boxes = np.stack([_random_problem(rng, n)[0] for _ in range(2)])
    scores = rng.rand(2, n).astype(np.float32)
    valid = np.stack([np.ones(n, bool), np.zeros(n, bool)])
    got = np.asarray(nms_mask_pallas_batched(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5,
        True, 5))
    full = np.asarray(nms_mask_pallas_batched(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5,
        True))
    assert not got[1].any()
    want = _kept_in_rank_order(boxes[0], scores[0], valid[0], full[0])[:5]
    have = _kept_in_rank_order(boxes[0], scores[0], valid[0], got[0])
    assert have[:5] == want


def test_pallas_nms_presorted_matches_sorted_path():
    """presorted=True on inputs already in descending-score order (valid
    first) returns the same mask as the sorting path."""
    from vidsgg.ops.pallas_nms import nms_mask_pallas_batched

    rng = np.random.RandomState(9)
    g, n = 3, 64
    boxes = np.stack([_random_problem(rng, n)[0] for _ in range(g)])
    scores = np.sort(rng.rand(g, n).astype(np.float32), axis=-1)[:, ::-1]
    scores = np.ascontiguousarray(scores)
    valid = np.ones((g, n), bool)
    want = np.asarray(nms_mask_pallas_batched(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5,
        True))
    got = np.asarray(nms_mask_pallas_batched(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5,
        True, None, True))
    assert (got == want).all()
