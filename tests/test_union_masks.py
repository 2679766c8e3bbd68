import jax.numpy as jnp
import numpy as np

from vidsgg.ops import draw_union_masks


def test_union_mask_full_box_covers_grid():
    # subject box == union window -> full coverage
    pair = jnp.array([[0.0, 0.0, 27.0, 27.0, 0.0, 0.0, 13.5, 13.5]])
    m = np.array(draw_union_masks(pair, 27))
    assert m.shape == (1, 2, 27, 27)
    assert np.allclose(m[0, 0], 1.0)
    # object covers exactly the top-left quadrant (13.5 cells -> half cell at edge)
    assert np.allclose(m[0, 1, :13, :13], 1.0)
    assert np.allclose(m[0, 1, 13, :13], 0.5)
    assert np.allclose(m[0, 1, 14:, :], 0.0)


def test_union_mask_fractional_coverage():
    # box covering left half of the union exactly
    pair = jnp.array([[0.0, 0.0, 50.0, 100.0, 0.0, 0.0, 100.0, 100.0]])
    m = np.array(draw_union_masks(pair, 27))
    # 50/100 * 27 = 13.5 cells
    assert np.allclose(m[0, 0, :, :13], 1.0)
    assert np.allclose(m[0, 0, :, 13], 0.5)
    assert np.allclose(m[0, 0, :, 14:], 0.0)
    assert np.allclose(m[0, 1], 1.0)


def test_union_mask_batched_shape():
    rng = np.random.RandomState(0)
    x1y1 = rng.rand(8, 2, 2) * 50
    wh = rng.rand(8, 2, 2) * 40 + 5
    boxes = np.concatenate([x1y1, x1y1 + wh], -1).reshape(8, 8)
    m = np.array(draw_union_masks(jnp.array(boxes)))
    assert m.shape == (8, 2, 27, 27)
    assert (m >= 0).all() and (m <= 1).all()
    # each mask must contain at least one fully covered cell for boxes > 1 cell
    assert (m.reshape(8, 2, -1).max(-1) > 0.99).all()


def test_matches_per_pixel_oracle():
    """Literal per-cell coverage loop (the Cython kernel's semantics:
    result[n, i, j, k] = y_overlap(j) * x_overlap(k) of the box mapped into
    a size x size grid over the union window)."""
    rng = np.random.RandomState(7)
    size = 9
    for _ in range(4):
        x1y1 = rng.rand(2, 2) * 80
        wh = rng.rand(2, 2) * 50 + 3
        sub = np.concatenate([x1y1[0], x1y1[0] + wh[0]])
        obj = np.concatenate([x1y1[1], x1y1[1] + wh[1]])
        pair = jnp.asarray(np.concatenate([sub, obj])[None])
        got = np.array(draw_union_masks(pair, size))[0]

        ux1, uy1 = min(sub[0], obj[0]), min(sub[1], obj[1])
        ux2, uy2 = max(sub[2], obj[2]), max(sub[3], obj[3])
        w, h = ux2 - ux1, uy2 - uy1
        want = np.zeros((2, size, size))
        for c, box in enumerate([sub, obj]):
            bx1 = (box[0] - ux1) * size / w
            by1 = (box[1] - uy1) * size / h
            bx2 = (box[2] - ux1) * size / w
            by2 = (box[3] - uy1) * size / h
            for j in range(size):
                yc = min(j + 1.0, by2) - max(float(j), by1)
                if yc <= 0:
                    continue
                for k in range(size):
                    xc = min(k + 1.0, bx2) - max(float(k), bx1)
                    if xc <= 0:
                        continue
                    want[c, j, k] = min(yc, 1.0) * min(xc, 1.0)
        np.testing.assert_allclose(got, want, atol=1e-5)
