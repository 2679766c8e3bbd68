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
