"""Union-box spatial mask rasterizer.

Replaces the reference's gitignored Cython ``draw_union_boxes`` (imported at
lib/tempura.py:21, tools/utils/object_detector.py:12; called with
``draw_union_boxes(pair_rois, 27) - 0.5``). In the reference pipeline this is
the one op that forces a GPU->CPU->GPU round trip every step
(object_detector.py:379-380); here it is a fully vectorized jnp op that runs
on device inside the jitted step.

Semantics (neural-motifs draw_rectangles.pyx lineage): for each pair of boxes
(subject ⊕ object, original-image scale, [P, 8]) compute the union window,
map each box into an SxS grid over that window, and write the fractional
area coverage of the box in each cell (anti-aliased rectangle fill; interior
cells get 1.0, boundary cells the fractional overlap).
"""

from __future__ import annotations

import jax.numpy as jnp

from vidsgg.constants import SPATIAL_MASK_SIZE


def _rasterize(box: jnp.ndarray, union: jnp.ndarray, size: int) -> jnp.ndarray:
    """Rasterize one box set [..., 4] into [..., size, size] coverage masks.

    ``box`` and ``union`` are aligned xyxy arrays; the box is expressed in
    grid units of the union window before coverage is computed.
    """
    ux1, uy1, ux2, uy2 = union[..., 0], union[..., 1], union[..., 2], union[..., 3]
    w = jnp.maximum(ux2 - ux1, 1e-6)
    h = jnp.maximum(uy2 - uy1, 1e-6)
    x1 = (box[..., 0] - ux1) * size / w
    y1 = (box[..., 1] - uy1) * size / h
    x2 = (box[..., 2] - ux1) * size / w
    y2 = (box[..., 3] - uy1) * size / h

    grid = jnp.arange(size, dtype=jnp.float32)
    # fractional coverage of cell [j, j+1) by interval [lo, hi)
    x_cov = jnp.clip(
        jnp.minimum(grid + 1.0, x2[..., None]) - jnp.maximum(grid, x1[..., None]),
        0.0,
        1.0,
    )  # [..., size]
    y_cov = jnp.clip(
        jnp.minimum(grid + 1.0, y2[..., None]) - jnp.maximum(grid, y1[..., None]),
        0.0,
        1.0,
    )
    return y_cov[..., :, None] * x_cov[..., None, :]  # [..., size, size]


def draw_union_masks(pair_rois: jnp.ndarray, size: int = SPATIAL_MASK_SIZE) -> jnp.ndarray:
    """[P, 8] subject⊕object boxes -> [P, 2, size, size] coverage masks.

    The caller subtracts 0.5 to match the reference's ``draw_union_boxes(...)-0.5``
    centering (lib/tempura.py:313).
    """
    sub = pair_rois[..., 0:4]
    obj = pair_rois[..., 4:8]
    union = jnp.concatenate(
        [
            jnp.minimum(sub[..., 0:2], obj[..., 0:2]),
            jnp.maximum(sub[..., 2:4], obj[..., 2:4]),
        ],
        axis=-1,
    )
    m_sub = _rasterize(sub, union, size)
    m_obj = _rasterize(obj, union, size)
    return jnp.stack([m_sub, m_obj], axis=-3)
