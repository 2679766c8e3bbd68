"""ROIAlign for TPU.

Replaces the reference's CUDA ``roi_layers.ROIAlign`` (output 7x7, spatial
scale 1/16, sampling_ratio 0 — lib/tempura.py:72; call sites
object_detector.py:366/376, lib/tempura.py:309/415, object_classifier.py:63).

Semantics follow the torchvision/jwyang ROIAlign (aligned=False): roi
coordinates are scaled into feature-map space, each output bin is sampled at
a regular sub-grid of points, each point bilinearly interpolated, and the
samples averaged. The reference's ``sampling_ratio=0`` adaptively chooses
ceil(bin_size) samples per bin — a data-dependent shape that XLA cannot
compile — so this implementation uses a static ``sampling_ratio`` (default 2,
the torchvision convention). The difference is a slightly different
quadrature of the same bilinear surface.

Memory/layout design: features are NHWC (channels on the 128-lane axis).
The four bilinear corners are expressed as ONE flat gather of
[chunk, samples*4] indices with scalar weights folded in afterwards, and the
roi axis is processed in fixed-size chunks under ``lax.map`` so peak HBM is
O(chunk * out^2 * s^2 * 4 * C) regardless of the roi count (a naive
broadcast formulation OOMs a v5e chip at detector shapes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
    chunk_size: int = 128,
) -> jnp.ndarray:
    """ROIAlign.

    Args:
      features: [B, H, W, C] feature maps (NHWC).
      rois: [R, 5] rows of (batch_idx, x1, y1, x2, y2) in input-image scale.
      out_size: output spatial resolution (7).
      spatial_scale: feature-map stride inverse (1/16).
      sampling_ratio: static samples-per-bin along each axis.
      chunk_size: rois per lax.map step (bounds peak memory).

    Returns:
      [R, out_size, out_size, C] pooled features.
    """
    b, h, w, c = features.shape
    r = rois.shape[0]
    s = sampling_ratio
    flat = features.reshape(b, h * w, c)

    rois = rois.astype(jnp.float32)
    pad_r = _round_up(max(r, 1), chunk_size)
    rois_p = jnp.zeros((pad_r, 5), jnp.float32).at[:r].set(rois)

    offs = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    grid = (
        jnp.arange(out_size, dtype=jnp.float32)[:, None] + offs[None, :]
    ).reshape(-1)  # [out*s] sample positions in bin units

    def pool_chunk(chunk):
        batch_idx = chunk[:, 0].astype(jnp.int32)
        x1 = chunk[:, 1] * spatial_scale
        y1 = chunk[:, 2] * spatial_scale
        x2 = chunk[:, 3] * spatial_scale
        y2 = chunk[:, 4] * spatial_scale
        bin_w = jnp.maximum(x2 - x1, 1.0) / out_size
        bin_h = jnp.maximum(y2 - y1, 1.0) / out_size

        ys = y1[:, None] + grid[None, :] * bin_h[:, None]  # [K, out*s]
        xs = x1[:, None] + grid[None, :] * bin_w[:, None]

        def corners(v, hi):
            valid = (v >= -1.0) & (v <= hi)
            vc = jnp.clip(v, 0.0, hi - 1.0)
            v0 = jnp.floor(vc).astype(jnp.int32)
            v1 = jnp.minimum(v0 + 1, int(hi) - 1)
            frac = vc - v0.astype(vc.dtype)
            return v0, v1, frac, valid

        y0, y1i, fy, vy = corners(ys, float(h))
        x0, x1i, fx, vx = corners(xs, float(w))

        k = chunk.shape[0]
        m = out_size * s
        # flat spatial indices for the 4 corners of every (y, x) sample
        yy0 = y0[:, :, None]
        yy1 = y1i[:, :, None]
        xx0 = x0[:, None, :]
        xx1 = x1i[:, None, :]
        idx = jnp.stack(
            [
                yy0 * w + xx0,
                yy0 * w + xx1,
                yy1 * w + xx0,
                yy1 * w + xx1,
            ],
            axis=-1,
        ).reshape(k, m * m * 4)

        wy = jnp.stack([1.0 - fy, fy], -1)[:, :, None, :, None]  # [K, m, 1, 2, 1]
        wx = jnp.stack([1.0 - fx, fx], -1)[:, None, :, None, :]  # [K, 1, m, 1, 2]
        wgt = (wy * wx).reshape(k, m, m, 4)
        valid = (vy[:, :, None] & vx[:, None, :])[..., None]
        wgt = jnp.where(valid, wgt, 0.0).reshape(k, m * m * 4)

        gathered = flat[batch_idx[:, None], idx]  # [K, m*m*4, C]
        out = (gathered * wgt[..., None]).reshape(k, m, m, 4, c).sum(3)
        # average the s*s samples per bin
        out = out.reshape(k, out_size, s, out_size, s, c).mean(axis=(2, 4))
        return out

    pooled = jax.lax.map(pool_chunk, rois_p.reshape(-1, chunk_size, 5))
    return pooled.reshape(pad_r, out_size, out_size, c)[:r]
