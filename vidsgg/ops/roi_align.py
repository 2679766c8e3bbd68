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

Layout: features are NHWC (TPU-friendly; channels on the 128-lane axis).
The whole op is expressed as one batched gather + einsum-free weighted sum so
XLA fuses it into a handful of kernels; with C=1024 the gathers are fully
lane-utilized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(fmap: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample ``fmap`` [H, W, C] at float coords y/x [...]. -> [..., C].

    Out-of-range samples contribute zero (matches the CUDA kernel: samples
    with y < -1 or y > H are skipped; borders are clamped).
    """
    h, w = fmap.shape[0], fmap.shape[1]
    valid = (y >= -1.0) & (y <= h) & (x >= -1.0) & (x <= w)
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)

    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = y - y0.astype(y.dtype)
    lx = x - x0.astype(x.dtype)
    hy = 1.0 - ly
    hx = 1.0 - lx

    v00 = fmap[y0, x0]
    v01 = fmap[y0, x1]
    v10 = fmap[y1, x0]
    v11 = fmap[y1, x1]
    out = (
        v00 * (hy * hx)[..., None]
        + v01 * (hy * lx)[..., None]
        + v10 * (ly * hx)[..., None]
        + v11 * (ly * lx)[..., None]
    )
    return jnp.where(valid[..., None], out, 0.0)


def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlign.

    Args:
      features: [B, H, W, C] feature maps (NHWC).
      rois: [R, 5] rows of (batch_idx, x1, y1, x2, y2) in input-image scale.
      out_size: output spatial resolution (7).
      spatial_scale: feature-map stride inverse (1/16).
      sampling_ratio: static samples-per-bin along each axis.

    Returns:
      [R, out_size, out_size, C] pooled features.
    """
    rois = rois.astype(jnp.float32)
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale

    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    s = sampling_ratio
    # sample offsets within a bin: (i + 0.5) / s for i in range(s)
    offs = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s

    # coords: [R, out, s]
    ys = (
        y1[:, None, None]
        + (jnp.arange(out_size, dtype=jnp.float32)[None, :, None] + offs[None, None, :])
        * bin_h[:, None, None]
    )
    xs = (
        x1[:, None, None]
        + (jnp.arange(out_size, dtype=jnp.float32)[None, :, None] + offs[None, None, :])
        * bin_w[:, None, None]
    )

    # full grid per roi: [R, out, s, out, s]
    yy = ys[:, :, :, None, None]
    xx = xs[:, None, None, :, :]
    yy = jnp.broadcast_to(yy, (rois.shape[0], out_size, s, out_size, s))
    xx = jnp.broadcast_to(xx, (rois.shape[0], out_size, s, out_size, s))

    def sample_one(b, y, x):
        fmap = features[b]
        return _bilinear_gather(fmap, y, x)  # [out, s, out, s, C]

    sampled = jax.vmap(sample_one)(batch_idx, yy, xx)
    # average the s*s samples per bin
    return sampled.mean(axis=(2, 4))
