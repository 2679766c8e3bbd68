"""ROIAlign for TPU.

Replaces the reference's CUDA ``roi_layers.ROIAlign`` (output 7x7, spatial
scale 1/16, sampling_ratio 0 — lib/tempura.py:72; call sites
object_detector.py:366/376, lib/tempura.py:309/415, object_classifier.py:63).

Semantics follow the torchvision/jwyang ROIAlign (aligned=False): roi
coordinates are scaled into feature-map space, each output bin is sampled at
a regular sub-grid of points, each point bilinearly interpolated, and the
samples averaged. The reference's ``sampling_ratio=0`` adaptively chooses
ceil(bin_size) samples per bin — a data-dependent *count*, but not a
data-dependent *shape*: the sample count only changes the interpolation
weights, so it compiles statically by computing weight rows under a static
``max_samples`` bound with per-roi masking (slots beyond the roi's adaptive
count contribute zero weight, and the average divides by the true count).
``sampling_ratio=0`` (adaptive, exact reference semantics) is the default;
a positive value gives the static torchvision-style grid.

TPU-native algorithm — **interpolation as matmul**: bilinear pooling is
separable, so each roi's output is

    out[m, n, :] = Ay[m, :] @ fmap[b] @ Ax[n, :]^T

with Ay [7, H] / Ax [7, W] dense row-interpolation matrices whose rows are
the *average* of the bin's sample weights (sample averaging folds into the
matrices). Batch selection folds into Ay by embedding it over the flattened
(B*H) axis. The whole op is then two MXU matmuls — on a v5e this is ~20x
faster than the natural gather formulation (75 ms -> a few ms at detector
shapes) and uses O(chunk) memory. A gather-based reference implementation is
kept for validation (:func:`roi_align_gather`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interp_matrix(starts, bin_sizes, out_size, s, dim, grid=None):
    """Average-of-samples bilinear interpolation rows.

    starts/bin_sizes: [K] roi starts and bin sizes (feature coords).
    grid: optional [K] per-roi adaptive sample counts in [1, s]
      (``sampling_ratio=0`` semantics); sample slots >= grid[k] are masked
      out and the average divides by grid[k] instead of s.
    Returns [K, out_size, dim] weights.
    """
    slot = jnp.arange(s, dtype=jnp.float32)
    if grid is None:
        offs = ((slot + 0.5) / s)[None, :]            # [1, s]
        slot_valid = jnp.ones((1, s), jnp.float32)
        denom = jnp.float32(s)
    else:
        g = grid.astype(jnp.float32)[:, None]          # [K, 1]
        offs = (slot[None, :] + 0.5) / g               # [K, s]
        slot_valid = (slot[None, :] < g).astype(jnp.float32)
        denom = g[..., None]                           # [K, 1, 1] after sum
    # sample positions: [K, out, s]
    pos = (
        starts[:, None, None]
        + (jnp.arange(out_size, dtype=jnp.float32)[None, :, None] + offs[:, None, :])
        * bin_sizes[:, None, None]
    )
    valid = (pos >= -1.0) & (pos <= dim)
    pc = jnp.clip(pos, 0.0, dim - 1.0)
    p0 = jnp.floor(pc)
    frac = pc - p0
    idx = jnp.arange(dim, dtype=jnp.float32)
    # weight of grid line g for a sample at pc: (1-frac) at p0, frac at p0+1
    w0 = (idx[None, None, None, :] == p0[..., None]).astype(jnp.float32) * (
        1.0 - frac[..., None]
    )
    p1 = jnp.minimum(p0 + 1.0, dim - 1.0)
    w1 = (idx[None, None, None, :] == p1[..., None]).astype(jnp.float32) * frac[
        ..., None
    ]
    w = (w0 + w1) * valid[..., None] * slot_valid[:, None, :, None]
    return w.sum(axis=2) / denom  # average the samples -> [K, out, dim]


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 0,
    chunk_size: int = 128,
    compute_dtype=None,
    max_samples: int = 16,
) -> jnp.ndarray:
    """ROIAlign via separable interpolation matmuls.

    Args:
      features: [B, H, W, C] feature maps (NHWC).
      rois: [R, 5] rows of (batch_idx, x1, y1, x2, y2) in input-image scale.
      sampling_ratio: >0 for a static torchvision-style sample grid; 0 for
        the reference's adaptive ceil(bin_size)-samples-per-bin semantics
        (lib/tempura.py:72), realized as masked weights under the static
        ``max_samples`` bound.
      compute_dtype: optional matmul dtype (bf16 halves HBM traffic on the
        big intermediate; interpolation weights lose ~3 decimal digits).
      max_samples: static per-axis bound on the adaptive sample count; rois
        whose bins would need more samples are clamped (exact up to feature
        maps of ~max_samples*out_size on a side — 112 at the defaults, well
        past AG's /16 maps).
    Returns: [R, out_size, out_size, C] in the features dtype.
    """
    b, h, w, c = features.shape
    r = rois.shape[0]
    s = sampling_ratio
    m = out_size

    out_dtype = features.dtype
    if compute_dtype is not None:
        features = features.astype(compute_dtype)
    flat = features.reshape(b * h, w * c)  # contracted as one matmul operand

    rois = rois.astype(jnp.float32)
    pad_r = _round_up(max(r, 1), chunk_size)
    rois_p = jnp.zeros((pad_r, 5), jnp.float32).at[:r].set(rois)

    def pool_chunk(chunk):
        k = chunk.shape[0]
        batch_idx = chunk[:, 0].astype(jnp.int32)
        x1 = chunk[:, 1] * spatial_scale
        y1 = chunk[:, 2] * spatial_scale
        x2 = chunk[:, 3] * spatial_scale
        y2 = chunk[:, 4] * spatial_scale
        bin_w = jnp.maximum(x2 - x1, 1.0) / m
        bin_h = jnp.maximum(y2 - y1, 1.0) / m

        if s > 0:
            ay = _interp_matrix(y1, bin_h, m, s, h)  # [K, m, H]
            ax = _interp_matrix(x1, bin_w, m, s, w)  # [K, m, W]
        else:  # adaptive: ceil(bin_size) samples per bin, per roi
            gy = jnp.clip(jnp.ceil(bin_h), 1.0, max_samples)
            gx = jnp.clip(jnp.ceil(bin_w), 1.0, max_samples)
            ay = _interp_matrix(y1, bin_h, m, max_samples, h, grid=gy)
            ax = _interp_matrix(x1, bin_w, m, max_samples, w, grid=gx)

        # embed the batch selection into the H axis: [K, m, B*H]
        onehot_b = jax.nn.one_hot(batch_idx, b, dtype=jnp.float32)  # [K, B]
        ay_embed = (onehot_b[:, None, :, None] * ay[:, :, None, :]).reshape(
            k * m, b * h
        )
        if compute_dtype is not None:
            ay_embed = ay_embed.astype(compute_dtype)
            ax = ax.astype(compute_dtype)
        t1 = jnp.matmul(
            ay_embed, flat, preferred_element_type=jnp.float32
        ).reshape(k, m, w, c)
        if compute_dtype is not None:
            t1 = t1.astype(compute_dtype)
        out = jnp.einsum(
            "kmwc,knw->kmnc", t1, ax, preferred_element_type=jnp.float32
        )
        return out.astype(out_dtype)

    pooled = jax.lax.map(pool_chunk, rois_p.reshape(-1, chunk_size, 5))
    return pooled.reshape(pad_r, m, m, c)[:r]


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def roi_align_batched(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 0,
    compute_dtype=None,
    max_samples: int = 16,
) -> jnp.ndarray:
    """Per-frame ROIAlign: [B, H, W, C] + [B, N, 4] -> [B, N, m, m, C].

    Same math as :func:`roi_align`, specialized for the detector's regular
    layout (a fixed N rois per frame). The general path embeds batch
    selection into the row axis, so every chunk's stage-1 matmul contracts
    over all B*H rows — at detector shapes (B=20, N=128) ~95% of those
    FLOPs multiply structural zeros (measured 18.5 ms/video on v5e). Here
    each frame's rois contract only against that frame's H rows (one
    [N*m, H] @ [H, W*C] matmul per frame, vmapped), cutting stage-1 FLOPs
    by B x while reading each feature map once.
    """
    b, h, w, c = features.shape
    n = rois.shape[1]
    m = out_size
    out_dtype = features.dtype
    if compute_dtype is not None:
        features = features.astype(compute_dtype)
    rois = rois.astype(jnp.float32)

    def per_frame(fmap, fr):
        x1 = fr[:, 0] * spatial_scale
        y1 = fr[:, 1] * spatial_scale
        x2 = fr[:, 2] * spatial_scale
        y2 = fr[:, 3] * spatial_scale
        bin_w = jnp.maximum(x2 - x1, 1.0) / m
        bin_h = jnp.maximum(y2 - y1, 1.0) / m
        if sampling_ratio > 0:
            ay = _interp_matrix(y1, bin_h, m, sampling_ratio, h)
            ax = _interp_matrix(x1, bin_w, m, sampling_ratio, w)
        else:
            gy = jnp.clip(jnp.ceil(bin_h), 1.0, max_samples)
            gx = jnp.clip(jnp.ceil(bin_w), 1.0, max_samples)
            ay = _interp_matrix(y1, bin_h, m, max_samples, h, grid=gy)
            ax = _interp_matrix(x1, bin_w, m, max_samples, w, grid=gx)
        if compute_dtype is not None:
            ay = ay.astype(compute_dtype)
            ax = ax.astype(compute_dtype)
        t1 = jnp.matmul(
            ay.reshape(n * m, h), fmap.reshape(h, w * c),
            preferred_element_type=jnp.float32,
        ).reshape(n, m, w, c)
        if compute_dtype is not None:
            t1 = t1.astype(compute_dtype)
        out = jnp.einsum(
            "kmwc,knw->kmnc", t1, ax, preferred_element_type=jnp.float32
        )
        return out.astype(out_dtype)

    return jax.vmap(per_frame)(features, rois)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def roi_align_fused(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 0,
    compute_dtype=None,
    max_samples: int = 16,
) -> jnp.ndarray:
    """Per-frame ROIAlign as ONE GEMM per frame: [B,H,W,C] + [B,N,4] ->
    [B,N,m,m,C].

    The separable two-matmul forms (:func:`roi_align`,
    :func:`roi_align_batched`) materialize a [N*m, W*C] intermediate
    (~115 MB/frame at detector shapes) whose HBM round trip dominates —
    measured ~20 ms/video on v5e. Here the y- and x-interpolation rows are
    combined into per-roi bin weights W2[k, m*m, H*W] (an outer product)
    and pooling becomes a single [N*m*m, H*W] @ [H*W, C] matmul per frame:
    2394-deep contraction (ideal MXU shape), no intermediate. More raw
    FLOPs (~615 GF vs 105 GF per video) but ~4x faster wall-clock — the
    MXU eats dense matmuls; HBM round trips it does not.
    """
    b, h, w, c = features.shape
    n = rois.shape[1]
    m = out_size
    out_dtype = features.dtype
    if compute_dtype is not None:
        features = features.astype(compute_dtype)
    rois = rois.astype(jnp.float32)

    def per_frame(fmap, fr):
        x1 = fr[:, 0] * spatial_scale
        y1 = fr[:, 1] * spatial_scale
        x2 = fr[:, 2] * spatial_scale
        y2 = fr[:, 3] * spatial_scale
        bin_w = jnp.maximum(x2 - x1, 1.0) / m
        bin_h = jnp.maximum(y2 - y1, 1.0) / m
        if sampling_ratio > 0:
            ay = _interp_matrix(y1, bin_h, m, sampling_ratio, h)
            ax = _interp_matrix(x1, bin_w, m, sampling_ratio, w)
        else:
            gy = jnp.clip(jnp.ceil(bin_h), 1.0, max_samples)
            gx = jnp.clip(jnp.ceil(bin_w), 1.0, max_samples)
            ay = _interp_matrix(y1, bin_h, m, max_samples, h, grid=gy)
            ax = _interp_matrix(x1, bin_w, m, max_samples, w, grid=gx)
        if compute_dtype is not None:
            ay = ay.astype(compute_dtype)
            ax = ax.astype(compute_dtype)
        # combined bin weights: [N, m, m, H, W] -> [N*m*m, H*W]
        w2 = (ay[:, :, None, :, None] * ax[:, None, :, None, :]).reshape(
            n * m * m, h * w
        )
        out = jnp.matmul(
            w2, fmap.reshape(h * w, c), preferred_element_type=jnp.float32
        )
        return out.reshape(n, m, m, c).astype(out_dtype)

    return jax.vmap(per_frame)(features, rois)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def roi_align_gather(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 0,
    chunk_size: int = 128,
    max_samples: int = 16,
) -> jnp.ndarray:
    """Gather-based reference implementation (validation / small fmaps).

    Same semantics as :func:`roi_align`, including adaptive
    ``sampling_ratio=0`` under the static ``max_samples`` bound.
    """
    b, h, w, c = features.shape
    r = rois.shape[0]
    s = sampling_ratio if sampling_ratio > 0 else max_samples
    adaptive = sampling_ratio <= 0
    flat = features.reshape(b, h * w, c)

    rois = rois.astype(jnp.float32)
    pad_r = _round_up(max(r, 1), chunk_size)
    rois_p = jnp.zeros((pad_r, 5), jnp.float32).at[:r].set(rois)

    slot = jnp.arange(s, dtype=jnp.float32)
    bin_idx = jnp.arange(out_size, dtype=jnp.float32)

    def pool_chunk(chunk):
        batch_idx = chunk[:, 0].astype(jnp.int32)
        x1 = chunk[:, 1] * spatial_scale
        y1 = chunk[:, 2] * spatial_scale
        x2 = chunk[:, 3] * spatial_scale
        y2 = chunk[:, 4] * spatial_scale
        bin_w = jnp.maximum(x2 - x1, 1.0) / out_size
        bin_h = jnp.maximum(y2 - y1, 1.0) / out_size

        if adaptive:
            gy = jnp.clip(jnp.ceil(bin_h), 1.0, s)[:, None]  # [K, 1]
            gx = jnp.clip(jnp.ceil(bin_w), 1.0, s)[:, None]
        else:
            gy = gx = jnp.full((chunk.shape[0], 1), float(s), jnp.float32)
        offs_y = (slot[None, :] + 0.5) / gy                  # [K, s]
        offs_x = (slot[None, :] + 0.5) / gx
        # sample grid [K, out*s]: bin index + intra-bin offset
        grid_y = (bin_idx[None, :, None] + offs_y[:, None, :]).reshape(
            chunk.shape[0], -1
        )
        grid_x = (bin_idx[None, :, None] + offs_x[:, None, :]).reshape(
            chunk.shape[0], -1
        )
        slot_y = (slot[None, :] < gy).astype(jnp.float32)    # [K, s]
        slot_x = (slot[None, :] < gx).astype(jnp.float32)

        ys = y1[:, None] + grid_y * bin_h[:, None]
        xs = x1[:, None] + grid_x * bin_w[:, None]

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
        mm = out_size * s
        idx = jnp.stack(
            [
                y0[:, :, None] * w + x0[:, None, :],
                y0[:, :, None] * w + x1i[:, None, :],
                y1i[:, :, None] * w + x0[:, None, :],
                y1i[:, :, None] * w + x1i[:, None, :],
            ],
            axis=-1,
        ).reshape(k, mm * mm * 4)

        wy = jnp.stack([1.0 - fy, fy], -1)[:, :, None, :, None]
        wx = jnp.stack([1.0 - fx, fx], -1)[:, None, :, None, :]
        wgt = (wy * wx).reshape(k, mm, mm, 4)
        valid = (vy[:, :, None] & vx[:, None, :])[..., None]
        # mask sample slots beyond each roi's adaptive count
        sy = jnp.tile(slot_y[:, None, :], (1, out_size, 1)).reshape(k, mm)
        sx = jnp.tile(slot_x[:, None, :], (1, out_size, 1)).reshape(k, mm)
        wgt = wgt * (sy[:, :, None] * sx[:, None, :])[..., None]
        wgt = jnp.where(valid, wgt, 0.0).reshape(k, mm * mm * 4)

        gathered = flat[batch_idx[:, None], idx]
        out = (gathered * wgt[..., None]).reshape(k, mm, mm, 4, c).sum(3)
        out = out.reshape(k, out_size, s, out_size, s, c).sum(axis=(2, 4))
        return out / (gy * gx)[..., None, None]

    pooled = jax.lax.map(pool_chunk, rois_p.reshape(-1, chunk_size, 5))
    return pooled.reshape(pad_r, out_size, out_size, c)[:r]
