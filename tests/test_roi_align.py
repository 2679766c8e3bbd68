import jax.numpy as jnp
import numpy as np

from vidsgg.ops import roi_align


def test_roi_align_constant_map():
    fmap = jnp.full((2, 16, 16, 8), 3.0)
    rois = jnp.array([[0.0, 16.0, 16.0, 128.0, 128.0], [1.0, 0.0, 0.0, 64.0, 64.0]])
    out = np.array(roi_align(fmap, rois, out_size=7, spatial_scale=1.0 / 16.0))
    assert out.shape == (2, 7, 7, 8)
    assert np.allclose(out, 3.0, atol=1e-5)


def test_roi_align_linear_ramp_exact():
    # bilinear sampling of a linear function reproduces it exactly, and the
    # mean of samples in a bin equals the function at the bin center
    h = w = 32
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ramp = (2.0 * xs + 3.0 * ys).astype(np.float32)[None, :, :, None]
    fmap = jnp.array(ramp)
    # roi in image scale mapping to feature coords [4, 4, 20, 20]
    rois = jnp.array([[0.0, 64.0, 64.0, 320.0, 320.0]])
    out = np.array(roi_align(fmap, rois, out_size=4, spatial_scale=1.0 / 16.0))[0, :, :, 0]
    bin_size = (20.0 - 4.0) / 4
    centers = 4.0 + (np.arange(4) + 0.5) * bin_size
    want = 2.0 * centers[None, :] + 3.0 * centers[:, None]
    assert np.allclose(out, want, atol=1e-4)


def test_roi_align_batch_index_routing():
    fmap = np.zeros((2, 8, 8, 1), np.float32)
    fmap[0] = 1.0
    fmap[1] = 5.0
    rois = jnp.array([[1.0, 0.0, 0.0, 64.0, 64.0], [0.0, 0.0, 0.0, 64.0, 64.0]])
    out = np.array(roi_align(jnp.array(fmap), rois, out_size=2))
    assert np.allclose(out[0], 5.0, atol=1e-5)
    assert np.allclose(out[1], 1.0, atol=1e-5)


def test_matmul_equals_gather_formulation():
    from vidsgg.ops.roi_align import roi_align_gather

    rng = np.random.RandomState(3)
    fmap = jnp.asarray(rng.randn(3, 12, 17, 32).astype(np.float32))
    r = 20
    x1y1 = rng.rand(r, 2).astype(np.float32) * 150
    wh = rng.rand(r, 2).astype(np.float32) * 120 + 8
    rois = np.concatenate(
        [rng.randint(0, 3, (r, 1)).astype(np.float32), x1y1, x1y1 + wh], 1
    )
    a = np.asarray(roi_align(fmap, jnp.asarray(rois)))
    b = np.asarray(roi_align_gather(fmap, jnp.asarray(rois)))
    assert np.allclose(a, b, atol=2e-4), np.abs(a - b).max()


# ---------------------------------------------------------------------------
# sampling_ratio=0 (adaptive) golden tests: oracle is a direct NumPy
# transcription of the torchvision/Caffe2 ROIAlign CPU kernel
# (aligned=False), the semantics behind the reference's CUDA op at
# lib/tempura.py:72 (output 7x7, scale 1/16, sampling_ratio 0).
# ---------------------------------------------------------------------------


def _bilinear(f, y, x):
    h, w, _ = f.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(f.shape[-1])
    y, x = max(y, 0.0), max(x, 0.0)
    y0, x0 = int(y), int(x)
    y1, x1 = y0 + 1, x0 + 1
    if y0 >= h - 1:
        y0 = y1 = h - 1
        y = float(y0)
    if x0 >= w - 1:
        x0 = x1 = w - 1
        x = float(x0)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx
    return (
        hy * hx * f[y0, x0]
        + hy * lx * f[y0, x1]
        + ly * hx * f[y1, x0]
        + ly * lx * f[y1, x1]
    )


def _oracle_roi_align(fmap, rois, out, scale, sampling_ratio=0):
    B, H, W, C = fmap.shape
    res = np.zeros((len(rois), out, out, C), np.float32)
    for r, (b, rx1, ry1, rx2, ry2) in enumerate(rois):
        b = int(b)
        x1, y1, x2, y2 = rx1 * scale, ry1 * scale, rx2 * scale, ry2 * scale
        bw = max(x2 - x1, 1.0) / out
        bh = max(y2 - y1, 1.0) / out
        gy = sampling_ratio if sampling_ratio > 0 else int(np.ceil(bh))
        gx = sampling_ratio if sampling_ratio > 0 else int(np.ceil(bw))
        count = max(gy * gx, 1)
        for ph in range(out):
            for pw in range(out):
                acc = np.zeros(C, np.float64)
                for iy in range(gy):
                    y = y1 + ph * bh + (iy + 0.5) * bh / gy
                    for ix in range(gx):
                        x = x1 + pw * bw + (ix + 0.5) * bw / gx
                        acc += _bilinear(fmap[b], y, x)
                res[r, ph, pw] = acc / count
    return res


def _random_rois(rng, n, b, max_xy=900.0):
    x1y1 = rng.rand(n, 2).astype(np.float32) * (max_xy * 0.6)
    # widths spanning tiny (adaptive g=1) to near-full-image (g ~ 8-10)
    wh = rng.rand(n, 2).astype(np.float32) ** 2 * (max_xy - x1y1.max(1, keepdims=True))
    wh = np.maximum(wh, 4.0)
    bi = rng.randint(0, b, (n, 1)).astype(np.float32)
    return np.concatenate([bi, x1y1, np.minimum(x1y1 + wh, max_xy)], 1)


def test_adaptive_sampling_matches_torchvision_oracle():
    rng = np.random.RandomState(11)
    fmap = rng.randn(2, 38, 57, 6).astype(np.float32)  # AG-scale /16 map
    rois = _random_rois(rng, 24, 2, max_xy=57 * 16.0)
    want = _oracle_roi_align(fmap, rois, out=7, scale=1.0 / 16.0)
    got = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois)))
    assert np.allclose(got, want, atol=3e-4), np.abs(got - want).max()
    got_g = np.asarray(
        __import__("vidsgg.ops.roi_align", fromlist=["roi_align_gather"])
        .roi_align_gather(jnp.asarray(fmap), jnp.asarray(rois))
    )
    assert np.allclose(got_g, want, atol=3e-4), np.abs(got_g - want).max()


def test_adaptive_full_image_union_box():
    # a union box covering the whole image exercises the largest adaptive
    # sample counts (ceil(bin) ~ H/16/7 and W/16/7)
    rng = np.random.RandomState(5)
    fmap = rng.randn(1, 44, 70, 3).astype(np.float32)
    rois = np.array([[0.0, 0.0, 0.0, 70 * 16.0, 44 * 16.0]], np.float32)
    want = _oracle_roi_align(fmap, rois, out=7, scale=1.0 / 16.0)
    got = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(rois)))
    assert np.allclose(got, want, atol=3e-4), np.abs(got - want).max()


def test_static_sampling_ratio_matches_oracle():
    rng = np.random.RandomState(7)
    fmap = rng.randn(2, 20, 25, 4).astype(np.float32)
    rois = _random_rois(rng, 12, 2, max_xy=25 * 16.0)
    want = _oracle_roi_align(fmap, rois, out=5, scale=1.0 / 16.0, sampling_ratio=2)
    got = np.asarray(
        roi_align(jnp.asarray(fmap), jnp.asarray(rois), out_size=5, sampling_ratio=2)
    )
    assert np.allclose(got, want, atol=3e-4), np.abs(got - want).max()


def test_roi_align_batched_matches_general():
    """The per-frame batched form equals the batch-embedded general form
    (the zero rows it skips contribute exactly nothing)."""
    import jax.numpy as jnp
    from vidsgg.ops.roi_align import roi_align, roi_align_batched

    rng = np.random.RandomState(11)
    b, h, w, c, n = 3, 9, 13, 8, 6
    feats = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    rois = rng.rand(b, n, 4).astype(np.float32) * 100
    rois[..., 2:] += rois[..., :2]
    rois5 = np.concatenate(
        [np.repeat(np.arange(b), n).reshape(b, n, 1).astype(np.float32), rois],
        axis=-1,
    )
    for sr in (0, 2):
        want = np.asarray(
            roi_align(feats, jnp.asarray(rois5.reshape(-1, 5)), 7, 1 / 16.0, sr)
        ).reshape(b, n, 7, 7, c)
        got = np.asarray(
            roi_align_batched(feats, jnp.asarray(rois), 7, 1 / 16.0, sr)
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_roi_align_fused_matches_general():
    """The fused one-GEMM per-frame form equals the separable general form."""
    import jax.numpy as jnp
    from vidsgg.ops.roi_align import roi_align, roi_align_fused

    rng = np.random.RandomState(13)
    b, h, w, c, n = 3, 9, 13, 8, 6
    feats = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    rois = rng.rand(b, n, 4).astype(np.float32) * 100
    rois[..., 2:] += rois[..., :2]
    rois5 = np.concatenate(
        [np.repeat(np.arange(b), n).reshape(b, n, 1).astype(np.float32), rois],
        axis=-1,
    )
    for sr in (0, 2):
        want = np.asarray(
            roi_align(feats, jnp.asarray(rois5.reshape(-1, 5)), 7, 1 / 16.0, sr)
        ).reshape(b, n, 7, 7, c)
        got = np.asarray(
            roi_align_fused(feats, jnp.asarray(rois), 7, 1 / 16.0, sr)
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
