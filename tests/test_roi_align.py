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
