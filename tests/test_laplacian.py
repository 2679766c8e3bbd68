import jax.numpy as jnp
import numpy as np

from vidsgg.ops import masked_laplacian_eig


def _np_ref(adj):
    deg = np.clip(adj.sum(0), 1, None)
    n_isqrt = np.diag(deg ** -0.5)
    lap = np.eye(adj.shape[0]) - n_isqrt @ adj @ n_isqrt
    return np.linalg.eigh(lap)


def test_masked_laplacian_matches_unpadded_spectrum():
    # path graph 0-1-2 padded to 6 nodes
    n_valid, n = 3, 6
    adj = np.zeros((n, n), np.float32)
    adj[0, 1] = adj[1, 0] = adj[1, 2] = adj[2, 1] = 1.0
    mask = np.arange(n) < n_valid
    eigval, eigvec = masked_laplacian_eig(jnp.array(adj), jnp.array(mask))
    eigval, eigvec = np.array(eigval), np.array(eigvec)

    want_val, want_vec = _np_ref(adj[:n_valid, :n_valid])
    assert np.allclose(eigval[:n_valid], want_val, atol=1e-5)
    # padding eigenpairs pushed far beyond the graph spectrum
    assert (eigval[n_valid:] > 100).all()
    # eigvecs match up to sign
    for i in range(n_valid):
        got = eigvec[:n_valid, i]
        ref = want_vec[:, i]
        assert min(np.abs(got - ref).max(), np.abs(got + ref).max()) < 1e-4
    # padding rows zeroed
    assert np.allclose(eigvec[n_valid:, :], 0.0)


def test_isolated_nodes_clip_degree():
    n = 4
    adj = np.zeros((n, n), np.float32)
    mask = np.ones(n, bool)
    eigval, _ = masked_laplacian_eig(jnp.array(adj), jnp.array(mask))
    # L = I for an empty graph with clipped degrees
    assert np.allclose(np.array(eigval), 1.0, atol=1e-5)


def test_batched_shapes():
    adj = np.zeros((5, 8, 8), np.float32)
    adj[:, 0, 1] = adj[:, 1, 0] = 1.0
    mask = np.ones((5, 8), bool)
    eigval, eigvec = masked_laplacian_eig(jnp.array(adj), jnp.array(mask))
    assert eigval.shape == (5, 8)
    assert eigvec.shape == (5, 8, 8)
