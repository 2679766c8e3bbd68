"""FAVOR+ linear attention (Performer) and orthogonal random features.

Covers the reference's optional TokenGT attention backend
(tools/TokenGT/tokengt/modules/performer_pytorch.py + orf.py; constructed
behind ``performer=True`` — the VidSGG configs ship with it off,
tokengt.py:58, but the capability is part of the inventory):

* :func:`gaussian_orthogonal_random_matrix` — batched QR-orthogonalized
  Gaussian blocks with row norms matching iid Gaussians (orf.py);
* :func:`favor_attention` — softmax-kernel linear attention
  phi(x) = exp(w^T x - |x|^2/2) / sqrt(m), O(T·m·d) instead of O(T^2·d),
  with key-padding masking folded into the kernelized keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_orthogonal_random_matrix(rng, nb_rows: int, nb_cols: int,
                                      batch: int = 1) -> jnp.ndarray:
    """[batch, nb_rows, nb_cols]; rows are orthogonal blocks scaled to the
    expected chi-distributed norms of iid Gaussian rows (orf.py semantics)."""
    n_blocks = -(-nb_rows // nb_cols)
    keys = jax.random.split(rng, n_blocks + 1)
    blocks = []
    for i in range(n_blocks):
        g = jax.random.normal(keys[i], (batch, nb_cols, nb_cols))
        q, _ = jnp.linalg.qr(g)
        blocks.append(jnp.swapaxes(q, -1, -2))
    mat = jnp.concatenate(blocks, axis=-2)[:, :nb_rows]
    norms = jnp.sqrt(
        jax.random.chisquare(keys[-1], nb_cols, (batch, nb_rows, 1))
    )
    return mat * norms


def _softmax_kernel(x, projection, is_query, eps=1e-4):
    """FAVOR+ positive softmax-kernel features (performer_pytorch.py)."""
    d = x.shape[-1]
    x = x * (d ** -0.25)
    proj = projection * (d ** -0.25)  # fold in 1/sqrt(sqrt(d)) twice
    wx = jnp.einsum("...td,...md->...tm", x, proj)
    sq = (x * x).sum(-1, keepdims=True) / 2.0
    if is_query:
        stab = wx.max(axis=-1, keepdims=True)
    else:
        stab = wx.max(axis=(-1, -2), keepdims=True)
    m = projection.shape[-2]
    return (jnp.exp(wx - sq - stab) + eps) / jnp.sqrt(m)


def favor_attention(q, k, v, key_mask=None, projection=None, rng=None,
                    nb_features: int = 256):
    """Linear attention with the softmax kernel.

    q/k/v: [..., T, d] per-head tensors; key_mask: [..., T] bool.
    ``projection`` [m, d] (shared) or None to draw from ``rng``.
    """
    d = q.shape[-1]
    if projection is None:
        projection = gaussian_orthogonal_random_matrix(rng, nb_features, d)[0]
    qp = _softmax_kernel(q, projection, is_query=True)
    kp = _softmax_kernel(k, projection, is_query=False)
    if key_mask is not None:
        kp = kp * key_mask[..., None]
    kv = jnp.einsum("...tm,...td->...md", kp, v)
    z = 1.0 / (jnp.einsum("...tm,...m->...t", qp, kp.sum(-2)) + 1e-6)
    return jnp.einsum("...tm,...md,...t->...td", qp, kv, z)
