"""Masked batched normalized-Laplacian eigendecomposition.

Replaces the reference's per-clip CPU path (dgl graph -> scipy adjacency ->
``np.linalg.eigh``, lib/teatgt.py:243-254) with an on-device ``jnp.linalg.eigh``
over fixed-size padded adjacency matrices, so TEAT-GT's clip loop stays
inside the compiled step.

Convention (matches lib/teatgt.py:248-253): L = I - D^{-1/2} A D^{-1/2} with
in-degrees clipped to >= 1. Padding nodes are given a huge diagonal so their
eigenpairs sort to the end of the (ascending) spectrum; the first
``num_valid`` columns then correspond to the true graph's spectrum. Eigvec
sign/degenerate-subspace conventions are arbitrary in the reference too (and
randomized by train-time sign flips, tokenizer.py:134-151), so only the
spanned subspaces are contract-stable.
"""

from __future__ import annotations

import jax.numpy as jnp

_PAD_DIAG = 1e6


def masked_laplacian_eig(
    adj: jnp.ndarray, node_mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of the sym-normalized Laplacian of a masked graph.

    Args:
      adj: [..., N, N] dense (possibly weighted) adjacency; entries touching
        padding nodes are ignored.
      node_mask: [..., N] bool validity of each node.

    Returns:
      (eigval [..., N], eigvec [..., N, N]) in ascending eigenvalue order.
      Rows (node axis) of padding nodes are zeroed; the trailing columns
      belonging to padding carry eigenvalue ~_PAD_DIAG.
    """
    mask_f = node_mask.astype(adj.dtype)
    pair_mask = mask_f[..., :, None] * mask_f[..., None, :]
    a = adj * pair_mask
    deg = jnp.clip(a.sum(axis=-2), 1.0, None)  # in-degrees, clipped like the ref
    d_isqrt = jnp.where(node_mask, 1.0 / jnp.sqrt(deg), 0.0)
    lap = -a * d_isqrt[..., :, None] * d_isqrt[..., None, :]
    diag = jnp.where(node_mask, 1.0, _PAD_DIAG)
    n = adj.shape[-1]
    lap = lap + diag[..., :, None] * jnp.eye(n, dtype=adj.dtype)
    eigval, eigvec = jnp.linalg.eigh(lap)
    eigvec = eigvec * mask_f[..., :, None]  # zero padding-node rows
    return eigval, eigvec
