"""Contrastive losses.

* :func:`contrastive_loss` — the pytorch_metric_learning
  ``ContrastiveLoss(pos_margin=0, neg_margin=1)`` the train scripts actually
  use (TEMPURA_train.py:103, :198): L2-normalized embeddings, euclidean
  distances, per-pair hinge, averaged over the *non-zero* positive and
  negative pair losses separately then summed (AvgNonZeroReducer).
* :func:`supcon_loss` / :func:`euc_norm_loss` — the reference's own
  ``SupConLoss`` / ``EucNormLoss`` options (tools/utils/infoNCE.py).

All take a validity mask for the padded row axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(x, eps=1e-12):
    # smooth at x=0 (zero-padded rows): ||x|| has a NaN gradient at 0, so
    # normalize via rsqrt(sum(x^2)+eps) instead
    return x * jax.lax.rsqrt((x * x).sum(-1, keepdims=True) + eps)


def _pair_masks(labels, valid):
    same = labels[:, None] == labels[None, :]
    vv = valid[:, None] & valid[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    pos = same & vv & ~eye
    neg = ~same & vv
    return pos, neg


def _cdist(a, b):
    d2 = (
        (a**2).sum(-1)[:, None]
        + (b**2).sum(-1)[None, :]
        - 2.0 * a @ b.T
    )
    # smooth sqrt: clip()'s zero-gradient region would be fine for the loss
    # value but sqrt at exactly 0 (self/duplicate pairs) has an inf gradient
    return jnp.sqrt(jnp.clip(d2, 0.0, None) + 1e-12)


def contrastive_loss(
    features: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    pos_margin: float = 0.0,
    neg_margin: float = 1.0,
) -> jnp.ndarray:
    f = _normalize(features)
    d = _cdist(f, f)
    pos, neg = _pair_masks(labels, valid)
    pos_l = jnp.clip(d - pos_margin, 0.0) * pos
    neg_l = jnp.clip(neg_margin - d, 0.0) * neg

    def avg_nonzero(x):
        nz = (x > 0).astype(x.dtype)
        return x.sum() / jnp.maximum(nz.sum(), 1.0)

    return avg_nonzero(pos_l) + avg_nonzero(neg_l)


def euc_norm_loss(features, labels, valid):
    """Same-class pairwise L2 pull (infoNCE.py EucNormLoss: row-mean over
    same-label distances incl. self, then mean)."""
    f = _normalize(features)
    d = _cdist(f, f)
    same = (labels[:, None] == labels[None, :]) & valid[:, None] & valid[None, :]
    samef = same.astype(d.dtype)
    row = (d * samef).sum(1) / jnp.maximum(samef.sum(1), 1.0)
    v = valid.astype(d.dtype)
    return (row * v).sum() / jnp.maximum(v.sum(), 1.0)


def supcon_loss(features, labels, valid, temperature=0.1):
    """Supervised contrastive loss (infoNCE.py SupConLoss semantics: anchors
    use raw features, contrast keys are normalized — that asymmetry is the
    reference's)."""
    contrast = _normalize(features)
    anchor = contrast
    logits = anchor @ contrast.T / temperature
    vv = valid[:, None] & valid[None, :]
    eye = jnp.eye(features.shape[0], dtype=bool)
    logits_mask = vv & ~eye
    lbl_mask = (labels[:, None] == labels[None, :]) & vv
    pos_mask = lbl_mask & ~eye

    logits = logits - jnp.max(
        jnp.where(logits_mask, logits, -jnp.inf), axis=1, keepdims=True
    )
    exp = jnp.where(logits_mask, jnp.exp(logits), 0.0)
    logprob = logits - jnp.log(exp.sum(1, keepdims=True) + 1e-12)
    mean_logprob_pos = (pos_mask * logprob).sum(1) / jnp.maximum(
        lbl_mask.astype(logits.dtype).sum(1), 1.0
    )
    v = valid.astype(logits.dtype)
    return -(mean_logprob_pos * v).sum() / jnp.maximum(v.sum(), 1.0)
