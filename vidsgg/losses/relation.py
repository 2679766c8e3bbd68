"""Classification losses over padded axes.

Matches the reference's loss assembly (TEMPURA_train.py:190-218) including
its quirks: CrossEntropy is applied to whatever the head emits (the GMM
heads emit *probabilities*, which the reference feeds to CE as if they were
logits — we reproduce that, it is part of the trained objective), BCE runs
on probabilities elementwise. Means are taken over valid entries only, which
on unpadded data equals the reference exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_CLAMP = -100.0  # torch BCELoss clamps log terms at -100


def masked_ce(
    inputs: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Cross entropy (inputs treated as logits, torch CE semantics), mean
    over valid rows. ``class_weights`` mirrors the eos_coef-weighted object
    CE (TEMPURA_train.py:97-100) — torch's reduction='none' + .mean() does
    NOT renormalize by weights, and neither do we."""
    logp = jax.nn.log_softmax(inputs, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if class_weights is not None:
        nll = nll * class_weights[labels]
    m = mask.astype(nll.dtype)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)


def masked_bce(
    probs: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Elementwise binary cross entropy on probabilities, mean over the
    valid rows x classes (torch nn.BCELoss(reduction='none').mean())."""
    p = jnp.clip(probs, 1e-12, 1.0 - 1e-12)
    ll = targets * jnp.maximum(jnp.log(p), _LOG_CLAMP) + (1.0 - targets) * jnp.maximum(
        jnp.log1p(-p), _LOG_CLAMP
    )
    m = jnp.broadcast_to(mask[:, None], ll.shape).astype(ll.dtype)
    return (-ll * m).sum() / jnp.maximum(m.sum(), 1.0)
