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


def _clamped_log(x: jnp.ndarray) -> jnp.ndarray:
    """max(log(x), -100) with a NaN-safe gradient at x == 0 (double-where);
    torch BCELoss clamps ONLY the log term — it does NOT pre-clip the
    probability, so log(1e-40) = -92.1 passes through where a 1e-12
    probability clip would flatten it to -27.6. That difference is invisible
    on healthy models but changes the loss (and its gradient) on saturated
    heads — caught by the lock-step trajectory oracle."""
    lo = jnp.exp(jnp.asarray(_LOG_CLAMP, x.dtype))  # e^-100 (0 under f32 flush)
    ok = x > lo
    return jnp.where(ok, jnp.log(jnp.where(ok, x, 1.0)), _LOG_CLAMP)


def masked_bce(
    probs: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Elementwise binary cross entropy on probabilities, mean over the
    valid rows x classes — exact torch nn.BCELoss(reduction='none').mean()
    semantics: loss = -(t*max(log p, -100) + (1-t)*max(log(1-p), -100)),
    matched to torch at the 1-ulp level on both healthy and saturated
    inputs (incl. p == 0 and p == 1 exactly)."""
    one_ok = probs < 1.0
    log1m = jnp.where(
        one_ok, jnp.log1p(-jnp.where(one_ok, probs, 0.0)), _LOG_CLAMP)
    ll = targets * _clamped_log(probs) + (1.0 - targets) * jnp.maximum(
        log1m, _LOG_CLAMP
    )
    m = jnp.broadcast_to(mask[:, None], ll.shape).astype(ll.dtype)
    return (-ll * m).sum() / jnp.maximum(m.sum(), 1.0)
