"""Optimizer & schedule matching the reference training recipe.

Reference: AdamW(lr=1e-5, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.1)
(TEMPURA_train.py:111, local AdamW copy at tools/utils/AdamW.py),
ExponentialLR(gamma=0.8) stepped per epoch (:113, :353-358) under a
pytorch_warmup ExponentialWarmup(warmup_period=3) damping
(w(e) = min(1, exp((e+1)/period - 1))), and grad-norm clipping at 5.0
(:224).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def reference_lr_schedule(
    base_lr: float = 1e-5,
    gamma: float = 0.8,
    warmup_period: int = 3,
    steps_per_epoch: int = 1,
):
    """Per-step schedule reproducing the per-epoch decay x warmup damping."""

    def schedule(step):
        epoch = step // steps_per_epoch
        decay = gamma ** epoch
        warm = jnp.minimum(1.0, jnp.exp((epoch + 1.0) / warmup_period - 1.0))
        return base_lr * decay * warm

    return schedule


def make_optimizer(
    base_lr: float = 1e-5,
    gamma: float = 0.8,
    warmup_period: int = 3,
    steps_per_epoch: int = 1,
    weight_decay: float = 0.1,
    clip_norm: float = 5.0,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(
            learning_rate=reference_lr_schedule(
                base_lr, gamma, warmup_period, steps_per_epoch
            ),
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=weight_decay,
        ),
    )
