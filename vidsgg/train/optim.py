"""Optimizer & schedule matching the reference training recipe.

Reference: AdamW(lr=1e-5, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.1)
(TEMPURA_train.py:111, local AdamW copy at tools/utils/AdamW.py),
ExponentialLR(gamma=0.8) stepped per epoch (:113, :353-358) under a
pytorch_warmup ExponentialWarmup(warmup_period=3) damping
(w(e) = min(1, exp((e+1)/period - 1))), and grad-norm clipping at 5.0
(:224).
"""

from __future__ import annotations

import jax
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


def clip_by_global_norm_torch(clip_norm: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_ semantics (the call at
    TEMPURA_train.py:224): scale = min(1, clip / (norm + 1e-6)). The +1e-6
    denominator guard makes every clipped step ~1e-7 relatively smaller
    than optax.clip_by_global_norm's clip/norm — reproduced for oracle-
    grade parity with the reference trajectory."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, clip_norm / (norm + 1e-6))
        return jax.tree.map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_reference_adam(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """The reference's own AdamW update rule (tools/utils/AdamW.py:53-113):

        p -= lr * sqrt(1 - b2^t)/(1 - b1^t) * m / (sqrt(v) + eps)

    i.e. eps is added to the UNCORRECTED sqrt(v) and the bias correction is
    folded into the step size. torch-native AdamW and ``optax.adamw`` add
    eps to the corrected ``sqrt(v_hat)`` instead, which makes their
    effective early-step epsilon ``sqrt(1 - b2^t)``x smaller — a real (if
    small) trajectory difference, gated by the torch-oracle test."""

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        count = state.count + 1
        # widest enabled float: the reference computes the bias corrections
        # in python doubles (AdamW.py:109-111)
        t = count.astype(jnp.result_type(float))
        step = jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        out = jax.tree.map(
            lambda m, v: (step * m / (jnp.sqrt(v) + eps)).astype(m.dtype),
            mu, nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    base_lr: float = 1e-5,
    gamma: float = 0.8,
    warmup_period: int = 3,
    steps_per_epoch: int = 1,
    weight_decay: float = 0.1,
    clip_norm: float = 5.0,
) -> optax.GradientTransformation:
    # Decay order note: the reference multiplies p by (1 - lr*wd) BEFORE its
    # adam delta; since that delta never reads p, the additive
    # add_decayed_weights form below lands on bit-identical parameters.
    return optax.chain(
        clip_by_global_norm_torch(clip_norm),
        scale_by_reference_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(
            reference_lr_schedule(base_lr, gamma, warmup_period,
                                  steps_per_epoch)
        ),
    )
