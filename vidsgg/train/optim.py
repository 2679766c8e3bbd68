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
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """The reference's own AdamW update rule (tools/utils/AdamW.py:53-113):

        p *= (1 - lr*wd)
        p -= lr * sqrt(1 - b2^t)/(1 - b1^t) * m / (sqrt(v) + eps)

    i.e. eps is added to the UNCORRECTED sqrt(v) and the bias correction is
    folded into the step size. torch-native AdamW and ``optax.adamw`` add
    eps to the corrected ``sqrt(v_hat)`` instead, which makes their
    effective early-step epsilon ``sqrt(1 - b2^t)``x smaller — a real (if
    small) trajectory difference, gated by the torch-oracle test.

    Two more torch behaviors reproduced exactly:

    * ``if p.grad is None: continue`` (AdamW.py:67-68): a parameter the loss
      never touched gets NO decay, NO moment update, and its per-param
      ``state['step']`` does not advance. In jax an unused parameter's
      gradient is exactly zero, so the per-TENSOR all-zero-grad mask is the
      faithful translation — without it the epoch-0 memory hallucinator
      (inactive until the first epoch-end bank computation) would silently
      decay while the reference's stays frozen. A live parameter whose true
      gradient is exactly all-zero is measure-zero in practice.
    * the step count is PER-PARAMETER (torch ``state['step']``), so a
      parameter that starts training late (memory activation) still gets
      early-step bias correction, exactly like the reference.

    Weight decay is folded in here (not ``optax.add_decayed_weights``)
    because torch's skip applies to the decay too; the additive form below
    lands on bit-identical parameters since the adam delta never reads p.
    """

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jax.tree.map(
                lambda p: jnp.zeros([], jnp.int32), params),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        if weight_decay and params is None:
            raise ValueError("weight_decay requires params in tx.update")
        touched = jax.tree.map(lambda g: jnp.any(g != 0), updates)
        mu = jax.tree.map(
            lambda t_, m, g: jnp.where(t_, b1 * m + (1 - b1) * g, m),
            touched, state.mu, updates)
        nu = jax.tree.map(
            lambda t_, v, g: jnp.where(t_, b2 * v + (1 - b2) * g * g, v),
            touched, state.nu, updates)
        count = jax.tree.map(
            lambda t_, c: c + t_.astype(jnp.int32), touched, state.count)

        def adam_delta(t_, c, m, v, p):
            # widest enabled float: the reference computes the bias
            # corrections in python doubles (AdamW.py:109-111)
            tt = jnp.maximum(c, 1).astype(jnp.result_type(float))
            step = jnp.sqrt(1.0 - b2**tt) / (1.0 - b1**tt)
            delta = step * m / (jnp.sqrt(v) + eps)
            if weight_decay and p is not None:
                delta = delta + weight_decay * p
            return jnp.where(t_, delta, 0.0).astype(m.dtype)

        if params is None:
            out = jax.tree.map(
                lambda t_, c, m, v: adam_delta(t_, c, m, v, None),
                touched, count, mu, nu)
        else:
            out = jax.tree.map(adam_delta, touched, count, mu, nu, params)
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
    return optax.chain(
        clip_by_global_norm_torch(clip_norm),
        # decay is folded into the adam transform so torch's None-grad skip
        # covers it too (see scale_by_reference_adam)
        scale_by_reference_adam(b1=0.9, b2=0.999, eps=1e-8,
                                weight_decay=weight_decay),
        optax.scale_by_learning_rate(
            reference_lr_schedule(base_lr, gamma, warmup_period,
                                  steps_per_epoch)
        ),
    )
