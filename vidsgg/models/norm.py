"""Masked batch normalization.

The reference uses torch BatchNorm over ragged batches (pos-embed BN1d at
object_classifier.py:79, conv BNs in the union-feature stack at
lib/tempura.py:466-474). On padded TPU buffers plain batch stats would be
polluted by padding rows, so this BN computes moments over *valid* elements
only, while keeping torch's running-stats semantics for inference.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the last axis with an element validity mask.

    Args at call: x [..., C]; mask broadcastable to x.shape[:-1] (True =
    valid). ``use_running_average`` selects inference behavior.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = jnp.broadcast_to(mask[..., None], x.shape).astype(x.dtype)
            cnt = jnp.maximum(m.sum(axis=tuple(range(x.ndim - 1))), 1.0)
            mean = (x * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
            var = ((x - mean) ** 2 * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
            if not self.is_initializing():
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                # torch tracks the unbiased variance in running stats
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return y * scale + bias
