"""Gaussian-mixture classification head.

Vectorized re-design of the reference ``GMM_head``
(tools/utils/gmm_heads.py): the K per-component (mu, pi, var) linears become
three fused projections so the MXU sees one [B, hid] x [hid, K*C] matmul per
quantity instead of 3K small ones.

Semantics matched to the reference:
* var = sigmoid(linear) (:45); pi = softmax over components (:47-51);
* train: logits_k = mu_k + sqrt(var_k) * N(0,1) (reparameterized sample,
  :57-62); output = sum_k pi_k * act(logits_k) (:70-74);
* test: logits_k = mu_k; the *object* head (rel_type None) drops the
  background column before activation (:64-67);
* activation: softmax for attention/object, sigmoid for spatial/contact
  (:15-18);
* unc=True returns (aleatoric, epistemic) = (sum pi*var,
  sum pi*(act(mu)-mean)^2) (:25-35).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class GMMHead(nn.Module):
    num_classes: int
    k: int = 4
    rel_type: str | None = None  # None => object head (softmax, bg-drop at test)

    def _activation(self, x):
        if self.rel_type is None or self.rel_type == "attention":
            return jax.nn.softmax(x, axis=-1)
        return jax.nn.sigmoid(x)

    @nn.compact
    def __call__(self, x, phase: str = "train", unc: bool = False, rng=None):
        b = x.shape[0]
        c, k = self.num_classes, self.k
        mu = nn.Dense(k * c, name="mu")(x).reshape(b, k, c)
        var = jax.nn.sigmoid(nn.Dense(k * c, name="var")(x)).reshape(b, k, c)
        pi = jax.nn.softmax(nn.Dense(k, name="pi")(x), axis=-1)  # [B, K]

        if unc:
            probs = self._activation(mu)  # [B, K, C]
            mean = (probs * pi[:, :, None]).sum(1)
            al_uc = (var * pi[:, :, None]).sum(1)
            ep_uc = (((probs - mean[:, None, :]) ** 2) * pi[:, :, None]).sum(1)
            return al_uc, ep_uc

        if phase == "train":
            if rng is None:
                rng = self.make_rng("gmm")
            eps = jax.random.normal(rng, mu.shape, mu.dtype)
            logits = mu + jnp.sqrt(var) * eps
        else:
            logits = mu if self.rel_type is not None else mu[:, :, 1:]

        return (self._activation(logits) * pi[:, :, None]).sum(1)
