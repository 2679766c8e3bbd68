"""Performer FAVOR+ projection redraw (the reference's ProjectionUpdater):
training redraws the random features from the 'performer' RNG stream on an
interval; test time stays deterministic."""

import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.models.tokengt import MultiheadPerformerAttention
from vidsgg.train.steps import performer_rng


def _setup():
    mod = MultiheadPerformerAttention(embed_dim=64, num_heads=4, nb_features=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 64))
    mask = jnp.ones((2, 10), bool)
    variables = mod.init(jax.random.PRNGKey(1), x, mask, True)
    return mod, variables, x, mask


def test_deterministic_at_test_time():
    mod, variables, x, mask = _setup()
    a = mod.apply(variables, x, mask, True)
    b = mod.apply(variables, x, mask, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_redraw_changes_projection_in_train():
    mod, variables, x, mask = _setup()
    t1 = mod.apply(variables, x, mask, False,
                   rngs={"performer": jax.random.PRNGKey(10)})
    t1b = mod.apply(variables, x, mask, False,
                    rngs={"performer": jax.random.PRNGKey(10)})
    t2 = mod.apply(variables, x, mask, False,
                   rngs={"performer": jax.random.PRNGKey(11)})
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t1b))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_no_stream_falls_back_to_constant():
    mod, variables, x, mask = _setup()
    test_out = mod.apply(variables, x, mask, True)
    train_out = mod.apply(variables, x, mask, False)  # no performer stream
    np.testing.assert_array_equal(np.asarray(test_out), np.asarray(train_out))


def test_interval_boundaries():
    k0 = performer_rng(jnp.int32(0), 1000)
    k999 = performer_rng(jnp.int32(999), 1000)
    k1000 = performer_rng(jnp.int32(1000), 1000)
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k999))
    assert not np.array_equal(np.asarray(k0), np.asarray(k1000))
