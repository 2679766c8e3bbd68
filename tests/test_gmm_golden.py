"""Golden test: fused GMMHead equals a NumPy transcription of the
reference's per-component loop math (tools/utils/gmm_heads.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.models.gmm_head import GMMHead

HID, NCLS, K = 24, 7, 4


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _oracle(params, x, rel_type, unc):
    """gmm_heads.py:37-76 with the K loops written out."""
    kmu = np.asarray(params["mu"]["kernel"])    # [HID, K*C]
    bmu = np.asarray(params["mu"]["bias"])
    kvar = np.asarray(params["var"]["kernel"])
    bvar = np.asarray(params["var"]["bias"])
    kpi = np.asarray(params["pi"]["kernel"])
    bpi = np.asarray(params["pi"]["bias"])

    mu = (x @ kmu + bmu).reshape(-1, K, NCLS)
    var = _sigmoid((x @ kvar + bvar)).reshape(-1, K, NCLS)
    pi = _softmax(x @ kpi + bpi, axis=1)  # [B, K]

    act = _softmax if rel_type in (None, "attention") else _sigmoid

    if unc:
        probs = act(mu) if rel_type not in (None, "attention") else _softmax(mu, axis=-1)
        new_conf = (probs * pi[:, :, None]).sum(1)
        al = (var * pi[:, :, None]).sum(1)
        ep = (((probs - new_conf[:, None, :]) ** 2) * pi[:, :, None]).sum(1)
        return al, ep

    # test phase: logits = mu (rel heads) or mu[:, :, 1:] (object head)
    logits = mu if rel_type is not None else mu[:, :, 1:]
    probs = _softmax(logits, axis=-1) if rel_type in (None, "attention") else _sigmoid(logits)
    return (probs * pi[:, :, None]).sum(1)


def _setup(rel_type):
    model = GMMHead(NCLS, K, rel_type)
    x = np.random.RandomState(0).randn(5, HID).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gmm": jax.random.PRNGKey(1)},
        jnp.asarray(x), phase="test",
    )
    return model, variables, x


def test_gmm_test_phase_matches_oracle_rel():
    for rel_type in ("attention", "spatial", "contact"):
        model, variables, x = _setup(rel_type)
        got = np.asarray(model.apply(variables, jnp.asarray(x), phase="test"))
        want = _oracle(variables["params"], x.astype(np.float64), rel_type, False)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_gmm_object_head_drops_background_at_test():
    model, variables, x = _setup(None)
    got = np.asarray(model.apply(variables, jnp.asarray(x), phase="test"))
    assert got.shape == (5, NCLS - 1)
    want = _oracle(variables["params"], x.astype(np.float64), None, False)
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(got.sum(1), 1.0, atol=1e-5)


def test_gmm_uncertainties_match_oracle():
    model, variables, x = _setup("contact")
    al, ep = model.apply(variables, jnp.asarray(x), phase="test", unc=True)
    wal, wep = _oracle(variables["params"], x.astype(np.float64), "contact", True)
    np.testing.assert_allclose(np.asarray(al), wal, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ep), wep, atol=1e-5)


def test_gmm_train_sampling_centers_on_mu():
    """E[sampled output] over many rng draws approaches the pi-weighted
    activation of mu-centered gaussians; just check finiteness + spread."""
    model, variables, x = _setup("attention")
    outs = []
    for i in range(8):
        o = model.apply(
            variables, jnp.asarray(x), phase="train",
            rngs={"gmm": jax.random.PRNGKey(i)},
        )
        outs.append(np.asarray(o))
    outs = np.stack(outs)
    assert np.isfinite(outs).all()
    assert outs.std(0).max() > 1e-4  # actually stochastic
    np.testing.assert_allclose(outs.sum(-1), 1.0, atol=1e-5)  # softmax mixtures
