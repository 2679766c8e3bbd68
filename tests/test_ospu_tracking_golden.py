"""Golden test: the OSPU tracking encoder's masked same-class attention +
frame-rank positional encoding equals a ragged-loop transcription of the
reference semantics (tools/utils/object_classifier.py:176-210): group boxes
by predicted class, run each class sequence through the shared encoder with
per-sequence frame-rank positions, scatter back; singletons go through
individually at position 0."""

import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.models.ospu import OBJ_FEAT_DIM, TorchEncoderLayer, sinusoidal_pe

D, HEADS, FFN = 16, 2, 24


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _layer_norm(x, scale, bias, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _mha(p, x):
    def dense(name, v):
        return v @ np.asarray(p[name]["kernel"]) + np.asarray(p[name]["bias"])

    q, k, v = dense("q_proj", x), dense("k_proj", x), dense("v_proj", x)
    hd = D // HEADS

    def split(t):
        return t.reshape(t.shape[0], HEADS, hd).transpose(1, 0, 2)

    qh, kh, vh = split(q), split(k), split(v)
    w = _softmax(qh @ kh.transpose(0, 2, 1) / np.sqrt(hd))
    out = (w @ vh).transpose(1, 0, 2).reshape(x.shape[0], D)
    return dense("out_proj", out)


def _enc_layer(p, x):
    a = _mha(p["MultiheadAttention_0"], x)
    x = _layer_norm(x + a, p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"])
    h = np.maximum(x @ np.asarray(p["Dense_0"]["kernel"]) + np.asarray(p["Dense_0"]["bias"]), 0)
    h = h @ np.asarray(p["Dense_1"]["kernel"]) + np.asarray(p["Dense_1"]["bias"])
    return _layer_norm(x + h, p["LayerNorm_1"]["scale"], p["LayerNorm_1"]["bias"])


def test_masked_same_class_attention_equals_ragged_sequences():
    rng = np.random.RandomState(0)
    n = 10
    feats = rng.randn(n, D).astype(np.float32)
    cls = np.array([2, 2, 5, 2, 5, 7, 2, 5, 7, 7])
    frame = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2, 3])
    valid = np.ones(n, bool)

    layer = TorchEncoderLayer(D, HEADS, FFN, dropout=0.0)
    same = (cls[:, None] == cls[None, :]) & valid[:, None] & valid[None, :]

    # positional index = frame rank within the class sequence
    pos = np.zeros(n, int)
    for c in np.unique(cls):
        frames_c = sorted(set(frame[cls == c]))
        for i in np.where(cls == c)[0]:
            pos[i] = frames_c.index(frame[i])
    pe = sinusoidal_pe(32, D)
    x_in = feats + pe[pos]

    variables = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x_in), jnp.asarray(same)
    )
    got = np.asarray(
        layer.apply(variables, jnp.asarray(x_in), jnp.asarray(same))
    )

    # ragged oracle: run each class sequence separately through the layer
    params = jax.tree.map(np.asarray, variables["params"])
    want = np.zeros_like(got)
    for c in np.unique(cls):
        idx = np.where(cls == c)[0]
        want[idx] = _enc_layer(params, x_in[idx].astype(np.float64))
    np.testing.assert_allclose(got, want, atol=2e-4)

    # a singleton class attends only to itself == processed individually
    cls2 = cls.copy()
    cls2[9] = 11  # make token 9 a singleton
    same2 = (cls2[:, None] == cls2[None, :]) & valid[:, None] & valid[None, :]
    got2 = np.asarray(layer.apply(variables, jnp.asarray(x_in), jnp.asarray(same2)))
    alone = _enc_layer(params, x_in[9:10].astype(np.float64))
    np.testing.assert_allclose(got2[9], alone[0], atol=2e-4)


def test_frame_rank_positions():
    """_track_positions matches the reference's unique-frame counting
    (object_classifier.py:193-197)."""
    from vidsgg.models.ospu import ObjectClassifier

    oc = ObjectClassifier(mode="sgcls", tracking=True)
    cls = jnp.array([0, 0, 1, 0, 1, 0])
    frame = jnp.array([0, 0, 0, 2, 3, 5])
    valid = jnp.ones(6, bool)
    pos = np.asarray(oc._track_positions(cls, frame, valid, 8))
    # class 0 frames {0, 2, 5} -> ranks 0,0,1,2 ; class 1 frames {0, 3} -> 0,1
    assert pos.tolist() == [0, 0, 0, 1, 1, 2]
