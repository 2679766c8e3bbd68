"""Golden test: the masked dense STTran equals a direct NumPy transcription
of the reference's ragged loop semantics (tools/utils/transformer.py:177-241)
evaluated with the same parameters.

The NumPy oracle below follows the reference control flow literally:
per-frame bucket attention for the spatial encoder, explicit window tensors
with duplicated tokens for the temporal decoder, and the 'latter' merge.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidsgg.models.sttran import STTran

D, HEADS, FFN = 16, 2, 32
ENC, DEC = 1, 2


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _layer_norm(x, scale, bias, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _mha(p, q, k, v):
    """NumPy multi-head attention matching vidsgg.models.attention."""
    def dense(name, x):
        return x @ np.asarray(p[name]["kernel"]) + np.asarray(p[name]["bias"])

    wq, wk, wv = dense("q_proj", q), dense("k_proj", k), dense("v_proj", v)
    hd = D // HEADS

    def split(x):
        return x.reshape(x.shape[0], HEADS, hd).transpose(1, 0, 2)

    qh, kh, vh = split(wq), split(wk), split(wv)
    logits = qh @ kh.transpose(0, 2, 1) / np.sqrt(hd)
    w = _softmax(logits)
    out = (w @ vh).transpose(1, 0, 2).reshape(q.shape[0], D)
    return dense("out_proj", out)


def _enc_layer(p, x):
    a = _mha(p["MultiheadAttention_0"], x, x, x)
    x = _layer_norm(x + a, p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"])
    h = np.maximum(x @ np.asarray(p["Dense_0"]["kernel"]) + np.asarray(p["Dense_0"]["bias"]), 0)
    h = h @ np.asarray(p["Dense_1"]["kernel"]) + np.asarray(p["Dense_1"]["bias"])
    return _layer_norm(x + h, p["LayerNorm_1"]["scale"], p["LayerNorm_1"]["bias"])


def _dec_layer(p, x, pos):
    a = _mha(p["MultiheadAttention_0"], x + pos, x + pos, x)
    x = _layer_norm(x + a, p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"])
    h = np.maximum(x @ np.asarray(p["Dense_0"]["kernel"]) + np.asarray(p["Dense_0"]["bias"]), 0)
    h = h @ np.asarray(p["Dense_1"]["kernel"]) + np.asarray(p["Dense_1"]["bias"])
    return x + h  # no final norm in the reference decoder layer


def reference_sttran(params, feats, im_idx, num_frames):
    """Literal transcription of transformer.forward (ragged loops)."""
    # spatial encoder: per-frame buckets
    x = feats.copy()
    for _ in range(1):  # layers applied jointly below
        pass
    for li in range(ENC):
        p = params[f"enc_{li}"]
        out = np.zeros_like(x)
        for f in range(num_frames):
            sel = np.where(im_idx == f)[0]
            out[sel] = _enc_layer(p, x[sel])
        x = out
    local = x

    pos_table = np.asarray(params["position_embedding"])
    # temporal decoder: explicit windows with duplicated tokens
    windows = []
    for j in range(num_frames - 1):
        tok = np.where((im_idx == j) | (im_idx == j + 1))[0]
        pos = np.where(im_idx[tok] == j, 0, 1)
        windows.append((tok, local[tok].copy(), pos_table[pos]))

    for li in range(DEC):
        p = params[f"dec_{li}"]
        windows = [
            (tok, _dec_layer(p, xw, posw), posw) for tok, xw, posw in windows
        ]

    # 'latter' merge (transformer.py:236-241)
    out = np.zeros_like(local)
    for j, (tok, xw, _) in enumerate(windows):
        if j == 0:
            first = im_idx[tok] == j
            out[tok[first]] = xw[first]
        latter = im_idx[tok] == j + 1
        out[tok[latter]] = xw[latter]
    return out, local


@pytest.fixture(scope="module")
def sttran_setup():
    model = STTran(
        embed_dim=D, nhead=HEADS, enc_layers=ENC, dec_layers=DEC,
        dim_feedforward=FFN, dropout=0.0, mode="latter", mem_compute=None,
    )
    p_cap = 12
    rng = np.random.RandomState(0)
    feats = rng.randn(p_cap, D).astype(np.float32)
    im_idx = np.array([0, 0, 0, 1, 1, 2, 2, 2, 3, 0, 0, 0], np.int32)
    pair_mask = np.array([True] * 9 + [False] * 3)
    im_idx = np.where(pair_mask, im_idx, 0).astype(np.int32)
    feats = feats * pair_mask[:, None]
    num_frames = 4
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(feats), jnp.asarray(im_idx), jnp.asarray(pair_mask),
        jnp.asarray(num_frames),
    )
    return model, variables, feats, im_idx, pair_mask, num_frames


def test_masked_sttran_matches_ragged_reference(sttran_setup):
    model, variables, feats, im_idx, pair_mask, num_frames = sttran_setup
    got_out, got_local, _ = model.apply(
        variables,
        jnp.asarray(feats), jnp.asarray(im_idx), jnp.asarray(pair_mask),
        jnp.asarray(num_frames), deterministic=True,
    )
    p = int(pair_mask.sum())
    want_out, want_local = reference_sttran(
        jax.tree.map(np.asarray, variables["params"]),
        feats[:p].astype(np.float64), im_idx[:p], num_frames,
    )
    np.testing.assert_allclose(np.asarray(got_local)[:p], want_local, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_out)[:p], want_out, atol=2e-4)
    # padded rows zeroed
    assert np.allclose(np.asarray(got_out)[p:], 0.0)


def test_both_mode_merge(sttran_setup):
    """'both' averages the two window copies for interior frames."""
    model, variables, feats, im_idx, pair_mask, num_frames = sttran_setup
    model_b = STTran(
        embed_dim=D, nhead=HEADS, enc_layers=ENC, dec_layers=DEC,
        dim_feedforward=FFN, dropout=0.0, mode="both", mem_compute=None,
    )
    got, _, _ = model_b.apply(
        variables,
        jnp.asarray(feats), jnp.asarray(im_idx), jnp.asarray(pair_mask),
        jnp.asarray(num_frames), deterministic=True,
    )
    p = int(pair_mask.sum())
    params = jax.tree.map(np.asarray, variables["params"])
    _, local = reference_sttran(params, feats[:p].astype(np.float64), im_idx[:p], num_frames)

    # rebuild windows to compute the reference 'both' merge
    pos_table = np.asarray(params["position_embedding"])
    windows = []
    for j in range(num_frames - 1):
        tok = np.where((im_idx[:p] == j) | (im_idx[:p] == j + 1))[0]
        pos = np.where(im_idx[tok] == j, 0, 1)
        windows.append((tok, local[tok].copy(), pos_table[pos]))
    for li in range(DEC):
        pl = params[f"dec_{li}"]
        windows = [(t, _dec_layer(pl, xw, pw), pw) for t, xw, pw in windows]
    want = np.zeros_like(local)
    for j, (tok, xw, _) in enumerate(windows):
        if j == 0:
            first = im_idx[tok] == j
            want[tok[first]] = xw[first]
        if j == num_frames - 2:
            latter = im_idx[tok] == j + 1
            want[tok[latter]] = xw[latter]
        else:
            latter = im_idx[tok] == j + 1
            nxt = windows[j + 1]
            former_next = im_idx[nxt[0]] == j + 1
            want[tok[latter]] = (xw[latter] + nxt[1][former_next]) / 2
    np.testing.assert_allclose(np.asarray(got)[:p], want, atol=2e-4)
