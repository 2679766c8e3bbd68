"""Whole-module numeric parity against the reference's OWN torch modules.

These tests import the reference's pure-torch modules from
``/root/reference`` (transformer.py, gmm_heads.py, infoNCE.py,
temporal_consistency.py — all import-clean on CPU torch), seed them, map
their ``state_dict()`` through the real converter
(:mod:`vidsgg.models.convert_relation`), and assert the Flax forward agrees
with the torch forward on identical ragged inputs. Everything runs in
float64 so agreement is asserted at 1e-8, far below any plausible
re-derivation error.

This is the strongest parity gate obtainable without the external trained
assets: the oracle is the reference itself, not a re-implementation.
Reference: tools/utils/transformer.py:104-253, gmm_heads.py:3-76,
infoNCE.py:7-107, temporal_consistency.py:8-73.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vidsgg.models.convert_relation import (  # noqa: E402
    convert_gmm_head_state_dict,
    convert_sttran_state_dict,
)


@pytest.fixture(scope="module", autouse=True)
def _x64():
    """Run this module in float64 on both sides (tolerances at 1e-8)."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)
    jax.clear_caches()


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _perturb(model, scale=0.1):
    """Randomize all parameters around their init.

    The reference's decoder derives its padding mask from ``row sum == 0``
    (transformer.py:217); with UNTRAINED LayerNorm (scale=1, bias=0) every
    post-norm row sums to ~0 and the exact-zero comparison turns into float
    roundoff chaos (it masks real tokens at random). Trained checkpoints
    never hit this, so the parity target is the perturbed-weights behavior."""
    with torch.no_grad():
        for p in model.parameters():
            p.add_(scale * torch.randn_like(p))
    return model


# ---------------------------------------------------------------------------
# STTran vs tools/utils/transformer.py:transformer
# ---------------------------------------------------------------------------

MEM_SIZES = {"attention": 3, "spatial": 6, "contacting": 17}


def _ragged_inputs(rng, counts, dim):
    """features [P, D] + sorted im_idx for per-frame pair counts."""
    im_idx = np.concatenate([[f] * c for f, c in enumerate(counts)])
    p = len(im_idx)
    feats = rng.standard_normal((p, dim))
    return feats, im_idx.astype(np.int64)


def _run_reference_sttran(ref, feats, im_idx, memory):
    # the reference forward allocates float32 torch.zeros scratch tensors
    # (transformer.py:186-206); run it under a float64 default dtype
    old = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        with torch.no_grad():
            out, local, mem_enc, _, _ = ref(
                _t(feats), _t(im_idx), memory=memory, len_person=None
            )
    finally:
        torch.set_default_dtype(old)
    return out.numpy(), local.numpy(), mem_enc.numpy()


def _run_our_sttran(params, cfg_kwargs, feats, im_idx, memory, mem_active,
                    pad=0):
    from vidsgg.models.sttran import STTran

    p, d = feats.shape
    num_frames = int(im_idx.max()) + 1
    if pad:
        feats = np.concatenate([feats, np.zeros((pad, d))])
        im_idx = np.concatenate([im_idx, np.zeros(pad, np.int64)])
    mask = np.arange(p + pad) < p
    model = STTran(**cfg_kwargs)
    out, rel, mem = model.apply(
        {"params": params},
        jnp.asarray(feats), jnp.asarray(im_idx), jnp.asarray(mask),
        jnp.asarray(num_frames),
        memory=memory, mem_active=jnp.asarray(mem_active),
        deterministic=True,
    )
    return np.asarray(out)[:p], np.asarray(rel)[:p], np.asarray(mem)[:p]


@pytest.mark.parametrize("mode", ["latter", "both"])
@pytest.mark.parametrize(
    "counts", [(3, 3, 3, 3), (1, 4, 2, 5, 1), (2, 2)], ids=["even", "ragged", "two-frame"]
)
def test_sttran_matches_reference_no_memory(mode, counts):
    """Spatial encoder + window-2 decoder + latter/both merge vs the
    reference transformer with mem_compute disabled
    (transformer.py:177-241)."""
    from tools.utils.transformer import transformer

    dim, nhead, ffn = 64, 4, 96
    torch.manual_seed(7)
    ref = transformer(
        enc_layer_num=1, dec_layer_num=3, embed_dim=dim, nhead=nhead,
        dim_feedforward=ffn, dropout=0.1, mode=mode, mem_compute=False,
    ).double().eval()
    _perturb(ref)

    rng = np.random.default_rng(11)
    feats, im_idx = _ragged_inputs(rng, counts, dim)
    out_ref, local_ref, _ = _run_reference_sttran(ref, feats, im_idx, memory=[])

    params = convert_sttran_state_dict(
        ref.state_dict(), enc_layers=1, dec_layers=3, rel_mem_compute=False)
    kw = dict(embed_dim=dim, nhead=nhead, enc_layers=1, dec_layers=3,
              dim_feedforward=ffn, dropout=0.1, mode=mode, mem_compute=None)
    for pad in (0, 3):
        out, rel, _ = _run_our_sttran(params, kw, feats, im_idx, None, False,
                                      pad=pad)
        np.testing.assert_allclose(out, out_ref, atol=1e-8, rtol=1e-8)
        np.testing.assert_allclose(rel, local_ref, atol=1e-8, rtol=1e-8)


@pytest.mark.parametrize("mem_compute,selection", [
    ("joint", "manual"),
    ("seperate", "automated"),
])
@pytest.mark.parametrize("active", [True, False], ids=["mem", "empty-mem"])
def test_sttran_matches_reference_with_memory(mem_compute, selection, active):
    """Late memory fusion (hallucinator) vs transformer.py:143-175 /
    :248-251, joint and 'seperate' banks, manual-lambda and learned gate,
    active and empty-memory passthrough."""
    from tools.utils.transformer import transformer

    dim, nhead, ffn = 64, 4, 96
    torch.manual_seed(3)
    ref = transformer(
        enc_layer_num=1, dec_layer_num=3, embed_dim=dim, nhead=nhead,
        dim_feedforward=ffn, dropout=0.1, mode="latter",
        mem_compute=(True if mem_compute == "joint" else "seperate"),
        mem_fusion="late", selection=selection, selection_lambda=0.3,
    ).double().eval()
    _perturb(ref)

    rng = np.random.default_rng(5)
    feats, im_idx = _ragged_inputs(rng, (2, 3, 1, 4), dim)
    banks = {k: rng.standard_normal((n, dim)) for k, n in MEM_SIZES.items()}

    if active:
        ref_mem = {k: _t(v) for k, v in banks.items()}
    else:
        ref_mem = []
    out_ref, local_ref, mem_ref = _run_reference_sttran(
        ref, feats, im_idx, memory=ref_mem)

    params = convert_sttran_state_dict(
        ref.state_dict(), enc_layers=1, dec_layers=3,
        rel_mem_compute=mem_compute)
    if mem_compute == "joint":
        # joint bank = concat in the reference dict's insertion order
        # (attention-permutation-invariant; convert_memory_banks order)
        our_mem = jnp.asarray(np.concatenate(list(banks.values())))
    else:
        our_mem = {k: jnp.asarray(v) for k, v in banks.items()}
    kw = dict(embed_dim=dim, nhead=nhead, enc_layers=1, dec_layers=3,
              dim_feedforward=ffn, dropout=0.1, mode="latter",
              mem_compute=mem_compute, selection=selection,
              selection_lambda=0.3, mem_fusion="late")
    out, rel, mem = _run_our_sttran(params, kw, feats, im_idx, our_mem, active)
    np.testing.assert_allclose(out, out_ref, atol=1e-8, rtol=1e-8)
    np.testing.assert_allclose(rel, local_ref, atol=1e-8, rtol=1e-8)
    np.testing.assert_allclose(mem, mem_ref, atol=1e-8, rtol=1e-8)


def test_sttran_matches_reference_real_dims():
    """One spot check at the real serving shape (1936-d, 8 heads, 2048 ffn,
    1 enc + 3 dec layers — lib/tempura.py's construction)."""
    from tools.utils.transformer import transformer

    dim, nhead, ffn = 1936, 8, 2048
    torch.manual_seed(1)
    ref = transformer(
        enc_layer_num=1, dec_layer_num=3, embed_dim=dim, nhead=nhead,
        dim_feedforward=ffn, dropout=0.1, mode="latter", mem_compute=False,
    ).double().eval()
    _perturb(ref)

    rng = np.random.default_rng(2)
    feats, im_idx = _ragged_inputs(rng, (2, 3, 2), dim)
    out_ref, _, _ = _run_reference_sttran(ref, feats, im_idx, memory=[])
    params = convert_sttran_state_dict(
        ref.state_dict(), enc_layers=1, dec_layers=3, rel_mem_compute=False)
    kw = dict(embed_dim=dim, nhead=nhead, enc_layers=1, dec_layers=3,
              dim_feedforward=ffn, dropout=0.1, mode="latter", mem_compute=None)
    out, _, _ = _run_our_sttran(params, kw, feats, im_idx, None, False)
    np.testing.assert_allclose(out, out_ref, atol=1e-7, rtol=1e-7)


# ---------------------------------------------------------------------------
# GMMHead vs tools/utils/gmm_heads.py:GMM_head
# ---------------------------------------------------------------------------


def _make_gmm(rel_type, k, hid, ncls):
    from tools.utils.gmm_heads import GMM_head

    torch.manual_seed(13 + k)
    ref = GMM_head(hid, ncls, rel_type=rel_type, k=k).double().eval()
    params = convert_gmm_head_state_dict(ref.state_dict(), k)
    from vidsgg.models.gmm_head import GMMHead

    ours = GMMHead(num_classes=ncls, k=k, rel_type=rel_type)
    return ref, ours, params


@pytest.mark.parametrize("rel_type,ncls", [
    (None, 37), ("attention", 3), ("spatial", 6), ("contacting", 17),
])
@pytest.mark.parametrize("k", [4, 2])
def test_gmm_head_test_phase_and_unc(rel_type, ncls, k):
    """Test-phase weighted logits (incl. the object head's bg-column drop,
    gmm_heads.py:64-67) and the unc=True (aleatoric, epistemic) branch
    (:25-35)."""
    hid, b = 24, 9
    ref, ours, params = _make_gmm(rel_type, k, hid, ncls)
    x = np.random.default_rng(0).standard_normal((b, hid))

    with torch.no_grad():
        out_ref = ref(_t(x), phase="test", unc=False).numpy()
        al_ref, ep_ref = (t.numpy() for t in ref(_t(x), phase="test", unc=True))

    out = ours.apply({"params": params}, jnp.asarray(x), phase="test")
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-10, rtol=1e-8)

    al, ep = ours.apply({"params": params}, jnp.asarray(x), phase="test",
                        unc=True)
    np.testing.assert_allclose(np.asarray(al), al_ref, atol=1e-10, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(ep), ep_ref, atol=1e-10, rtol=1e-8)


@pytest.mark.parametrize("rel_type,ncls", [(None, 37), ("spatial", 6)])
def test_gmm_head_train_phase_shared_noise(rel_type, ncls, monkeypatch):
    """Train-phase reparameterized sampling (gmm_heads.py:57-62): force the
    SAME eps tensor into both stacks (torch.randn per-component, jax one
    fused [B,K,C] draw) and assert the weighted sampled logits agree."""
    hid, b, k = 24, 7, 4
    ref, ours, params = _make_gmm(rel_type, k, hid, ncls)
    x = np.random.default_rng(1).standard_normal((b, hid))
    eps = np.random.default_rng(2).standard_normal((b, k, ncls))

    calls = {"i": 0}

    def fake_randn(*shape, **kw):
        i = calls["i"]
        calls["i"] += 1
        return _t(eps[:, i, :])

    monkeypatch.setattr(torch, "randn", fake_randn)

    def fake_normal(key, shape, dtype=None):
        assert tuple(shape) == eps.shape
        return jnp.asarray(eps, dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal)

    with torch.no_grad():
        out_ref = ref(_t(x), phase="train", unc=False).numpy()
    out = ours.apply({"params": params}, jnp.asarray(x), phase="train",
                     rngs={"gmm": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-10, rtol=1e-8)


# ---------------------------------------------------------------------------
# Contrastive losses vs tools/utils/infoNCE.py
# ---------------------------------------------------------------------------


def test_supcon_loss_matches_reference():
    from tools.utils.infoNCE import SupConLoss

    from vidsgg.losses.contrastive import supcon_loss

    rng = np.random.default_rng(4)
    feats = rng.standard_normal((12, 16))
    labels = rng.integers(0, 4, 12)
    ref = SupConLoss(temperature=0.1)(_t(feats), labels=_t(labels)).item()

    for pad in (0, 5):
        f = np.concatenate([feats, rng.standard_normal((pad, 16))])
        l = np.concatenate([labels, np.zeros(pad, np.int64)])
        valid = np.arange(12 + pad) < 12
        ours = supcon_loss(jnp.asarray(f), jnp.asarray(l), jnp.asarray(valid))
        np.testing.assert_allclose(float(ours), ref, atol=1e-8, rtol=1e-8)


def test_euc_norm_loss_matches_reference():
    from tools.utils.infoNCE import EucNormLoss

    from vidsgg.losses.contrastive import euc_norm_loss

    rng = np.random.default_rng(6)
    feats = rng.standard_normal((10, 16))
    labels = rng.integers(0, 3, 10)
    ref = EucNormLoss()(_t(feats), _t(labels)).item()

    for pad in (0, 4):
        f = np.concatenate([feats, rng.standard_normal((pad, 16))])
        l = np.concatenate([labels, np.zeros(pad, np.int64)])
        valid = np.arange(10 + pad) < 10
        ours = euc_norm_loss(jnp.asarray(f), jnp.asarray(l), jnp.asarray(valid))
        # ours smooths sqrt at 0 (diagonal) with +1e-12 inside the root
        np.testing.assert_allclose(float(ours), ref, atol=1e-5, rtol=1e-6)


# ---------------------------------------------------------------------------
# Temporal-consistency metric vs tools/utils/temporal_consistency.py
# ---------------------------------------------------------------------------


def _tc_entry(rng, runs):
    """Build a predcls-style entry: per-frame person+object pairs with GT
    label runs long enough to form intervals. ``runs`` = list of
    (obj_class, spatial_label, contact_label, length)."""
    obj_cls, s_gt, c_gt = [], [], []
    for cls, s, c, n in runs:
        obj_cls += [cls] * n
        s_gt += [s] * n
        c_gt += [c] * n
    p = len(obj_cls)
    # box list: frame-major [person, obj] per pair (one pair per frame here)
    pred_labels = np.stack([np.ones(p, np.int64), np.asarray(obj_cls)], 1).reshape(-1)
    pair_idx = np.stack([np.arange(p) * 2, np.arange(p) * 2 + 1], 1)
    return {
        "pred_labels": pred_labels,
        "pair_idx": pair_idx,
        "spatial_gt": [[v] for v in s_gt],
        "contacting_gt": [[v] for v in c_gt],
        "spatial_distribution": rng.standard_normal((p, 6)).astype(np.float32),
        "contacting_distribution": rng.standard_normal((p, 17)).astype(np.float32),
    }


RUN_CASES = [
    # one long run per class, incl. a TRAILING run (extends to video end)
    [(5, 2, 4, 9), (7, 1, 3, 10)],
    # run broken mid-way, then resumed; trailing run exactly at window
    [(5, 2, 4, 8), (5, 3, 4, 2), (5, 2, 4, 7)],
    # interleaved classes (target_bool gaps reset runs), short tail
    [(4, 1, 2, 7), (9, 0, 5, 7), (4, 1, 2, 3)],
]


@pytest.mark.parametrize("runs", RUN_CASES)
def test_temporal_consistency_matches_reference(runs, monkeypatch):
    import tools.utils.temporal_consistency as ref_tc

    from vidsgg.eval.temporal import evaluate_temporal_consistency

    monkeypatch.setattr(ref_tc, "device", torch.device("cpu"))
    rng = np.random.default_rng(8)
    entry = _tc_entry(rng, runs)

    pred_t = {
        "pred_labels": _t(entry["pred_labels"]),
        "spatial_gt": entry["spatial_gt"],
        "contacting_gt": entry["contacting_gt"],
        "spatial_distribution": _t(entry["spatial_distribution"]),
        "contacting_distribution": _t(entry["contacting_distribution"]),
    }
    s_ref, c_ref = ref_tc.evaluate_temp_cons(
        pred_t, torch.tensor([]), torch.tensor([]), "sgcls")

    s, c = evaluate_temporal_consistency(entry, "sgcls")
    np.testing.assert_allclose(s, s_ref.numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(c, c_ref.numpy(), atol=1e-5, rtol=1e-5)


def test_temporal_consistency_sgdet_none(monkeypatch):
    from vidsgg.eval.temporal import evaluate_temporal_consistency

    assert evaluate_temporal_consistency({}, "sgdet") == (None, None)
