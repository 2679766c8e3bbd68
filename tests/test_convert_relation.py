"""Trained-TEMPURA checkpoint conversion (models/convert_relation.py).

Strategy mirrors tests/test_convert.py for the detector: synthesize a FULL
torch-layout state_dict for the reference TEMPURA (lib/tempura.py:460-510,
:51-112; tools/utils/transformer.py), convert, and assert the audit holds in
both directions — every torch key consumed, every Flax leaf written with the
right shape (jax.eval_shape, no allocation). Numeric spot-checks pin the
three risky layout conventions: the vr_fc CHW->HWC row permutation, the
torch MultiheadAttention in_proj split (vs real torch), and the k-major GMM
head fusion (vs a NumPy mixture computed from the per-component weights).
"""

import numpy as np
import pytest

from vidsgg import constants as C
from vidsgg.models.convert_relation import (
    convert_memory_banks,
    convert_tempura_state_dict,
    expected_tempura_shapes,
)
from vidsgg.detector.convert import validate_converted
from vidsgg.models.tempura import TempuraConfig

E = 1936  # pair-feature dim
OBJ_D = 2048 + 200 + 128


def _rng():
    return np.random.RandomState(0)


def _lin(sd, r, prefix, o, i, bias=True):
    sd[f"{prefix}.weight"] = r.randn(o, i).astype(np.float32)
    if bias:
        sd[f"{prefix}.bias"] = r.randn(o).astype(np.float32)


def _conv(sd, r, prefix, o, i, k):
    sd[f"{prefix}.weight"] = r.randn(o, i, k, k).astype(np.float32)
    sd[f"{prefix}.bias"] = r.randn(o).astype(np.float32)


def _bn(sd, r, prefix, c):
    sd[f"{prefix}.weight"] = r.rand(c).astype(np.float32) + 0.5
    sd[f"{prefix}.bias"] = r.randn(c).astype(np.float32)
    sd[f"{prefix}.running_mean"] = r.randn(c).astype(np.float32)
    sd[f"{prefix}.running_var"] = r.rand(c).astype(np.float32) + 0.5
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(7)


def _ln(sd, r, prefix, c):
    sd[f"{prefix}.weight"] = r.rand(c).astype(np.float32) + 0.5
    sd[f"{prefix}.bias"] = r.randn(c).astype(np.float32)


def _mha(sd, r, prefix, e, bias=True):
    sd[f"{prefix}.in_proj_weight"] = r.randn(3 * e, e).astype(np.float32)
    if bias:
        sd[f"{prefix}.in_proj_bias"] = r.randn(3 * e).astype(np.float32)
    _lin(sd, r, f"{prefix}.out_proj", e, e, bias=bias)


def _enc_layer(sd, r, prefix, e, ff):
    _mha(sd, r, f"{prefix}.self_attn", e)
    _lin(sd, r, f"{prefix}.linear1", ff, e)
    _lin(sd, r, f"{prefix}.linear2", e, ff)
    _ln(sd, r, f"{prefix}.norm1", e)
    _ln(sd, r, f"{prefix}.norm2", e)


def _dec_layer(sd, r, prefix, e, ff):
    _mha(sd, r, f"{prefix}.multihead2", e)
    _lin(sd, r, f"{prefix}.linear1", ff, e)
    _lin(sd, r, f"{prefix}.linear2", e, ff)
    _ln(sd, r, f"{prefix}.norm3", e)


def _gmm(sd, r, prefix, hid, c, k):
    for i in range(1, k + 1):
        _lin(sd, r, f"{prefix}.heads.mu_{i}", c, hid)
        _lin(sd, r, f"{prefix}.heads.pi_{i}", 1, hid)
        _lin(sd, r, f"{prefix}.heads.var_{i}", c, hid)


def synth_state_dict(cfg: TempuraConfig) -> dict:
    """Full reference TEMPURA state_dict for ``cfg`` (lib/tempura.py)."""
    sd, r = {}, _rng()
    nc = cfg.num_classes
    _conv(sd, r, "union_func1", 256, 1024, 1)
    _conv(sd, r, "conv.0", 128, 2, 7)
    _bn(sd, r, "conv.2", 128)
    _conv(sd, r, "conv.4", 256, 128, 3)
    _bn(sd, r, "conv.6", 256)
    _lin(sd, r, "subj_fc", 512, 2048)
    _lin(sd, r, "obj_fc", 512, 2048)
    _lin(sd, r, "vr_fc", 512, 256 * 7 * 7)
    sd["obj_embed.weight"] = r.randn(nc, 200).astype(np.float32)
    sd["obj_embed2.weight"] = r.randn(nc, 200).astype(np.float32)
    for i in range(cfg.enc_layers):
        _enc_layer(sd, r, f"glocal_transformer.local_attention.layers.{i}", E, 2048)
    for i in range(cfg.dec_layers):
        _dec_layer(sd, r, f"glocal_transformer.global_attention.layers.{i}", E, 2048)
    sd["glocal_transformer.position_embedding.weight"] = (
        r.rand(2, E).astype(np.float32))
    if cfg.rel_mem_compute == "joint":
        _mha(sd, r, "glocal_transformer.mem_attention", E, bias=False)
    elif cfg.rel_mem_compute == "seperate":
        for rel in ("attention", "contacting", "spatial"):
            _mha(sd, r, f"glocal_transformer.mem_attention.{rel}", E, bias=False)
    if cfg.rel_mem_compute and cfg.selection != "manual":
        _lin(sd, r, "glocal_transformer.selector", 1, E)
    for prefix, n in (("a_rel_compress", C.NUM_ATTENTION),
                      ("s_rel_compress", C.NUM_SPATIAL),
                      ("c_rel_compress", C.NUM_CONTACTING)):
        if cfg.rel_head == "gmm":
            _gmm(sd, r, prefix, E, n, cfg.k)
        else:
            _lin(sd, r, prefix, n, E)

    # object classifier exists in every reference checkpoint, even predcls
    sd["object_classifier.obj_embed.weight"] = r.randn(nc - 1, 200).astype(np.float32)
    sd["object_classifier.positional_encoder.pe"] = r.randn(1, 600, OBJ_D).astype(np.float32)
    _bn(sd, r, "object_classifier.pos_embed.0", 4)
    _lin(sd, r, "object_classifier.pos_embed.1", 128, 4)
    _lin(sd, r, "object_classifier.intermediate.0", 1024, OBJ_D)
    _bn(sd, r, "object_classifier.intermediate.1", 1024)
    if cfg.tracking:
        for i in range(3):
            _enc_layer(sd, r, f"object_classifier.encoder_tran.layers.{i}",
                       OBJ_D, 1024)
    if cfg.obj_mem_compute:
        _mha(sd, r, "object_classifier.mem_attention",
             OBJ_D if cfg.tracking else 1024, bias=False)
    if cfg.obj_head == "gmm":
        _gmm(sd, r, "object_classifier.decoder_lin", 1024, nc, cfg.k)
    else:
        _lin(sd, r, "object_classifier.decoder_lin.0", nc, 1024)
    return sd


def _template_entry():
    from vidsgg.cli.data_source import make_synthetic_source
    from vidsgg.data.entry import EntryCapacity

    cap = EntryCapacity(max_frames=8, max_objs=24, max_pairs=16)
    return next(iter(make_synthetic_source(1, cap, seed=3, shuffle=False)()))[0]


CFGS = {
    # the published TEMPURA sgcls/sgdet recipe: gmm heads, K=4, tracking
    "sgcls-gmm-track-mem": TempuraConfig.for_mode(
        "sgcls", obj_head="gmm", rel_head="gmm", k=4, tracking=True,
        obj_mem_compute=True, rel_mem_compute="joint",
    ),
    "sgdet-gmm": TempuraConfig.for_mode("sgdet", obj_head="gmm",
                                        rel_head="gmm", k=4, tracking=True),
    # linear heads + seperate rel memory + automated gate
    "sgcls-linear-seperate": TempuraConfig.for_mode(
        "sgcls", obj_head="linear", rel_head="linear",
        rel_mem_compute="seperate", selection="automated",
    ),
    "predcls": TempuraConfig.for_mode("predcls", rel_head="gmm", k=6),
}


@pytest.mark.parametrize("name", sorted(CFGS))
def test_full_coverage_round_trip(name):
    """Every torch key consumed AND every Flax leaf written, exact shapes."""
    cfg = CFGS[name]
    sd = synth_state_dict(cfg)
    variables = convert_tempura_state_dict(sd, cfg, strict=True)
    validate_converted(variables, expected_tempura_shapes(cfg, _template_entry()))


def test_unknown_key_raises():
    cfg = CFGS["predcls"]
    sd = synth_state_dict(cfg)
    sd["glocal_transformer.unexpected.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(KeyError, match="not consumed"):
        convert_tempura_state_dict(sd, cfg, strict=True)


def test_vr_fc_permutation_matches_torch():
    """torch vr_fc flattens CHW; ours flattens HWC. The converted kernel must
    make both paths agree on the same 7x7x256 feature block."""
    torch = pytest.importorskip("torch")
    from vidsgg.models.convert_relation import _vr_fc_weight

    r = _rng()
    w = r.randn(512, 256 * 7 * 7).astype(np.float32)
    b = r.randn(512).astype(np.float32)
    x_chw = r.randn(5, 256, 7, 7).astype(np.float32)

    with torch.no_grad():
        lin = torch.nn.Linear(256 * 7 * 7, 512)
        lin.weight.copy_(torch.from_numpy(w))
        lin.bias.copy_(torch.from_numpy(b))
        ref = lin(torch.from_numpy(x_chw).reshape(5, -1)).numpy()

    x_hwc = np.transpose(x_chw, (0, 2, 3, 1))  # NHWC, as our conv stack emits
    ours = x_hwc.reshape(5, -1) @ _vr_fc_weight(w) + b
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_mha_split_matches_torch():
    """The in_proj split convention, checked against real torch MHA."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from vidsgg.models.attention import MultiheadAttention

    e, h, t = 16, 4, 6
    r = _rng()
    sd = {}
    _mha(sd, r, "m", e)
    x = r.randn(t, e).astype(np.float32)

    with torch.no_grad():
        mha = torch.nn.MultiheadAttention(e, h, dropout=0.0, batch_first=True)
        mha.in_proj_weight.copy_(torch.from_numpy(sd["m.in_proj_weight"]))
        mha.in_proj_bias.copy_(torch.from_numpy(sd["m.in_proj_bias"]))
        mha.out_proj.weight.copy_(torch.from_numpy(sd["m.out_proj.weight"]))
        mha.out_proj.bias.copy_(torch.from_numpy(sd["m.out_proj.bias"]))
        xt = torch.from_numpy(x)[None]
        ref = mha(xt, xt, xt, need_weights=False)[0][0].numpy()

    from vidsgg.models.convert_relation import _consume_mha

    params: dict = {}
    _consume_mha(sd, "m", params, [], set())
    mod = MultiheadAttention(e, h, 0.0)
    out = mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(x),
                    jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_gmm_fusion_matches_reference_math():
    """Fused k-major GMM params reproduce the per-component torch mixture
    (test phase: act(mu_k) weighted by softmax-ed pi, gmm_heads.py:42-74)."""
    import jax.numpy as jnp

    from vidsgg.models.convert_relation import _consume_gmm_head
    from vidsgg.models.gmm_head import GMMHead

    hid, c, k, n = 10, 5, 3, 4
    r = _rng()
    sd = {}
    _gmm(sd, r, "head", hid, c, k)
    x = r.randn(n, hid).astype(np.float32)

    # NumPy mixture straight from the per-component weights
    mus = np.stack([x @ sd[f"head.heads.mu_{i+1}.weight"].T
                    + sd[f"head.heads.mu_{i+1}.bias"] for i in range(k)], 1)
    pis = np.concatenate([x @ sd[f"head.heads.pi_{i+1}.weight"].T
                          + sd[f"head.heads.pi_{i+1}.bias"] for i in range(k)], 1)
    pis = np.exp(pis - pis.max(1, keepdims=True))
    pis /= pis.sum(1, keepdims=True)
    sig = 1.0 / (1.0 + np.exp(-mus))
    ref = (sig * pis[:, :, None]).sum(1)

    params: dict = {}
    _consume_gmm_head(sd, "head", params, [], k, set())
    head = GMMHead(c, k, rel_type="spatial")  # sigmoid activation
    out = head.apply({"params": params}, jnp.asarray(x), phase="test")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_memory_bank_conversion():
    r = _rng()
    banks = {"attention": r.randn(C.NUM_ATTENTION, E).astype(np.float32),
             "spatial": r.randn(C.NUM_SPATIAL, E).astype(np.float32),
             "contacting": r.randn(C.NUM_CONTACTING, E).astype(np.float32)}
    obj = r.randn(C.NUM_OBJ_CLASSES - 1, 1024).astype(np.float32)
    o, rel, active = convert_memory_banks(obj, banks)
    assert active and rel.shape == (C.NUM_PREDICATES, E)
    np.testing.assert_array_equal(rel[:3], banks["attention"])
    np.testing.assert_array_equal(rel[3:9], banks["spatial"])
    np.testing.assert_array_equal(rel[9:], banks["contacting"])
    np.testing.assert_array_equal(o, obj)
    # reference epoch-0 checkpoints carry empty lists
    o2, rel2, active2 = convert_memory_banks([], [])
    assert not active2 and o2 is None and rel2.shape == (C.NUM_PREDICATES, E)


def test_cli_end_to_end_serves_converted_torch_ckpt(tmp_path):
    """The product path: a reference ``.tar`` on disk -> convert_checkpoint
    CLI -> orbax -> tempura_test restores it and evaluates. Also asserts the
    converted weights actually LOAD (a GloVe row is bit-equal through the
    round trip) and the memory banks survive (the reference's own test
    script drops them)."""
    torch = pytest.importorskip("torch")
    import jax

    from vidsgg.cli import convert_checkpoint, tempura_test

    cfg = CFGS["predcls"]
    sd = synth_state_dict(cfg)
    r = _rng()
    banks = {"attention": r.randn(C.NUM_ATTENTION, E).astype(np.float32),
             "spatial": r.randn(C.NUM_SPATIAL, E).astype(np.float32),
             "contacting": r.randn(C.NUM_CONTACTING, E).astype(np.float32)}
    tar = tmp_path / "best_recall_model.tar"
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                "object_memory": [],
                "rel_memory": {k: torch.from_numpy(v) for k, v in banks.items()}},
               str(tar))

    out = tmp_path / "converted"
    state = convert_checkpoint.main([
        "--torch_ckpt", str(tar), "--out", str(out), "--mode", "predcls",
        "-rel_head", "gmm", "-K", "6",
    ])
    got = np.asarray(state.params["pair_features"]["obj_embed"])
    np.testing.assert_array_equal(got, sd["obj_embed.weight"])
    assert bool(state.mem_active)
    np.testing.assert_array_equal(np.asarray(state.rel_memory[:3]),
                                  banks["attention"])

    evs = tempura_test.main([
        "--mode", "predcls", "-rel_head", "gmm", "-K", "6",
        "--synthetic", "2", "--ckpt", str(out), "--ckpt_name", "converted",
    ])
    assert evs and all(np.isfinite(ev.recall_at(20)) for ev in evs)
