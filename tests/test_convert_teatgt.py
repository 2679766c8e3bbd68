"""Trained TEAT-GT checkpoint conversion (models/convert_teatgt.py).

Strategy mirrors tests/test_convert_relation.py: synthesize a FULL
torch-layout TEAT-GT state_dict (lib/teatgt.py:44-94 + tools/TokenGT),
including the duplicate registrations torch produces (TokenGT_model.encoder
mirrors TokenGT_encoder; gap*.gate_nn mirror the gate Linears), convert,
and assert the audit holds both ways. Numeric spot-checks pin the risky
conventions: the prenorm layer mapping (self_attn_layer_norm -> LayerNorm_0,
per-layer final_layer_norm -> LayerNorm_1, fc1/fc2 -> Dense_0/Dense_1,
fairseq separate q/k/v/out projections) against a torch transcription of
tokengt_graph_encoder_layer.py:169-191, and the LM head (transform -> gelu
-> LayerNorm -> bias-free embed_out + learned bias, models/tokengt.py:108-120).
"""

import numpy as np
import pytest

from vidsgg.models.convert_teatgt import (
    convert_teatgt_state_dict,
    expected_teatgt_shapes,
    validate_converted_teatgt,
)
from vidsgg.models.teatgt import TeatGTConfig

D = 768     # encoder dim
ATOM = 1168
NC = 37
OBJ_D = 2048 + 200 + 128


def _rng():
    return np.random.RandomState(0)


def _lin(sd, r, prefix, o, i, bias=True):
    sd[f"{prefix}.weight"] = r.randn(o, i).astype(np.float32) * 0.05
    if bias:
        sd[f"{prefix}.bias"] = r.randn(o).astype(np.float32) * 0.05


def _ln(sd, r, prefix, c):
    sd[f"{prefix}.weight"] = r.rand(c).astype(np.float32) + 0.5
    sd[f"{prefix}.bias"] = r.randn(c).astype(np.float32) * 0.05


def _bn(sd, r, prefix, c):
    _ln(sd, r, prefix, c)
    sd[f"{prefix}.running_mean"] = r.randn(c).astype(np.float32)
    sd[f"{prefix}.running_var"] = r.rand(c).astype(np.float32) + 0.5
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(7)


def _fairseq_mha(sd, r, prefix, e):
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        _lin(sd, r, f"{prefix}.{proj}", e, e)


def _tokengt_layer(sd, r, prefix, e, ff):
    _fairseq_mha(sd, r, f"{prefix}.self_attn", e)
    _ln(sd, r, f"{prefix}.self_attn_layer_norm", e)
    _lin(sd, r, f"{prefix}.feedforward.fc1", ff, e)
    _lin(sd, r, f"{prefix}.feedforward.fc2", e, ff)
    _ln(sd, r, f"{prefix}.final_layer_norm", e)


def _torch_mha(sd, r, prefix, e, bias=True):
    sd[f"{prefix}.in_proj_weight"] = r.randn(3 * e, e).astype(np.float32) * 0.05
    if bias:
        sd[f"{prefix}.in_proj_bias"] = r.randn(3 * e).astype(np.float32) * 0.05
    _lin(sd, r, f"{prefix}.out_proj", e, e, bias=bias)


def synth_state_dict(cfg: TeatGTConfig) -> dict:
    """Full reference TEAT-GT state_dict for ``cfg`` (lib/teatgt.py:44-94)."""
    sd, r = {}, _rng()
    lap = 2 * cfg.lap_node_id_k

    _lin(sd, r, "subj_fc", 968, 2048)
    _lin(sd, r, "obj_fc", 968, 2048)
    sd["node_label_tokenizer.weight"] = r.randn(NC, 200).astype(np.float32)

    # object classifier exists in every checkpoint, even predcls
    sd["object_classifier.obj_embed.weight"] = r.randn(NC - 1, 200).astype(np.float32)
    sd["object_classifier.positional_encoder.pe"] = r.randn(1, 600, OBJ_D).astype(np.float32)
    _bn(sd, r, "object_classifier.pos_embed.0", 4)
    _lin(sd, r, "object_classifier.pos_embed.1", 128, 4)
    _lin(sd, r, "object_classifier.intermediate.0", 1024, OBJ_D)
    _bn(sd, r, "object_classifier.intermediate.1", 1024)
    if cfg.tracking:
        for i in range(3):
            # OSPU tracking encoder = torch.nn.TransformerEncoder (packed MHA)
            _torch_mha(sd, r, f"object_classifier.encoder_tran.layers.{i}.self_attn", OBJ_D)
            _lin(sd, r, f"object_classifier.encoder_tran.layers.{i}.linear1", 1024, OBJ_D)
            _lin(sd, r, f"object_classifier.encoder_tran.layers.{i}.linear2", OBJ_D, 1024)
            _ln(sd, r, f"object_classifier.encoder_tran.layers.{i}.norm1", OBJ_D)
            _ln(sd, r, f"object_classifier.encoder_tran.layers.{i}.norm2", OBJ_D)
    _lin(sd, r, "object_classifier.decoder_lin.0", NC, 1024)

    # TokenGT (canonical tree)
    gf = "TokenGT_encoder.graph_encoder.graph_feature"
    _lin(sd, r, f"{gf}.atom_encoder", D, ATOM)
    sd[f"{gf}.temp_encoder.weight"] = r.randn(100, D).astype(np.float32) * 0.05
    sd[f"{gf}.edge_encoder.weight"] = r.randn(5, D).astype(np.float32) * 0.05
    sd[f"{gf}.order_encoder.weight"] = r.randn(3, D).astype(np.float32) * 0.05
    sd[f"{gf}.graph_token.weight"] = r.randn(1, D).astype(np.float32) * 0.05
    sd[f"{gf}.null_token.weight"] = r.randn(1, D).astype(np.float32) * 0.05
    _lin(sd, r, f"{gf}.lap_encoder", D, lap, bias=False)
    for i in range(cfg.encoder_layers):
        _tokengt_layer(sd, r, f"TokenGT_encoder.graph_encoder.layers.{i}",
                       D, 768)
    # prenorm top-level LN: created but never applied (the quirk)
    _ln(sd, r, "TokenGT_encoder.graph_encoder.final_layer_norm", D)
    _lin(sd, r, "TokenGT_encoder.masked_lm_pooler", D, D)  # unused in forward
    _lin(sd, r, "TokenGT_encoder.lm_head_transform_weight", D, D)
    _ln(sd, r, "TokenGT_encoder.layer_norm", D)
    sd["TokenGT_encoder.lm_output_learned_bias"] = r.randn(26).astype(np.float32) * 0.05
    _lin(sd, r, "TokenGT_encoder.embed_out", 26, D, bias=False)

    # regularizer GraphTransformers (graph_transformer_pytorch) — dropped
    for gat, dim in (("gat", 10), ("gat_semantic", D)):
        for i in range(4):
            _lin(sd, r, f"{gat}.layers.{i}.0.0.fn.fn.to_q", 512, dim, bias=False)
            _lin(sd, r, f"{gat}.layers.{i}.0.0.fn.fn.to_out", dim, 512)
            _lin(sd, r, f"{gat}.layers.{i}.0.1.proj", 1, 3 * dim, bias=False)

    # pooling gates
    _lin(sd, r, "gate_nn", 1, 10)
    _lin(sd, r, "gate_sem_nn", 1, D)
    _lin(sd, r, "gate_gru_nn", 1, D)

    # torch registers shared tensors twice: TokenGT_model wraps the same
    # encoder; gap* wrap the same gate Linears
    for k in [k for k in sd if k.startswith("TokenGT_encoder.")]:
        sd["TokenGT_model.encoder." + k[len("TokenGT_encoder."):]] = sd[k]
    for gap, gate in (("gap", "gate_nn"), ("gap_sem", "gate_sem_nn"),
                      ("gap_gru", "gate_gru_nn")):
        for leaf in ("weight", "bias"):
            sd[f"{gap}.gate_nn.{leaf}"] = sd[f"{gate}.{leaf}"]
    return sd


def _template_entry():
    from vidsgg.cli.data_source import make_synthetic_source
    from vidsgg.data.entry import EntryCapacity

    cap = EntryCapacity(max_frames=8, max_objs=24, max_pairs=16)
    return next(iter(make_synthetic_source(1, cap, seed=3, shuffle=False)()))[0]


CFGS = {
    # the published TEAT-GT recipe: predcls, 12 layers x 32 heads
    "predcls": TeatGTConfig.for_mode("predcls"),
    # mode-derived overrides: 6 x 16 + tracking (teatgt_config.py:11-14)
    "sgcls": TeatGTConfig.for_mode("sgcls"),
    # cons losses on: regularizer params exist, stay at fresh init
    "predcls-cons": TeatGTConfig.for_mode(
        "predcls", use_cons_str_loss=True, use_cons_sem_loss=True),
}


@pytest.mark.parametrize("name", sorted(CFGS))
def test_full_coverage_round_trip(name):
    """Every torch key consumed AND every (non-regularizer) Flax leaf
    written, exact shapes."""
    cfg = CFGS[name]
    sd = synth_state_dict(cfg)
    variables = convert_teatgt_state_dict(sd, cfg, strict=True)
    validate_converted_teatgt(
        variables, expected_teatgt_shapes(cfg, _template_entry()))


def test_unknown_key_raises():
    cfg = CFGS["predcls"]
    sd = synth_state_dict(cfg)
    sd["TokenGT_encoder.graph_encoder.unexpected.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(KeyError, match="not consumed"):
        convert_teatgt_state_dict(sd, cfg, strict=True)


def test_layer_mapping_matches_torch():
    """One converted TokenGT layer == a torch transcription of the prenorm
    reference layer (tokengt_graph_encoder_layer.py:169-191): LN -> MHA ->
    residual, LN -> fc1 -> gelu -> fc2 -> residual."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    import jax.numpy as jnp

    from vidsgg.models.tokengt import TokenGTLayer

    e, h, ff, t = 32, 4, 48, 7
    r = _rng()
    sd = {}
    _tokengt_layer(sd, r, "L", e, ff)
    x = r.randn(t, e).astype(np.float32)

    def tln(v, prefix):
        return F.layer_norm(v, (e,), torch.from_numpy(sd[f"{prefix}.weight"]),
                            torch.from_numpy(sd[f"{prefix}.bias"]))

    def tlin(v, prefix):
        return F.linear(v, torch.from_numpy(sd[f"{prefix}.weight"]),
                        torch.from_numpy(sd[f"{prefix}.bias"]))

    with torch.no_grad():
        xt = torch.from_numpy(x)
        hn = tln(xt, "L.self_attn_layer_norm")
        q = tlin(hn, "L.self_attn.q_proj").reshape(t, h, e // h).transpose(0, 1)
        k = tlin(hn, "L.self_attn.k_proj").reshape(t, h, e // h).transpose(0, 1)
        v = tlin(hn, "L.self_attn.v_proj").reshape(t, h, e // h).transpose(0, 1)
        w = torch.softmax(q @ k.transpose(-1, -2) / (e // h) ** 0.5, dim=-1)
        att = (w @ v).transpose(0, 1).reshape(t, e)
        xt = xt + tlin(att, "L.self_attn.out_proj")
        hn = tln(xt, "L.final_layer_norm")
        hn = tlin(F.gelu(tlin(hn, "L.feedforward.fc1")), "L.feedforward.fc2")
        ref = (xt + hn).numpy()

    params, consumed = {}, set()
    from vidsgg.models.convert_teatgt import _consume_linear, _consume_norm

    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        _consume_linear(sd, f"L.self_attn.{proj}", params,
                        ["MultiheadAttention_0", proj], consumed)
    _consume_norm(sd, "L.self_attn_layer_norm", params, {}, ["LayerNorm_0"], consumed)
    _consume_norm(sd, "L.final_layer_norm", params, {}, ["LayerNorm_1"], consumed)
    _consume_linear(sd, "L.feedforward.fc1", params, ["Dense_0"], consumed)
    _consume_linear(sd, "L.feedforward.fc2", params, ["Dense_1"], consumed)

    layer = TokenGTLayer(e, h, ff, dropout=0.0, attention_dropout=0.0,
                         activation_dropout=0.0)
    mask = jnp.ones((1, t, t), bool)
    out = layer.apply({"params": params}, jnp.asarray(x)[None], mask)
    np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=2e-4, atol=2e-5)


def test_lm_head_mapping_matches_torch():
    """transform -> gelu -> LayerNorm -> bias-free embed_out + learned bias
    (models/tokengt.py:108-120)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    r = _rng()
    sd = {}
    _lin(sd, r, "TokenGT_encoder.lm_head_transform_weight", D, D)
    _ln(sd, r, "TokenGT_encoder.layer_norm", D)
    sd["TokenGT_encoder.lm_output_learned_bias"] = r.randn(26).astype(np.float32)
    _lin(sd, r, "TokenGT_encoder.embed_out", 26, D, bias=False)
    x = r.randn(4, D).astype(np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x)
        hh = F.linear(xt, torch.from_numpy(sd["TokenGT_encoder.lm_head_transform_weight.weight"]),
                      torch.from_numpy(sd["TokenGT_encoder.lm_head_transform_weight.bias"]))
        hh = F.layer_norm(F.gelu(hh), (D,),
                          torch.from_numpy(sd["TokenGT_encoder.layer_norm.weight"]),
                          torch.from_numpy(sd["TokenGT_encoder.layer_norm.bias"]))
        ref = (F.linear(hh, torch.from_numpy(sd["TokenGT_encoder.embed_out.weight"]))
               + torch.from_numpy(sd["TokenGT_encoder.lm_output_learned_bias"])).numpy()

    from vidsgg.detector.convert import _lin_w

    w1 = _lin_w(sd["TokenGT_encoder.lm_head_transform_weight.weight"])
    b1 = sd["TokenGT_encoder.lm_head_transform_weight.bias"]

    # exact (non-approximate) gelu, matching nn.gelu(approximate=False)
    import math

    def gelu_np(v):
        return 0.5 * v * (1.0 + np.vectorize(math.erf)(v / np.sqrt(2.0)))

    hh = gelu_np(x @ w1 + b1)
    mu, var = hh.mean(-1, keepdims=True), hh.var(-1, keepdims=True)
    hh = (hh - mu) / np.sqrt(var + 1e-5)
    hh = hh * sd["TokenGT_encoder.layer_norm.weight"] + sd["TokenGT_encoder.layer_norm.bias"]
    ours = hh @ _lin_w(sd["TokenGT_encoder.embed_out.weight"]) + sd["TokenGT_encoder.lm_output_learned_bias"]
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_cli_end_to_end_serves_converted_teatgt_ckpt(tmp_path):
    """Product path: a reference TEAT-GT ``.tar`` on disk ->
    convert_checkpoint --model teatgt -> orbax -> teatgt_test restores and
    evaluates. Asserts a GloVe-row bit-equality through the round trip."""
    torch = pytest.importorskip("torch")

    from vidsgg.cli import convert_checkpoint, teatgt_test

    cfg = CFGS["predcls"]
    sd = synth_state_dict(cfg)
    tar = tmp_path / "best_Mrecall_model.tar"
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
        str(tar))

    out = tmp_path / "converted"
    state = convert_checkpoint.main([
        "--model", "teatgt", "--torch_ckpt", str(tar), "--out", str(out),
        "--mode", "predcls",
    ])
    got = np.asarray(state.params["node_label_tokenizer"])
    np.testing.assert_array_equal(got, sd["node_label_tokenizer.weight"])
    got_l0 = np.asarray(
        state.params["tokengt"]["layer_0"]["Dense_0"]["bias"])
    np.testing.assert_array_equal(
        got_l0, sd["TokenGT_encoder.graph_encoder.layers.0.feedforward.fc1.bias"])

    evs = teatgt_test.main([
        "--mode", "predcls", "--synthetic", "2",
        "--ckpt", str(out), "--ckpt_name", "converted",
    ])
    assert evs and all(np.isfinite(ev.recall_at(20)) for ev in evs)
