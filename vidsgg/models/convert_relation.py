"""torch -> Flax conversion for trained TEMPURA relation-model checkpoints.

The reference trains TEMPURA in torch and saves
``{"state_dict": model.state_dict(), "object_memory": ..., "rel_memory": ...}``
(TEMPURA_train.py:308-310). A user switching from the reference brings those
``.tar`` files with them; this module maps that state_dict layout onto
:class:`vidsgg.models.tempura.Tempura`'s variable tree so trained relation
weights serve on TPU unchanged. Layout cross-references:

* top-level modules — lib/tempura.py:460-510 (union_func1, conv Sequential,
  subj/obj/vr_fc, obj_embed/obj_embed2, glocal_transformer, *_rel_compress);
* object classifier — lib/tempura.py:51-112 (obj_embed, pos_embed Sequential,
  tracking encoder = torch.nn.TransformerEncoder, mem_attention/selector,
  intermediate Sequential, decoder_lin);
* STTran — tools/utils/transformer.py (encoder: self_attn/linear1/linear2/
  norm1/norm2; decoder: multihead2/linear1/linear2/norm3; position_embedding;
  mem_attention ModuleDict for 'seperate').

Dtype/layout conventions (same as :mod:`vidsgg.detector.convert`):

* torch Linear weight [O, I] -> flax kernel [I, O];
* torch Conv2d weight [O, I, kh, kw] -> flax kernel [kh, kw, I, O];
* torch BatchNorm weight/bias -> MaskedBatchNorm scale/bias, running stats ->
  batch_stats (num_batches_tracked dropped);
* torch MultiheadAttention in_proj_weight [3E, E] splits into q/k/v rows
  (torch packs q first — torch/nn/functional._in_projection_packed);
* ``vr_fc`` flattens CHW in torch but HWC here (tempura.py docstring), so its
  weight rows are permuted accordingly;
* the per-component GMM heads (``heads.mu_i/pi_i/var_i`` Linears,
  gmm_heads.py:8-13) fuse into this repo's single k*C Dense per quantity,
  k-major to match ``GMMHead``'s ``reshape(b, k, c)``.

Conversion is audited exactly like the detector converter: strict mode
raises on any unconsumed torch key, and ``validate_converted`` (shared)
asserts every Flax leaf is written with the right shape.
"""

from __future__ import annotations

import numpy as np

from vidsgg import constants as C
from vidsgg.detector.convert import _conv_w, _lin_w, _set, validate_converted

# buffers carrying no trained content
_IGNORABLE_SUFFIXES = ("num_batches_tracked",)


def _consume_linear(sd, prefix, params, path, consumed, weight_fn=_lin_w):
    w, b = f"{prefix}.weight", f"{prefix}.bias"
    if w in sd:
        _set(params, path + ["kernel"], weight_fn(sd[w]))
        consumed.add(w)
    if b in sd:
        _set(params, path + ["bias"], np.asarray(sd[b]))
        consumed.add(b)


def _consume_conv(sd, prefix, params, path, consumed):
    _consume_linear(sd, prefix, params, path, consumed, weight_fn=_conv_w)


def _consume_norm(sd, prefix, params, stats, path, consumed):
    """LayerNorm (params only) or BatchNorm (params + running stats)."""
    for leaf, dest, out in (
        ("weight", params, "scale"),
        ("bias", params, "bias"),
        ("running_mean", stats, "mean"),
        ("running_var", stats, "var"),
    ):
        key = f"{prefix}.{leaf}"
        if key in sd:
            _set(dest, path + [out], np.asarray(sd[key]))
            consumed.add(key)


def _consume_mha(sd, prefix, params, path, consumed):
    """torch nn.MultiheadAttention -> {q,k,v,out}_proj Denses. in_proj packs
    rows [q; k; v] (E each)."""
    ipw = f"{prefix}.in_proj_weight"
    if ipw in sd:
        w = np.asarray(sd[ipw])
        e = w.shape[1]
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(params, path + [name, "kernel"], _lin_w(w[i * e:(i + 1) * e]))
        consumed.add(ipw)
    ipb = f"{prefix}.in_proj_bias"
    if ipb in sd:
        b = np.asarray(sd[ipb])
        e = b.shape[0] // 3
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(params, path + [name, "bias"], b[i * e:(i + 1) * e])
        consumed.add(ipb)
    _consume_linear(sd, f"{prefix}.out_proj", params, path + ["out_proj"],
                    consumed)


def _consume_torch_encoder_layer(sd, prefix, params, path, consumed):
    """torch.nn.TransformerEncoderLayer / the reference's clone of it
    (transformer.py:5-30) -> this repo's post-norm EncoderLayer auto-names."""
    _consume_mha(sd, f"{prefix}.self_attn", params,
                 path + ["MultiheadAttention_0"], consumed)
    _consume_linear(sd, f"{prefix}.linear1", params, path + ["Dense_0"], consumed)
    _consume_linear(sd, f"{prefix}.linear2", params, path + ["Dense_1"], consumed)
    _consume_norm(sd, f"{prefix}.norm1", params, {}, path + ["LayerNorm_0"], consumed)
    _consume_norm(sd, f"{prefix}.norm2", params, {}, path + ["LayerNorm_1"], consumed)


def _consume_decoder_layer(sd, prefix, params, path, consumed):
    """transformer.py:33-58: multihead2 + linear1/linear2 + norm3 (only)."""
    _consume_mha(sd, f"{prefix}.multihead2", params,
                 path + ["MultiheadAttention_0"], consumed)
    _consume_linear(sd, f"{prefix}.linear1", params, path + ["Dense_0"], consumed)
    _consume_linear(sd, f"{prefix}.linear2", params, path + ["Dense_1"], consumed)
    _consume_norm(sd, f"{prefix}.norm3", params, {}, path + ["LayerNorm_0"], consumed)


def _consume_gmm_head(sd, prefix, params, path, k, consumed):
    """heads.{mu,pi,var}_{1..k} Linears -> fused mu/pi/var Denses, k-major
    column blocks (GMMHead reshapes its Dense output to [B, k, C])."""
    for quant in ("mu", "var"):
        ws = [np.asarray(sd[f"{prefix}.heads.{quant}_{i + 1}.weight"]) for i in range(k)]
        bs = [np.asarray(sd[f"{prefix}.heads.{quant}_{i + 1}.bias"]) for i in range(k)]
        _set(params, path + [quant, "kernel"],
             np.concatenate([_lin_w(w) for w in ws], axis=1))
        _set(params, path + [quant, "bias"], np.concatenate(bs))
        for i in range(k):
            consumed.add(f"{prefix}.heads.{quant}_{i + 1}.weight")
            consumed.add(f"{prefix}.heads.{quant}_{i + 1}.bias")
    ws = [np.asarray(sd[f"{prefix}.heads.pi_{i + 1}.weight"]) for i in range(k)]
    bs = [np.asarray(sd[f"{prefix}.heads.pi_{i + 1}.bias"]) for i in range(k)]
    _set(params, path + ["pi", "kernel"], np.concatenate([_lin_w(w) for w in ws], axis=1))
    _set(params, path + ["pi", "bias"], np.concatenate(bs))
    for i in range(k):
        consumed.add(f"{prefix}.heads.pi_{i + 1}.weight")
        consumed.add(f"{prefix}.heads.pi_{i + 1}.bias")


def _vr_fc_weight(w):
    """torch vr_fc consumes a CHW flatten of [256, 7, 7]; this repo flattens
    HWC (NHWC conv stack, tempura.py:109-110). Permute the input axis."""
    w = np.asarray(w)  # [512, 256*7*7]
    o = w.shape[0]
    return w.reshape(o, 256, 7, 7).transpose(2, 3, 1, 0).reshape(7 * 7 * 256, o)


def _consume_memory(sd, prefix, params, path, consumed):
    """mem_attention (+ optional selector) -> the hallucinator submodule.
    Handles both the joint single MHA and the 'seperate' ModuleDict form."""
    if f"{prefix}.mem_attention.in_proj_weight" in sd:
        _consume_mha(sd, f"{prefix}.mem_attention", params,
                     path + ["mem_attention"], consumed)
    else:  # ModuleDict (transformer.py:124-127)
        for rel in ("attention", "contacting", "spatial"):
            if f"{prefix}.mem_attention.{rel}.in_proj_weight" in sd:
                _consume_mha(sd, f"{prefix}.mem_attention.{rel}", params,
                             path + [f"mem_attention_{rel}"], consumed)
    _consume_linear(sd, f"{prefix}.selector", params, path + ["selector"],
                    consumed)


def consume_object_classifier(sd, params, stats, consumed, *, tracking,
                              obj_mem_compute, obj_head, k,
                              max_pe_len=None):
    """The OSPU object classifier's torch layout is shared by TEMPURA
    (lib/tempura.py:51-112) and TEAT-GT (tools/utils/object_classifier.py —
    same attribute names/shapes); both converters consume it through here.

    The sinusoidal ``positional_encoder.pe`` buffer is carried over verbatim
    (into the ``pe_table`` batch_stats variable): the reference builds it in
    float32 torch ops whose rounding numpy cannot reproduce bitwise, so
    recomputing it would put converted checkpoints ~1e-7 off the reference."""
    oc = ["object_classifier"]
    pe_key = "object_classifier.positional_encoder.pe"
    if tracking and pe_key in sd:
        pe = np.asarray(sd[pe_key])[0]  # [1, max_len, D] buffer
        if max_pe_len is not None:
            if pe.shape[0] < max_pe_len:
                raise ValueError(
                    f"torch pe buffer has {pe.shape[0]} positions, model "
                    f"needs max_pe_len={max_pe_len}")
            pe = pe[:max_pe_len]
        _set(stats, oc + ["pe_table"], pe)
        consumed.add(pe_key)
    key = "object_classifier.obj_embed.weight"
    if key in sd:
        _set(params, oc + ["obj_embed"], sd[key])
        consumed.add(key)
    _consume_norm(sd, "object_classifier.pos_embed.0", params, stats,
                  oc + ["pos_bn"], consumed)
    _consume_linear(sd, "object_classifier.pos_embed.1", params,
                    oc + ["pos_fc"], consumed)
    _consume_linear(sd, "object_classifier.intermediate.0", params,
                    oc + ["inter_fc"], consumed)
    _consume_norm(sd, "object_classifier.intermediate.1", params, stats,
                  oc + ["inter_bn"], consumed)
    if tracking:
        i = 0
        while f"object_classifier.encoder_tran.layers.{i}.self_attn.in_proj_weight" in sd:
            _consume_torch_encoder_layer(
                sd, f"object_classifier.encoder_tran.layers.{i}", params,
                oc + [f"track_{i}"], consumed)
            i += 1
    if obj_mem_compute:
        _consume_memory(sd, "object_classifier", params, oc + ["memory"],
                        consumed)
    if obj_head == "gmm":
        _consume_gmm_head(sd, "object_classifier.decoder_lin", params,
                          oc + ["decoder"], k, consumed)
    else:
        _consume_linear(sd, "object_classifier.decoder_lin.0", params,
                        oc + ["decoder"], consumed)


def _consume_sttran(sd, prefix, params, path, consumed, *, enc_layers,
                    dec_layers, rel_mem_compute):
    """The STTran block (tools/utils/transformer.py:104-141) under a torch
    key prefix (``glocal_transformer`` inside TEMPURA) -> this repo's
    :class:`vidsgg.models.sttran.STTran` auto-names."""
    for i in range(enc_layers):
        _consume_torch_encoder_layer(
            sd, f"{prefix}.local_attention.layers.{i}", params,
            path + [f"enc_{i}"], consumed)
    for i in range(dec_layers):
        _consume_decoder_layer(
            sd, f"{prefix}.global_attention.layers.{i}", params,
            path + [f"dec_{i}"], consumed)
    key = f"{prefix}.position_embedding.weight"
    if key in sd:
        _set(params, path + ["position_embedding"], sd[key])
        consumed.add(key)
    if rel_mem_compute:
        _consume_memory(sd, prefix, params, path + ["memory"], consumed)


def convert_sttran_state_dict(state_dict: dict, *, enc_layers: int,
                              dec_layers: int, rel_mem_compute,
                              strict: bool = True) -> dict:
    """Map a bare reference ``transformer`` module's ``state_dict()``
    (tools/utils/transformer.py:104-141, i.e. the object TEMPURA names
    ``glocal_transformer``) onto :class:`vidsgg.models.sttran.STTran` params.

    Used by the torch-oracle parity tests, which instantiate the reference's
    own module and assert forward agreement through this mapping."""
    sd = {f"m.{k}": np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    consumed: set = set()
    for key in sd:
        if key.endswith(_IGNORABLE_SUFFIXES):
            consumed.add(key)
    _consume_sttran(sd, "m", params, [], consumed, enc_layers=enc_layers,
                    dec_layers=dec_layers, rel_mem_compute=rel_mem_compute)
    leftovers = sorted(set(sd) - consumed)
    if leftovers and strict:
        raise KeyError(f"unconsumed torch keys: {leftovers[:10]}")
    return params


def convert_gmm_head_state_dict(state_dict: dict, k: int) -> dict:
    """Map a bare reference ``GMM_head`` ``state_dict()``
    (tools/utils/gmm_heads.py:3-18) onto :class:`vidsgg.models.gmm_head.
    GMMHead` params (fused k-major mu/pi/var Denses)."""
    sd = {f"m.{k_}": np.asarray(v) for k_, v in state_dict.items()}
    params: dict = {}
    consumed: set = set()
    _consume_gmm_head(sd, "m", params, [], k, consumed)
    leftovers = sorted(set(sd) - consumed)
    if leftovers:
        raise KeyError(f"unconsumed torch keys: {leftovers[:10]}")
    return params


def convert_tempura_state_dict(state_dict: dict, cfg, strict: bool = True) -> dict:
    """torch TEMPURA ``state_dict`` -> ``{'params': ..., 'batch_stats': ...}``
    for :class:`vidsgg.models.tempura.Tempura` built from ``cfg``.

    ``cfg`` decides which branches exist (mode, heads, memory, tracking); in
    predcls the reference still *constructs* its object classifier but never
    runs it (lib/tempura.py:245-247), so its keys are consumed-and-dropped.
    With ``strict``, any other unconsumed key raises (layout drift would
    silently discard trained weights).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    consumed: set = set()

    for key in sd:
        if key.endswith(_IGNORABLE_SUFFIXES):
            consumed.add(key)

    # ---- pair features (lib/tempura.py:465-492) ----
    pf = ["pair_features"]
    _consume_conv(sd, "union_func1", params, pf + ["union_func1"], consumed)
    _consume_conv(sd, "conv.0", params, pf + ["mask_conv1"], consumed)
    _consume_norm(sd, "conv.2", params, stats, pf + ["mask_bn1"], consumed)
    _consume_conv(sd, "conv.4", params, pf + ["mask_conv2"], consumed)
    _consume_norm(sd, "conv.6", params, stats, pf + ["mask_bn2"], consumed)
    _consume_linear(sd, "subj_fc", params, pf + ["subj_fc"], consumed)
    _consume_linear(sd, "obj_fc", params, pf + ["obj_fc"], consumed)
    _consume_linear(sd, "vr_fc", params, pf + ["vr_fc"], consumed,
                    weight_fn=_vr_fc_weight)
    for name in ("obj_embed", "obj_embed2"):
        key = f"{name}.weight"
        if key in sd:
            _set(params, pf + [name], sd[key])
            consumed.add(key)

    # ---- STTran (tools/utils/transformer.py via glocal_transformer) ----
    _consume_sttran(sd, "glocal_transformer", params, ["glocal_transformer"],
                    consumed, enc_layers=cfg.enc_layers,
                    dec_layers=cfg.dec_layers,
                    rel_mem_compute=cfg.rel_mem_compute)

    # ---- relation heads ----
    for torch_name, ours in (("a_rel_compress", "a_rel"),
                             ("s_rel_compress", "s_rel"),
                             ("c_rel_compress", "c_rel")):
        if cfg.rel_head == "gmm":
            _consume_gmm_head(sd, torch_name, params, [ours], cfg.k, consumed)
        else:
            _consume_linear(sd, torch_name, params, [ours], consumed)

    # ---- object classifier (lib/tempura.py:51-112) ----
    if cfg.mode == "predcls":
        # constructed but never run by the reference; our predcls model has
        # no such params — consume and drop
        consumed.update(k for k in sd if k.startswith("object_classifier."))
    else:
        consume_object_classifier(
            sd, params, stats, consumed, tracking=cfg.tracking,
            obj_mem_compute=cfg.obj_mem_compute, obj_head=cfg.obj_head,
            k=cfg.k, max_pe_len=600 if cfg.mode == "sgdet" else 400,
        )

    leftovers = sorted(set(sd) - consumed)
    if leftovers and strict:
        raise KeyError(
            f"{len(leftovers)} torch keys not consumed by the converter "
            f"(layout drift?): {leftovers[:10]}{'...' if len(leftovers) > 10 else ''}"
        )
    return {"params": params, "batch_stats": stats}


def convert_memory_banks(object_memory, rel_memory):
    """Reference checkpoint memory banks -> (obj_memory [C-1, D],
    rel_memory [26, 1936], mem_active). The joint bank row order is
    [attention; spatial; contacting] (debias/memory.py bank layout; the
    dict-insertion order of TEMPURA_train.py:362-364). Empty reference banks
    (epoch 0, TEMPURA_train.py:305-307) -> zeros + mem_active False."""
    active = False
    if rel_memory is not None and len(rel_memory) != 0:
        rel = np.concatenate([
            np.asarray(rel_memory[k], np.float32)
            for k in ("attention", "spatial", "contacting")
        ])
        active = True
    else:
        rel = np.zeros((C.NUM_PREDICATES, 1936), np.float32)
    obj = (np.asarray(object_memory, np.float32)
           if object_memory is not None and len(object_memory) != 0 else None)
    return obj, rel, active


def expected_tempura_shapes(cfg, entry_template):
    """Shape tree of the Tempura variables without allocating."""
    import jax
    import jax.numpy as jnp

    from vidsgg.models.tempura import Tempura
    from vidsgg.train.state import obj_memory_dim

    model = Tempura(cfg)
    if cfg.rel_mem_compute == "seperate":
        # the 'seperate' hallucinator attends per-bank (sttran.py:100-105)
        rel_memory = {
            "attention": jnp.zeros((C.NUM_ATTENTION, 1936)),
            "spatial": jnp.zeros((C.NUM_SPATIAL, 1936)),
            "contacting": jnp.zeros((C.NUM_CONTACTING, 1936)),
        }
    else:
        rel_memory = jnp.zeros((C.NUM_PREDICATES, 1936))
    obj_memory = jnp.zeros((cfg.num_classes - 1, obj_memory_dim(cfg)))

    def init(rng):
        return model.init(
            {"params": rng, "dropout": rng, "gmm": rng},
            entry_template, phase="train", unc=False, rel_memory=rel_memory,
            obj_memory=obj_memory, mem_active=jnp.asarray(False),
        )

    return jax.eval_shape(init, jax.random.PRNGKey(0))


def load_tempura_checkpoint(path: str, cfg, entry_template=None,
                            validate: bool = True):
    """Load a reference ``*_model.tar`` (torch) and convert it.

    Returns ``(variables, obj_memory, rel_memory, mem_active)`` where
    ``variables`` is ``{'params', 'batch_stats'}``. With ``validate`` (needs
    ``entry_template``), asserts exact coverage of the model's variable tree.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    variables = convert_tempura_state_dict(sd, cfg, strict=True)
    if validate and entry_template is not None:
        validate_converted(variables, expected_tempura_shapes(cfg, entry_template))
    obj, rel, active = convert_memory_banks(
        ckpt.get("object_memory"), ckpt.get("rel_memory"))
    return variables, obj, rel, active
