"""torch -> Flax conversion for trained TEAT-GT checkpoints.

The reference trains TEAT-GT in torch and saves ``{"state_dict":
model.state_dict()}`` (TEATGT_train.py:273-289 — no memory banks; TEAT-GT
has none). This maps that layout onto :class:`vidsgg.models.teatgt.TeatGT`
so reference-trained TEAT-GT weights serve on TPU unchanged. Layout
cross-references:

* top level — lib/teatgt.py:44-94: object_classifier (the same OSPU layout
  as TEMPURA's, via tools/utils/object_classifier.py), subj_fc/obj_fc
  (2048->968), node_label_tokenizer Embedding, TokenGT_encoder +
  TokenGT_model (the *same* encoder registered twice — TokenGTModel wraps
  the TokenGT_encoder instance, so every ``TokenGT_encoder.*`` tensor
  reappears as ``TokenGT_model.encoder.*``), gat/gat_semantic
  (graph_transformer_pytorch), gate_nn/gate_sem_nn/gate_gru_nn Linears
  (each re-registered under gap*/gap_sem/gap_gru as ``gap*.gate_nn.*``);
* tokenizer — tools/TokenGT/tokengt/modules/tokenizer.py:43-70:
  atom_encoder Linear(1168->768), temp/edge/order/graph/null embeddings,
  lap_encoder Linear(2k->768, bias-free);
* encoder layers — tokengt_graph_encoder_layer.py:61-95,169-191 (prenorm):
  self_attn (fairseq MultiheadAttention: separate q/k/v/out_proj Linears,
  NOT torch.nn.MultiheadAttention's packed in_proj), self_attn_layer_norm,
  feedforward.fc1/fc2, per-layer final_layer_norm;
* LM head — tokengt/models/tokengt.py:86-95,108-120: lm_head_transform_weight
  + layer_norm + bias-free embed_out + lm_output_learned_bias.

Consumed-and-dropped (explicitly, with rationale — strict mode still raises
on anything *unknown*):

* ``TokenGT_encoder.masked_lm_pooler`` — constructed but never applied in
  forward (models/tokengt.py:86 vs :100-135);
* ``TokenGT_encoder.graph_encoder.final_layer_norm`` — the prenorm
  encoder's top-level LN, created (tokengt_graph_encoder.py:137-138) but
  never applied in forward (:268-327): the documented quirk this repo's
  TokenGT reproduces by *also* not applying it, so the weights are inert;
* ``gat.* / gat_semantic.*`` — the temporal-consistency regularizer's two
  GraphTransformers. That subsystem only produces a train-time loss signal
  (lib/teatgt.py:285-334, never on the serving path) and this repo's
  :class:`~vidsgg.models.graph_transformer.GraphTransformer` is an
  intentional architectural re-design (batched, learned PE instead of
  rotary), so the pip package's weights have no faithful destination. When
  the target config enables the cons losses, those params stay at fresh
  init (fine: they parameterize a regularizer, not the model output).

Duplicate registrations (``TokenGT_model.encoder.*``, ``gap*.gate_nn.*``)
are consumed by suffix-matching their canonical twin.
"""

from __future__ import annotations

import numpy as np

from vidsgg.detector.convert import _set, validate_converted
from vidsgg.models.convert_relation import (
    _consume_linear,
    _consume_norm,
    consume_object_classifier,
)

# buffers carrying no trained content
_IGNORABLE_SUFFIXES = ("num_batches_tracked",)

# constructed-but-inert torch submodules (rationale in module docstring)
_DROPPED_PREFIXES = (
    "gat.",
    "gat_semantic.",
    "TokenGT_encoder.masked_lm_pooler.",
    "TokenGT_encoder.graph_encoder.final_layer_norm.",
)

# (duplicate prefix, canonical prefix): same tensor registered twice
_TWIN_PREFIXES = (
    ("TokenGT_model.encoder.", "TokenGT_encoder."),
    ("gap.gate_nn.", "gate_nn."),
    ("gap_sem.gate_nn.", "gate_sem_nn."),
    ("gap_gru.gate_nn.", "gate_gru_nn."),
)


def _consume_embedding(sd, key, params, path, consumed):
    if key in sd:
        _set(params, path, np.asarray(sd[key]))
        consumed.add(key)


def convert_teatgt_state_dict(state_dict: dict, cfg, strict: bool = True) -> dict:
    """torch TEAT-GT ``state_dict`` -> ``{'params': ..., 'batch_stats': ...}``
    for :class:`vidsgg.models.teatgt.TeatGT` built from ``cfg``.

    ``cfg`` is a :class:`~vidsgg.models.teatgt.TeatGTConfig`; its mode picks
    the encoder geometry (predcls: 12 layers x 32 heads; sgcls/sgdet:
    6 x 16 + tracking — teatgt_config.py:11-14) and whether the object
    classifier runs at all (predcls passes through, so its keys are
    consumed-and-dropped exactly like the TEMPURA converter). With
    ``strict``, any unconsumed key raises.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    consumed: set = set()

    for key in sd:
        if key.endswith(_IGNORABLE_SUFFIXES):
            consumed.add(key)
        if key.startswith(_DROPPED_PREFIXES):
            consumed.add(key)

    # ---- token projections + label embedding (lib/teatgt.py:49-57) ----
    _consume_linear(sd, "subj_fc", params, ["subj_fc"], consumed)
    _consume_linear(sd, "obj_fc", params, ["obj_fc"], consumed)
    _consume_embedding(sd, "node_label_tokenizer.weight", params,
                       ["node_label_tokenizer"], consumed)

    # ---- TokenGT tokenizer (tokenizer.py:43-70) ----
    tg = ["tokengt"]
    gf = "TokenGT_encoder.graph_encoder.graph_feature"
    _consume_linear(sd, f"{gf}.atom_encoder", params, tg + ["atom_encoder"],
                    consumed)
    for name in ("temp_encoder", "edge_encoder", "order_encoder",
                 "graph_token", "null_token"):
        _consume_embedding(sd, f"{gf}.{name}.weight", params, tg + [name],
                           consumed)
    # node-identifier encoder: this repo routes lap/orf/rand ids through ONE
    # encoder site; consume whichever the checkpoint was trained with
    id_src = {"lap": "lap_encoder", "orf": "orf_encoder",
              "rand": "rand_encoder"}[cfg.node_id_mode]
    _consume_linear(sd, f"{gf}.{id_src}", params, tg + ["lap_encoder"],
                    consumed)

    # ---- encoder layers (prenorm, fairseq-style separate projections) ----
    for i in range(cfg.encoder_layers):
        lp = f"TokenGT_encoder.graph_encoder.layers.{i}"
        path = tg + [f"layer_{i}"]
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _consume_linear(sd, f"{lp}.self_attn.{proj}", params,
                            path + ["MultiheadAttention_0", proj], consumed)
        _consume_norm(sd, f"{lp}.self_attn_layer_norm", params, {},
                      path + ["LayerNorm_0"], consumed)
        _consume_norm(sd, f"{lp}.final_layer_norm", params, {},
                      path + ["LayerNorm_1"], consumed)
        _consume_linear(sd, f"{lp}.feedforward.fc1", params,
                        path + ["Dense_0"], consumed)
        _consume_linear(sd, f"{lp}.feedforward.fc2", params,
                        path + ["Dense_1"], consumed)

    # ---- LM head (models/tokengt.py:86-95,108-120) ----
    _consume_linear(sd, "TokenGT_encoder.lm_head_transform_weight", params,
                    tg + ["lm_head_transform_weight"], consumed)
    _consume_norm(sd, "TokenGT_encoder.layer_norm", params, {},
                  tg + ["lm_head_ln"], consumed)
    _consume_linear(sd, "TokenGT_encoder.embed_out", params,
                    tg + ["embed_out"], consumed)
    _consume_embedding(sd, "TokenGT_encoder.lm_output_learned_bias", params,
                       tg + ["lm_output_bias"], consumed)

    # ---- attention-pooling gates (lib/teatgt.py:83-94) ----
    _consume_linear(sd, "gate_gru_nn", params, ["gap_gru", "gate_nn"],
                    consumed)
    for gate, dest in (("gate_nn", "gap"), ("gate_sem_nn", "gap_sem")):
        if cfg.use_cons_str_loss or cfg.use_cons_sem_loss:
            _consume_linear(sd, gate, params, [dest, "gate_nn"], consumed)
        else:
            # the pooling those gates feed only exists on the (disabled)
            # regularizer path — consume and drop
            consumed.update(k for k in sd if k.startswith(f"{gate}."))

    # ---- object classifier ----
    if cfg.mode == "predcls":
        # passthrough in predcls (object_classifier.py forward) — our predcls
        # model has no such params; consume and drop
        consumed.update(k for k in sd if k.startswith("object_classifier."))
    else:
        consume_object_classifier(
            sd, params, stats, consumed, tracking=cfg.tracking,
            obj_mem_compute=False, obj_head="linear", k=4,
            max_pe_len=600 if cfg.mode == "sgdet" else 400,
        )

    # ---- duplicate registrations of already-consumed tensors ----
    for key in sd:
        for dup, canon in _TWIN_PREFIXES:
            if key.startswith(dup) and canon + key[len(dup):] in consumed:
                consumed.add(key)

    leftovers = sorted(set(sd) - consumed)
    if leftovers and strict:
        raise KeyError(
            f"{len(leftovers)} torch keys not consumed by the TEAT-GT "
            f"converter (layout drift?): "
            f"{leftovers[:10]}{'...' if len(leftovers) > 10 else ''}"
        )
    return {"params": params, "batch_stats": stats}


def expected_teatgt_shapes(cfg, entry_template):
    """Shape tree of the TeatGT variables without allocating. Parameter
    shapes do not depend on the clip capacities, so any template works."""
    import jax

    from vidsgg.models.teatgt import TeatGT

    model = TeatGT(cfg)

    def init(rng):
        return model.init(
            {"params": rng, "dropout": rng, "gmm": rng},
            entry_template, phase="train", unc=False,
        )

    return jax.eval_shape(init, jax.random.PRNGKey(0))


def _strip_regularizer(tree):
    """Drop the regularizer-only subtrees (gat/gat_semantic/gap/gap_sem)
    from a variables tree: they exist only when the cons losses are enabled
    and are never written by the converter (see module docstring)."""
    skip = {"gat", "gat_semantic", "gap", "gap_sem"}
    return {
        col: {k: v for k, v in dict(sub).items() if k not in skip}
        for col, sub in dict(tree).items()
    }


def validate_converted_teatgt(converted: dict, expected) -> None:
    """Exact-coverage audit against the model's variable tree, regularizer
    subtrees excluded on BOTH sides (converted never writes them; the init
    tree contains them only when the cons losses are on)."""
    validate_converted(_strip_regularizer(converted),
                       _strip_regularizer(expected))


def load_teatgt_checkpoint(path: str, cfg, entry_template=None,
                           validate: bool = True):
    """Load a reference TEAT-GT ``*_model.tar`` (torch) and convert it.

    Returns ``{'params', 'batch_stats'}``. With ``validate`` (needs
    ``entry_template``), asserts exact coverage of the model's variable
    tree (regularizer subtrees excluded — never converted, see docstring).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    variables = convert_teatgt_state_dict(sd, cfg, strict=True)
    if validate and entry_template is not None:
        validate_converted_teatgt(
            variables, expected_teatgt_shapes(cfg, entry_template))
    return variables
