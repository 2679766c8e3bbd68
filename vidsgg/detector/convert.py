"""torch -> Flax weight conversion for the AG-finetuned Faster R-CNN.

The reference loads ``tools/fasterRCNN/models/faster_rcnn_ag.pth``
(object_detector.py:30), an artifact of the jwyang faster-rcnn.pytorch
lineage that is gitignored out of the checkout. This module maps that
state_dict layout onto :class:`vidsgg.detector.faster_rcnn.FasterRCNN`'s
parameter tree. Conventions:

* torch Conv2d weight [O, I, kh, kw] -> flax [kh, kw, I, O];
* torch Linear weight [O, I] -> flax kernel [I, O];
* BatchNorm weight/bias -> FrozenBatchNorm scale/bias (params),
  running_mean/var -> batch_stats; num_batches_tracked is dropped.

jwyang name stems: ``RCNN_base.{0,1}`` (conv1/bn1), ``RCNN_base.{4,5,6}``
(layer1..3), ``RCNN_top.0`` (layer4), ``RCNN_rpn.RPN_Conv`` /
``RPN_cls_score`` / ``RPN_bbox_pred``, ``RCNN_cls_score``, ``RCNN_bbox_pred``.

Conversion is *audited*: every torch key must be consumed (or explicitly
ignorable) and — via :func:`validate_converted` — every Flax param and
batch_stat must be written with the right shape, so an unmapped tensor can
never silently stay at random init (the single highest-risk artifact for
R@20 parity, SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _lin_w(w):
    return np.transpose(np.asarray(w), (1, 0))


_LAYER_STEM = {"4": "layer1", "5": "layer2", "6": "layer3"}

# keys carrying no learnable/statistical content in the jwyang layout
_IGNORABLE_SUFFIXES = ("num_batches_tracked",)


def _bottleneck_paths(flax_block: str, torch_items: dict, params, stats,
                      consumed: set):
    for (rel, full), val in torch_items.items():
        val = np.asarray(val)
        parts = rel.split(".")
        mod = parts[0]  # conv1/bn1/conv2/bn2/conv3/bn3/downsample
        if mod == "downsample":
            sub = "downsample_conv" if parts[1] == "0" else "downsample_bn"
            leaf = parts[2]
        elif mod in ("conv1", "bn1", "conv2", "bn2", "conv3", "bn3"):
            sub, leaf = mod, parts[1]
        else:
            continue  # unknown submodule: leave unconsumed for the audit
        if leaf == "weight":
            if "conv" in sub:
                _set(params, [flax_block, sub, "kernel"], _conv_w(val))
            else:
                _set(params, [flax_block, sub, "scale"], val)
        elif leaf == "bias":
            _set(params, [flax_block, sub, "bias"], val)
        elif leaf == "running_mean":
            _set(stats, [flax_block, sub, "mean"], val)
        elif leaf == "running_var":
            _set(stats, [flax_block, sub, "var"], val)
        else:
            continue  # unknown leaf: leave unconsumed for the audit
        consumed.add(full)


def convert_jwyang_state_dict(state_dict: dict, strict: bool = True) -> dict:
    """torch state_dict (tensor-like values) -> {'params': ..., 'batch_stats': ...}
    matching FasterRCNN's variable tree.

    With ``strict`` (default), raises KeyError when any torch key is neither
    mapped nor ignorable — a layout drift would otherwise silently discard
    trained weights.
    """
    params: dict = {}
    stats: dict = {}
    blocks: dict[str, dict] = {}
    consumed: set = set()

    for key, val in state_dict.items():
        if key.endswith(_IGNORABLE_SUFFIXES):
            consumed.add(key)
            continue
        val = np.asarray(val)
        parts = key.split(".")
        if parts[0] == "RCNN_base":
            if parts[1] == "0" and parts[2] == "weight":  # conv1
                _set(params, ["base", "conv1", "kernel"], _conv_w(val))
                consumed.add(key)
            elif parts[1] == "1":  # bn1
                leaf = parts[2]
                dest = {
                    "weight": (params, ["base", "bn1", "scale"]),
                    "bias": (params, ["base", "bn1", "bias"]),
                    "running_mean": (stats, ["base", "bn1", "mean"]),
                    "running_var": (stats, ["base", "bn1", "var"]),
                }.get(leaf)
                if dest is not None:
                    _set(dest[0], dest[1], val)
                    consumed.add(key)
            elif parts[1] in _LAYER_STEM:
                stem = _LAYER_STEM[parts[1]]
                block = f"base/{stem}_{parts[2]}"
                blocks.setdefault(block, {})[(".".join(parts[3:]), key)] = val
        elif parts[0] == "RCNN_top":
            block = f"head/layer4_{parts[2]}"
            blocks.setdefault(block, {})[(".".join(parts[3:]), key)] = val
        elif parts[0] == "RCNN_rpn":
            name = {"RPN_Conv": "rpn_conv", "RPN_cls_score": "rpn_cls_score",
                    "RPN_bbox_pred": "rpn_bbox_pred"}.get(parts[1])
            if name is None:
                continue
            if parts[2] == "weight":
                _set(params, ["rpn", name, "kernel"], _conv_w(val))
            else:
                _set(params, ["rpn", name, "bias"], val)
            consumed.add(key)
        elif parts[0] in ("RCNN_cls_score", "RCNN_bbox_pred"):
            name = "cls_score" if parts[0] == "RCNN_cls_score" else "bbox_pred"
            if parts[1] == "weight":
                _set(params, [name, "kernel"], _lin_w(val))
            else:
                _set(params, [name, "bias"], val)
            consumed.add(key)

    for block, items in blocks.items():
        top, sub = block.split("/")
        p = params.setdefault(top, {})
        s = stats.setdefault(top, {})
        _bottleneck_paths(sub, items, p, s, consumed)

    leftovers = sorted(set(state_dict) - consumed)
    if leftovers and strict:
        raise KeyError(
            f"{len(leftovers)} torch keys not consumed by the converter "
            f"(layout drift?): {leftovers[:10]}{'...' if len(leftovers) > 10 else ''}"
        )
    return {"params": params, "batch_stats": stats}


def _flatten(tree: dict, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


def validate_converted(converted: dict, variables) -> None:
    """Assert the converted tree covers the model's variable tree exactly.

    ``variables`` is the model's init output (or ``jax.eval_shape`` thereof):
    {'params': ..., 'batch_stats': ...}. Raises ValueError listing
    * missing leaves (would silently stay at random init),
    * unexpected leaves (trained weights that would be dropped),
    * shape mismatches.
    """
    problems = []
    for col in ("params", "batch_stats"):
        got = _flatten(converted.get(col, {}))
        want = _flatten(_to_plain(variables.get(col, {})))
        for path in sorted(set(want) - set(got)):
            problems.append(f"MISSING  {col}/{'/'.join(path)} {want[path]}")
        for path in sorted(set(got) - set(want)):
            problems.append(f"EXTRA    {col}/{'/'.join(path)} {got[path]}")
        for path in sorted(set(got) & set(want)):
            if got[path] != want[path]:
                problems.append(
                    f"SHAPE    {col}/{'/'.join(path)}: got {got[path]}, "
                    f"want {want[path]}"
                )
    if problems:
        raise ValueError(
            "checkpoint conversion does not cover the model exactly:\n"
            + "\n".join(problems[:40])
            + ("\n..." if len(problems) > 40 else "")
        )


def _to_plain(tree):
    """unfreeze/shape-struct -> plain nested dict of shaped leaves."""
    if hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


def expected_variable_shapes(model=None):
    """Shape tree of the full FasterRCNN variables without allocating
    (jax.eval_shape over init)."""
    import jax
    import jax.numpy as jnp

    from vidsgg.detector.faster_rcnn import FasterRCNN

    model = model or FasterRCNN()
    return jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 64, 64, 3)), jnp.array([64.0, 64.0])),
        jax.random.PRNGKey(0),
    )


def load_faster_rcnn_checkpoint(path: str, model=None, validate: bool = True) -> dict:
    """Load a ``faster_rcnn_ag.pth``-style checkpoint (requires torch for
    unpickling), convert it, and (by default) validate full coverage of the
    FasterRCNN variable tree."""
    import torch  # CPU torch is available in the image

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    state = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
    converted = convert_jwyang_state_dict(state, strict=True)
    if validate:
        validate_converted(converted, expected_variable_shapes(model))
    return converted
