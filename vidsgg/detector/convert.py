"""torch -> Flax weight conversion for the AG-finetuned Faster R-CNN.

The reference loads ``tools/fasterRCNN/models/faster_rcnn_ag.pth``
(object_detector.py:30), an artifact of the jwyang faster-rcnn.pytorch
lineage that is gitignored out of the checkout. This module maps that
state_dict layout onto :class:`vidsgg.detector.faster_rcnn.FasterRCNN`'s
parameter tree. Conventions:

* torch Conv2d weight [O, I, kh, kw] -> flax [kh, kw, I, O];
* torch Linear weight [O, I] -> flax kernel [I, O];
* BatchNorm weight/bias -> FrozenBatchNorm scale/bias (params),
  running_mean/var -> batch_stats.

jwyang name stems: ``RCNN_base.{0,1}`` (conv1/bn1), ``RCNN_base.{4,5,6}``
(layer1..3), ``RCNN_top.0`` (layer4), ``RCNN_rpn.RPN_Conv`` /
``RPN_cls_score`` / ``RPN_bbox_pred``, ``RCNN_cls_score``, ``RCNN_bbox_pred``.
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


def _bottleneck_paths(flax_block: str, torch_items: dict, params, stats):
    for tkey, val in torch_items.items():
        val = np.asarray(val)
        parts = tkey.split(".")
        mod = parts[0]  # conv1/bn1/conv2/bn2/conv3/bn3/downsample
        if mod == "downsample":
            sub = "downsample_conv" if parts[1] == "0" else "downsample_bn"
            leaf = parts[2]
        else:
            sub, leaf = mod, parts[1]
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


def convert_jwyang_state_dict(state_dict: dict) -> dict:
    """torch state_dict (tensor-like values) -> {'params': ..., 'batch_stats': ...}
    matching FasterRCNN's variable tree."""
    params: dict = {}
    stats: dict = {}
    blocks: dict[str, dict] = {}

    for key, val in state_dict.items():
        val = np.asarray(val)
        parts = key.split(".")
        if parts[0] == "RCNN_base":
            if parts[1] == "0":  # conv1
                _set(params, ["base", "conv1", "kernel"], _conv_w(val))
            elif parts[1] == "1":  # bn1
                leaf = parts[2]
                if leaf == "weight":
                    _set(params, ["base", "bn1", "scale"], val)
                elif leaf == "bias":
                    _set(params, ["base", "bn1", "bias"], val)
                elif leaf == "running_mean":
                    _set(stats, ["base", "bn1", "mean"], val)
                elif leaf == "running_var":
                    _set(stats, ["base", "bn1", "var"], val)
            elif parts[1] in _LAYER_STEM:
                stem = _LAYER_STEM[parts[1]]
                block = f"base/{stem}_{parts[2]}"
                blocks.setdefault(block, {})[".".join(parts[3:])] = val
        elif parts[0] == "RCNN_top":
            block = f"head/layer4_{parts[2]}"
            blocks.setdefault(block, {})[".".join(parts[3:])] = val
        elif parts[0] == "RCNN_rpn":
            name = {"RPN_Conv": "rpn_conv", "RPN_cls_score": "rpn_cls_score",
                    "RPN_bbox_pred": "rpn_bbox_pred"}.get(parts[1])
            if name is None:
                continue
            if parts[2] == "weight":
                _set(params, ["rpn", name, "kernel"], _conv_w(val))
            else:
                _set(params, ["rpn", name, "bias"], val)
        elif parts[0] in ("RCNN_cls_score", "RCNN_bbox_pred"):
            name = "cls_score" if parts[0] == "RCNN_cls_score" else "bbox_pred"
            if parts[1] == "weight":
                _set(params, [name, "kernel"], _lin_w(val))
            else:
                _set(params, [name, "bias"], val)

    for block, items in blocks.items():
        top, sub = block.split("/")
        p = params.setdefault(top, {})
        s = stats.setdefault(top, {})
        _bottleneck_paths(sub, items, p, s)

    return {"params": params, "batch_stats": stats}


def load_faster_rcnn_checkpoint(path: str) -> dict:
    """Load a ``faster_rcnn_ag.pth``-style checkpoint (requires torch for
    unpickling) and convert it."""
    import torch  # CPU torch is available in the image

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    state = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
    return convert_jwyang_state_dict(state)
