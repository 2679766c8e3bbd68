"""ResNet-101 backbone + R-CNN head (Flax, NHWC, inference-style BN).

Architecture mirrors the jwyang faster-rcnn.pytorch ResNet-101 used by the
reference (tools/fasterRCNN/lib/model/faster_rcnn/resnet.py, external):
``RCNN_base`` = conv1..layer3 (stride 16, 1024 channels) and
``_head_to_tail`` = layer4 + global average pool -> 2048
(object_detector.py:357, :367). The detector is frozen in the reference
(TEMPURA_train.py:56-57), so BatchNorm always uses running statistics and no
train-mode path exists.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vidsgg.detector.quant import conv_ctor


class FrozenBatchNorm(nn.Module):
    """Inference-only BN: y = (x - mean) / sqrt(var + eps) * scale + bias.

    All four tensors are non-trainable variables (collection 'batch_stats'
    for mean/var, params for scale/bias) populated by the weight converter.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c))
        var = self.variable("batch_stats", "var", lambda: jnp.ones(c))
        return (x - mean.value) * jnp.reciprocal(
            jnp.sqrt(var.value + self.epsilon)
        ) * scale + bias


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: object = jnp.float32  # bf16 compute halves HBM traffic, 2x MXU
    quant: str = "off"           # "off" | "record" | "int8" (detector/quant.py)

    @nn.compact
    def __call__(self, x):
        conv = conv_ctor(self.quant, self.dtype)
        identity = x
        h = conv(self.planes, (1, 1), name="conv1")(x)
        h = FrozenBatchNorm(name="bn1")(h).astype(self.dtype)
        h = nn.relu(h)
        h = conv(self.planes, (3, 3), strides=self.stride, padding=1,
                 name="conv2")(h)
        h = FrozenBatchNorm(name="bn2")(h).astype(self.dtype)
        h = nn.relu(h)
        h = conv(self.planes * 4, (1, 1), name="conv3")(h)
        h = FrozenBatchNorm(name="bn3")(h)
        if self.downsample:
            identity = conv(self.planes * 4, (1, 1), strides=self.stride,
                            name="downsample_conv")(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        return nn.relu(h + identity).astype(self.dtype)


def _layer(x, planes, blocks, stride, name_prefix, dtype=jnp.float32,
           quant="off"):
    x = Bottleneck(planes, stride=stride, downsample=True, dtype=dtype,
                   quant=quant, name=f"{name_prefix}_0")(x)
    for i in range(1, blocks):
        x = Bottleneck(planes, dtype=dtype, quant=quant,
                       name=f"{name_prefix}_{i}")(x)
    return x


class ResNet101Base(nn.Module):
    """conv1..layer3: [B, H, W, 3] -> [B, H/16, W/16, 1024].

    ``blocks`` defaults to ResNet-101's (3, 4, 23); tests may shrink it.
    """

    blocks: tuple = (3, 4, 23)
    dtype: object = jnp.float32
    quant: str = "off"

    @nn.compact
    def __call__(self, x):
        h = conv_ctor(self.quant, self.dtype)(
            64, (7, 7), strides=2, padding=3, name="conv1"
        )(x.astype(self.dtype))
        h = FrozenBatchNorm(name="bn1")(h).astype(self.dtype)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        h = _layer(h, 64, self.blocks[0], 1, "layer1", self.dtype, self.quant)
        h = _layer(h, 128, self.blocks[1], 2, "layer2", self.dtype, self.quant)
        h = _layer(h, 256, self.blocks[2], 2, "layer3", self.dtype, self.quant)
        return h.astype(jnp.float32)


class ResNetHead(nn.Module):
    """layer4 + spatial mean: [N, 7, 7, 1024] -> [N, 2048]
    (the jwyang ``_head_to_tail``)."""

    blocks: int = 3
    dtype: object = jnp.float32
    quant: str = "off"

    @nn.compact
    def __call__(self, pooled):
        h = _layer(pooled, 512, self.blocks, 2, "layer4", self.dtype,
                   self.quant)
        return h.mean(axis=(1, 2)).astype(jnp.float32)
