"""Int8 quantized serving path for the frozen detector backbone.

TPU-native inference quantization: v5e's MXU runs s8 x s8 -> s32 at twice
the bf16 FLOP rate, and int8 activations halve the HBM bytes of the
thin-channel ResNet stages that bound the detect jit (docs/PERF.md
"Detection breakdown"). The reference serves its frozen Faster R-CNN in
fp32 (tools/fasterRCNN, external; consumed at object_detector.py:85-94) —
there is no reference counterpart to mirror; this is deployment capability
the TPU port adds.

Scheme (standard post-training quantization):

- **weights**: symmetric per-output-channel int8; scales derived from the
  f32 params at trace time (the detector is frozen, so XLA hoists the
  requantization out of the serving loop via constant folding when params
  are donated/captured, and it is elementwise-cheap regardless);
- **activations**: symmetric per-tensor int8 with STATIC scales calibrated
  by running representative videos through the same network in ``record``
  mode (abs-max). Static scales keep the quantize step a pure elementwise
  epilogue that XLA fuses into the producing conv/BN/relu — a dynamic
  abs-max would force an extra full HBM pass per activation;
- **accumulation**: int32 (``preferred_element_type``), dequantized to the
  model compute dtype by one fused multiply.

The BN/relu/residual glue stays in f32/bf16 — only the convolutions (where
the FLOPs and bytes are) change representation.

Modes, selected by the ``quant`` field threaded through
:class:`~vidsgg.detector.resnet.ResNet101Base` /
:class:`~vidsgg.detector.faster_rcnn.FasterRCNN`:

- ``"off"``   — plain ``nn.Conv`` (default; param tree unchanged),
- ``"record"``— f32/bf16 convs + abs-max accumulation into a ``quant``
  variable collection (apply with ``mutable=["quant"]``),
- ``"int8"``  — the quantized path reading the recorded scales.

All three share one param tree (kernel name/layout match ``nn.Conv``), so
weights load once and the mode is a constructor switch:

    rec = FasterRCNN(..., quant="record"); vars_ = rec.init(rng, x, hw)
    vars_ = calibrate(rec, vars_, videos, hw)      # fills act scales
    srv = FasterRCNN(..., quant="int8"); srv.apply(vars_, x, hw)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

QUANT_COLLECTION = "quant"
_EPS = 1e-8


def quantize_symmetric(x, scale):
    """round(x / (scale/127)) clipped to [-127, 127], as int8.

    ``scale`` is the abs-max of the tensor (per-tensor scalar or
    per-channel vector broadcastable against ``x``).
    """
    q = jnp.round(x * (127.0 / jnp.maximum(scale, _EPS)))
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


class QuantConv(nn.Module):
    """Drop-in for ``nn.Conv(use_bias=False)`` with record/int8 modes.

    The kernel param is named ``kernel`` with the HWIO layout, so a
    variables tree produced by ``nn.Conv`` (e.g. the ``.pth`` converter's
    output) applies unchanged.
    """

    features: int
    kernel_size: tuple
    strides: int = 1
    padding: int = 0
    dtype: object = jnp.float32
    mode: str = "record"  # "record" | "int8"

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
        )
        act_scale = self.variable(
            QUANT_COLLECTION, "act_scale", lambda: jnp.zeros((), jnp.float32)
        )
        strides = (self.strides, self.strides)
        pad = [(self.padding, self.padding)] * 2
        dn = ("NHWC", "HWIO", "NHWC")

        if self.mode == "record":
            if not self.is_initializing():
                act_scale.value = jnp.maximum(
                    act_scale.value, jnp.abs(x).astype(jnp.float32).max()
                )
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                strides, pad, dimension_numbers=dn,
            )
            return y.astype(self.dtype)

        # int8: static-scale activation quant (fuses into the producer's
        # epilogue), per-cout weight quant, s8 x s8 -> s32 on the MXU,
        # one fused dequant multiply back to the compute dtype.
        s_x = jnp.maximum(act_scale.value, _EPS)
        w_scale = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))  # [cout]
        xq = quantize_symmetric(x, s_x)
        wq = quantize_symmetric(kernel, w_scale)
        acc = jax.lax.conv_general_dilated(
            xq, wq, strides, pad, dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        deq = (s_x / 127.0) * (jnp.maximum(w_scale, _EPS) / 127.0)  # [cout]
        return (acc.astype(jnp.float32) * deq).astype(self.dtype)


def conv_ctor(quant: str, dtype):
    """The conv constructor for a backbone module: ``nn.Conv``-compatible
    ``(features, kernel_size, strides, padding, name)`` callable."""
    if quant == "off":
        def make(features, kernel_size, strides=1, padding=0, name=None):
            return nn.Conv(
                features, kernel_size, strides=strides, padding=padding,
                use_bias=False, dtype=dtype, name=name,
            )
    else:
        def make(features, kernel_size, strides=1, padding=0, name=None):
            return QuantConv(
                features, kernel_size, strides=strides, padding=padding,
                dtype=dtype, mode=quant, name=name,
            )
    return make


def calibrate(model, variables, inputs, method=None):
    """Run ``record``-mode forward passes, folding abs-max activation
    scales into the ``quant`` collection. Returns the updated variables.

    Args:
      model: a module built with ``quant="record"``.
      variables: full variables dict (params/batch_stats/quant).
      inputs: iterable of positional-argument tuples, one per calibration
        pass (a bare array is treated as a 1-tuple). Each distinct shape
        costs one trace/compile — feed calibration data at the same
        (canvas, bucket) shapes serving will use.
      method: optional method name forwarded to ``apply``.
    """
    kwargs = {"method": method} if method else {}

    @jax.jit
    def step(vars_, args):
        _, muts = model.apply(
            vars_, *args, mutable=[QUANT_COLLECTION], **kwargs
        )
        return {**vars_, **muts}

    for args in inputs:
        if not isinstance(args, tuple):
            args = (args,)
        variables = step(variables, args)
    return variables
