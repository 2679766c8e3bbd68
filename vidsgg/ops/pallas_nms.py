"""Pallas TPU kernel: greedy NMS.

The TPU counterpart of the reference's CUDA ``roi_layers.nms``. Greedy NMS
is inherently a sequential scan over ranked boxes; under plain XLA that scan
is a ``fori_loop`` of tiny HLO ops with per-iteration while-loop overhead.
This kernel runs the whole scan inside one Pallas program with every operand
resident in VMEM: coordinates live as four lane-aligned [1, N] rows, the
suppression state is a VMEM scratch vector, and each step is a handful of
VPU ops — no HLO loop bookkeeping, no HBM traffic after the initial load.

Grid: one program per independent NMS problem (frame, class), so the
(frame x class) grid of sgdet suppression runs as parallel programs.

Inputs are pre-sorted by score descending (the sort is a single XLA sort
outside the kernel); the wrapper restores original order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(coords_ref, valid_ref, thresh_ref, keep_ref, sup_ref):
    """Fully vectorized scan step: Mosaic disallows scalar VMEM loads/stores,
    so per-box scalars come from one-hot masked reductions and the keep bit
    is written with a row-wide masked max."""
    n = coords_ref.shape[-1]
    x1 = coords_ref[0, 0:1, :]
    y1 = coords_ref[0, 1:2, :]
    x2 = coords_ref[0, 2:3, :]
    y2 = coords_ref[0, 3:4, :]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)  # [1, N]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    thresh = thresh_ref[0]
    valid_f = (valid_ref[0] != 0).astype(jnp.float32)  # [1, N]

    sup_ref[:] = jnp.zeros((1, n), jnp.float32)
    keep_ref[0] = jnp.zeros((1, n), jnp.int32)

    def body(i, _):
        sel = (col == i).astype(jnp.float32)  # one-hot row
        sup_i = jnp.sum(sup_ref[:] * sel)
        val_i = jnp.sum(valid_f * sel)
        is_kept = ((sup_i == 0.0) & (val_i != 0.0)).astype(jnp.float32)

        xi1 = jnp.sum(x1 * sel)
        yi1 = jnp.sum(y1 * sel)
        xi2 = jnp.sum(x2 * sel)
        yi2 = jnp.sum(y2 * sel)
        area_i = (xi2 - xi1 + 1.0) * (yi2 - yi1 + 1.0)
        iw = jnp.minimum(x2, xi2) - jnp.maximum(x1, xi1) + 1.0
        ih = jnp.minimum(y2, yi2) - jnp.maximum(y1, yi1) + 1.0
        inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
        iou = inter / (area + area_i - inter)
        newly = ((iou > thresh) & (col > i)).astype(jnp.float32) * is_kept
        sup_ref[:] = jnp.maximum(sup_ref[:], newly)
        keep_ref[0] = jnp.maximum(
            keep_ref[0], (sel * is_kept).astype(jnp.int32)
        )
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _nms_batch_kernel(x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, thresh_ref,
                      keep_ref, sup_ref, *, max_keep=None):
    """Batched scan: ALL problems advance one ranked box per step.

    v1 (`_nms_kernel`) runs one program per (frame, class) problem, so the
    grid serializes: problems x N tiny steps. Here problems live on the
    sublane axis and boxes on the lane axis — each of the N steps is a
    handful of full-width [PB, N] VPU ops, so the whole sgdet suppression
    grid costs N wide steps total. Per-step scalars (box i's coords, its
    suppression bit) are [PB, 1] dynamic lane slices, broadcast against the
    row-wide operands.

    ``max_keep``: early-exit bound. Greedy NMS is a prefix-stable scan —
    once every problem in the block has kept ``max_keep`` boxes, later
    steps can only mark keeps the consumer discards (the RPN proposal
    layer keeps exactly ``post_nms_top_n``), so the scan stops. Exact for
    the first ``max_keep`` keeps per problem; boxes that would have been
    kept after that may stay unmarked.
    """
    pb, n = x1_ref.shape
    thresh = thresh_ref[0]
    x1, y1, x2, y2 = x1_ref[:], y1_ref[:], x2_ref[:], y2_ref[:]
    valid_f = valid_ref[:]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (pb, n), 1)
    sup_ref[:] = jnp.zeros((pb, n), jnp.float32)
    keep_ref[:] = jnp.zeros((pb, n), jnp.float32)

    def step(i):
        # Mosaic can't prove lane alignment for a [PB, 1] dynamic slice, so
        # per-problem scalars come from one-hot masked lane reductions
        sel = jnp.where(col == i, 1.0, 0.0)   # [PB, N] one-hot column

        def pick(a):                           # [PB, N] -> [PB, 1]
            return jnp.sum(a * sel, axis=1, keepdims=True)

        xi1, yi1, xi2, yi2 = pick(x1), pick(y1), pick(x2), pick(y2)
        sup_i = pick(sup_ref[:])
        val_i = pick(valid_f)
        is_kept = jnp.where((sup_i == 0.0) & (val_i != 0.0), 1.0, 0.0)

        area_i = (xi2 - xi1 + 1.0) * (yi2 - yi1 + 1.0)
        iw = jnp.minimum(x2, xi2) - jnp.maximum(x1, xi1) + 1.0
        ih = jnp.minimum(y2, yi2) - jnp.maximum(y1, yi1) + 1.0
        inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
        iou = inter / (area + area_i - inter)
        newly = jnp.where((iou > thresh) & (col > i), 1.0, 0.0) * is_kept
        sup_ref[:] = jnp.maximum(sup_ref[:], newly)
        keep_ref[:] = jnp.maximum(keep_ref[:], sel * is_kept)
        return is_kept

    if max_keep is None:
        jax.lax.fori_loop(0, n, lambda i, _: (step(i), 0)[1], 0)
    else:
        # a problem is live while it still wants keeps AND ranked valid
        # boxes remain (valid boxes sort first, so steps past its valid
        # count are no-ops for it; all-padding problems retire at i=0)
        v_count = jnp.sum(valid_f, axis=1, keepdims=True)  # [PB, 1]

        def cond(state):
            i, counts = state
            live = (counts < float(max_keep)) & (i < v_count)
            return (i < n) & jnp.any(live)

        def body(state):
            i, counts = state
            return i + 1, counts + step(i)

        jax.lax.while_loop(cond, body, (0, jnp.zeros((pb, 1), jnp.float32)))


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def nms_mask_pallas_batched(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    interpret: bool = False,
    max_keep: int | None = None,
    presorted: bool = False,
) -> jnp.ndarray:
    """Batched-scan Pallas NMS: same contract as :func:`nms_mask_pallas`.

    boxes [..., N, 4], scores [..., N], valid [..., N] -> keep [..., N].
    Problems are blocked onto the sublane axis; each grid program handles a
    block of problems and the scan advances all of them together.

    ``max_keep``: stop the scan once every problem has kept ``max_keep``
    boxes (or exhausted its valid boxes). The mask is exact for the first
    ``max_keep`` kept boxes per problem in score order; boxes that would
    have been kept after that may stay unmarked — only safe when the
    consumer takes at most ``max_keep`` keeps (the RPN proposal layer).

    ``presorted``: scores are already descending with valid boxes first
    (e.g. straight out of ``top_k``) — skips the sort and the scatter back.
    """
    lead = boxes.shape[:-2]
    n = boxes.shape[-2]
    g = 1
    for d in lead:
        g *= d
    b = boxes.reshape(g, n, 4).astype(jnp.float32)
    s = scores.reshape(g, n).astype(jnp.float32)
    v = valid.reshape(g, n)

    gi = jnp.arange(g)[:, None]
    if presorted:
        order = None
        bs, vs = b, v
    else:
        neg_inf = jnp.finfo(jnp.float32).min
        order = jnp.argsort(
            jnp.where(v, s, neg_inf), axis=-1, descending=True)
        bs = b[gi, order]
        vs = v[gi, order]

    n_pad = _round_up(max(n, 128), 128)
    # block problems to keep ~7 [PB, n_pad] f32 arrays within a few MB VMEM
    pb = max(8, min(_round_up(g, 8), (2 << 20) // (n_pad * 4)))
    pb = _round_up(pb, 8)
    g_pad = _round_up(g, pb)

    def chan(c):
        out = jnp.zeros((g_pad, n_pad), jnp.float32)
        return out.at[:g, :n].set(bs[:, :, c])

    vmat = jnp.zeros((g_pad, n_pad), jnp.float32).at[:g, :n].set(
        vs.astype(jnp.float32)
    )
    thresh = jnp.full((1,), iou_thresh, jnp.float32)

    spec = pl.BlockSpec((pb, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    keep_sorted = pl.pallas_call(
        functools.partial(_nms_batch_kernel, max_keep=max_keep),
        grid=(g_pad // pb,),
        in_specs=[spec, spec, spec, spec, spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((g_pad, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((pb, n_pad), jnp.float32)],
        interpret=interpret,
    )(chan(0), chan(1), chan(2), chan(3), vmat, thresh)

    keep_sorted = keep_sorted[:g, :n] != 0.0
    if presorted:
        return keep_sorted.reshape(lead + (n,))
    keep = jnp.zeros((g, n), bool).at[gi, order].set(keep_sorted)
    return keep.reshape(lead + (n,))


@functools.partial(jax.jit, static_argnums=(3, 4))
def nms_mask_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for :func:`vidsgg.ops.nms.nms_mask` with leading batch dims.

    boxes [..., N, 4], scores [..., N], valid [..., N] -> keep [..., N].
    """
    lead = boxes.shape[:-2]
    n = boxes.shape[-2]
    g = 1
    for d in lead:
        g *= d
    b = boxes.reshape(g, n, 4).astype(jnp.float32)
    s = scores.reshape(g, n).astype(jnp.float32)
    v = valid.reshape(g, n)

    neg_inf = jnp.finfo(jnp.float32).min
    order = jnp.argsort(jnp.where(v, s, neg_inf), axis=-1, descending=True)
    gi = jnp.arange(g)[:, None]
    bs = b[gi, order]
    vs = v[gi, order]

    n_pad = _round_up(max(n, 128), 128)
    coords = jnp.zeros((g, 4, n_pad), jnp.float32)
    coords = coords.at[:, :, :n].set(bs.swapaxes(-1, -2))
    vpad = jnp.zeros((g, 1, n_pad), jnp.int32).at[:, 0, :n].set(vs.astype(jnp.int32))
    thresh = jnp.full((1,), iou_thresh, jnp.float32)

    keep_sorted = pl.pallas_call(
        _nms_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 4, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, 1, n_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
        interpret=interpret,
    )(coords, vpad, thresh)

    keep_sorted = keep_sorted[:, 0, :n].astype(bool)
    keep = jnp.zeros((g, n), bool).at[gi, order].set(keep_sorted)
    return keep.reshape(lead + (n,))
