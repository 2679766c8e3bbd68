"""Paired sgdet serving: the fused relation stage vmapped over videos.

The single-video fused sgdet stage (``eval_pipeline._sgdet_fused``) is
latency-bound (~8 ms of many small masked ops on a v5e); running G
same-shape videos through ONE vmapped dispatch amortizes that fixed cost
the same way ``--pair_detect`` amortizes the detect dispatch. Together
they form the paired serving path: the sgdet source already emits videos
in same-(canvas, frame-bucket) groups when ``pair_detect > 1``, so the
buffer here almost always fills from consecutive videos.

Reference: the per-video test loop at /root/reference/TEMPURA_test.py:70-112
has no batching at all — this is TPU-native capability on top of parity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.eval.adapter import to_eval_pred
from vidsgg.runtime.parallel import _stack_trees
from vidsgg.train.eval_pipeline import (
    EvalPipeline,
    _cast_floating,
    _sgdet_fused,
    cast_state_for_serving,
)


def _pair_fused(state, entries, fmaps, needs_union, union_ppf):
    def fwd(e, f):
        return _sgdet_fused(state, e, f, needs_union, union_ppf)

    return jax.vmap(fwd)(entries, fmaps)


sgdet_fused_pair_stage = jax.jit(_pair_fused, static_argnums=(3, 4))


def _sig(entry, fmaps) -> tuple:
    """Group key: videos stack only when every entry leaf AND the feature
    map share shapes (same capacity bucket, same spatial canvas)."""
    from vidsgg.runtime.parallel import tree_shape_sig

    return tree_shape_sig(fmaps, entry)


@dataclasses.dataclass
class PairedSgdetEval:
    """Buffers sgdet test videos into same-shape groups of ``group`` and
    runs each group through one vmapped fused stage.

    ``add`` returns the (pred, payload) pairs that became ready (empty
    until a group fills); ``flush`` drains the remainders through the
    single-video pipeline. ``payload`` is an arbitrary caller token (the
    GT annotation in the CLIs) carried alongside each video. Videos whose
    device postprocess overflows fall back per-video through
    ``pipeline`` — identical to the single-video path's fallback.
    """

    pipeline: EvalPipeline
    group: int = 2
    # cap on buffered videos across all shape signatures (0 -> 4 * group);
    # each buffered row pins its base-feature map in HBM
    max_pending: int = 0
    # optional device mesh for multi-chip serving: the vmapped fused stage
    # runs sharded along the video axis (runtime/parallel.py's
    # make_parallel_sgdet_eval_step), params replicated — pair the flag
    # with a mesh-enabled SgdetFrontend so the detect stage shards too
    mesh: object = None

    def __post_init__(self):
        if self.pipeline.mode != "sgdet" or not self.pipeline.device_postprocess:
            raise ValueError(
                "PairedSgdetEval requires an sgdet EvalPipeline with "
                "device_postprocess=True"
            )
        self._pending: dict[tuple, list] = {}
        self._stage = None
        if self.mesh is not None:
            from vidsgg.runtime.parallel import make_parallel_sgdet_eval_step

            self._stage = make_parallel_sgdet_eval_step(
                self.mesh, self.pipeline.needs_union,
                self.pipeline.union_pairs_per_frame,
            )

    def _fused(self, state, entry_b, fmaps_b):
        if self._stage is not None:
            # inputs may arrive pre-committed from the sharded frontend
            # with XLA-chosen per-leaf layouts (some leaves replicated);
            # re-place them to match the stage's declared in_shardings
            # (no copy where the layout already matches)
            from vidsgg.runtime.mesh import data_sharding

            sh = data_sharding(self.mesh)
            entry_b, fmaps_b = jax.device_put((entry_b, fmaps_b), sh)
            return self._stage(state, entry_b, fmaps_b)
        p = self.pipeline
        return sgdet_fused_pair_stage(
            state, entry_b, fmaps_b, p.needs_union, p.union_pairs_per_frame
        )

    def add(self, state, entry, fmaps, gt_entry=None, payload=None):
        sig = _sig(entry, fmaps)
        buf = self._pending.setdefault(sig, [])
        buf.append((entry, fmaps, gt_entry, payload))
        if len(buf) < self.group:
            # bound device memory: every buffered row pins its base feature
            # map (hundreds of MB at the 64-frame bucket), so stragglers
            # across many (canvas, bucket) signatures would otherwise pin
            # HBM until the end-of-run flush. Past the cap, drain the
            # oldest OTHER signature through the single-video pipeline —
            # bit-identical to the flush path.
            ready = []
            bound = self.max_pending or 4 * self.group
            while sum(len(b) for b in self._pending.values()) > bound:
                key = next(
                    (k for k, b in self._pending.items() if b and k != sig),
                    None,
                )
                if key is None:  # only the active group remains -> keep it
                    break
                for e, f, g, pl in self._pending.pop(key):
                    ready.append(
                        (self.pipeline(state, e, f, gt_entry=g), pl)
                    )
            return ready
        ready = self._run_group(state, buf)
        buf.clear()
        return ready

    def flush(self, state):
        """Single-video pipeline for group remainders (bit-identical to the
        unpaired path)."""
        ready = []
        for buf in self._pending.values():
            for entry, fmaps, gt_entry, payload in buf:
                ready.append(
                    (self.pipeline(state, entry, fmaps, gt_entry=gt_entry),
                     payload)
                )
            buf.clear()
        return ready

    def _run_group(self, state, buf):
        p = self.pipeline
        entries = [e for e, _, _, _ in buf]
        fms = [f for _, f, _, _ in buf]
        if p.compute_dtype is not None:
            state = cast_state_for_serving(state, p.compute_dtype)
            entries = [_cast_floating(e, p.compute_dtype) for e in entries]
            fms = [_cast_floating(f, p.compute_dtype) for f in fms]
        batch = _stack_trees(tuple(entries))
        fmb = _stack_trees(tuple(jnp.asarray(f) for f in fms))
        entry2_b, out_b, overflow = self._fused(state, batch, fmb)
        overflow = np.asarray(overflow)
        # ONE batched transfer for the clean videos (methodology:
        # docs/PERF.md "Batch EVERY host<->device boundary")
        entry2_b, out_b = jax.device_get((entry2_b, out_b))
        ready = []
        for i, (entry, fmaps, gt_entry, payload) in enumerate(buf):
            if bool(overflow[i]):  # rare clean_class blow-up -> host path
                ready.append(
                    (p(state, entry, fmaps, gt_entry=gt_entry), payload)
                )
                continue
            pred = to_eval_pred(
                jax.tree.map(lambda a: a[i], entry2_b),
                jax.tree.map(lambda a: a[i], out_b),
                "sgdet",
            )
            ready.append((EvalPipeline._attach_gt(pred, gt_entry), payload))
        return ready

    def run_batched(self, state, entry_b, fmaps_b, payloads):
        """Serve a pre-batched group straight from
        ``SgdetFrontend.eval_pair_batched`` — the zero-restack fast path
        (the detect jit emits the batch, the vmapped fused stage consumes
        it; no per-video slicing dispatches in between).

        ``entry_b``/``fmaps_b`` carry a leading video axis matching
        ``payloads``; a ``None`` payload marks a row to skip (the source
        flags compact-regime videos whose detections exceed the entry
        capacity this way). GT predicate lists for the temporal-consistency
        bookkeeping come from the batched input entry itself (the detector
        entry carries them, like the single path's ``gt_entry=entry``).
        """
        from vidsgg.detector.sgdet import _slice_video

        p = self.pipeline
        if p.compute_dtype is not None:
            state = cast_state_for_serving(state, p.compute_dtype)
            entry_b = _cast_floating(entry_b, p.compute_dtype)
            fmaps_b = _cast_floating(fmaps_b, p.compute_dtype)
        fmaps_b = jnp.asarray(fmaps_b)
        entry2_b, out_b, overflow = self._fused(state, entry_b, fmaps_b)
        overflow = np.asarray(overflow)
        # two batched transfers total: outputs + the input entry's small GT
        # predicate fields for _attach_gt
        entry2_b, out_b = jax.device_get((entry2_b, out_b))
        gt_pm, gt_att, gt_sp, gt_con = jax.device_get((
            entry_b.pair_mask, entry_b.attention_gt,
            entry_b.spatial_gt, entry_b.contacting_gt,
        ))
        ready = []
        for i, payload in enumerate(payloads):
            if payload is None:  # over-capacity row flagged by the source
                continue
            if bool(overflow[i]):  # rare clean_class blow-up -> host path
                e_i = _slice_video(entry_b, i)
                ready.append(
                    (p(state, e_i, fmaps_b[i], gt_entry=e_i), payload)
                )
                continue
            pred = to_eval_pred(
                jax.tree.map(lambda a: a[i], entry2_b),
                jax.tree.map(lambda a: a[i], out_b),
                "sgdet",
            )
            gt_view = _GtView(gt_pm[i], gt_att[i], gt_sp[i], gt_con[i])
            ready.append((EvalPipeline._attach_gt(pred, gt_view), payload))
        return ready


@dataclasses.dataclass
class _GtView:
    """Host view of one video's GT predicate fields (what
    ``EvalPipeline._attach_gt`` reads off a gt_entry)."""

    pair_mask: np.ndarray
    attention_gt: np.ndarray
    spatial_gt: np.ndarray
    contacting_gt: np.ndarray
