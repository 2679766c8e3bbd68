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
from vidsgg.runtime.parallel import stack_entries
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
    return (
        tuple(np.shape(fmaps)),
        tuple(
            (tuple(x.shape), str(getattr(x, "dtype", "")))
            for x in jax.tree.leaves(entry)
        ),
    )


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

    def __post_init__(self):
        if self.pipeline.mode != "sgdet" or not self.pipeline.device_postprocess:
            raise ValueError(
                "PairedSgdetEval requires an sgdet EvalPipeline with "
                "device_postprocess=True"
            )
        self._pending: dict[tuple, list] = {}

    def add(self, state, entry, fmaps, gt_entry=None, payload=None):
        buf = self._pending.setdefault(_sig(entry, fmaps), [])
        buf.append((entry, fmaps, gt_entry, payload))
        if len(buf) < self.group:
            return []
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
        batch = stack_entries(entries)
        fmb = jnp.stack([jnp.asarray(f) for f in fms])
        entry2_b, out_b, overflow = sgdet_fused_pair_stage(
            state, batch, fmb, p.needs_union, p.union_pairs_per_frame
        )
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
