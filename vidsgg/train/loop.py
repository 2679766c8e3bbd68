"""Epoch-level training orchestration.

Mirrors the reference training skeleton (TEMPURA_train.py:132-379 /
TEATGT_train.py:115-300) re-arranged for the TPU pipeline:

* per video: one jitted train step; when memory/uncertainty is enabled, one
  jitted ``unc=True`` forward whose outputs fold into the device-resident
  memory accumulator (no .npy round trips);
* per epoch: validation through the mode-aware EvalPipeline + exact
  evaluator, checkpoints every 5 epochs and on best R@20 / mR@20, LR
  schedule stepped per epoch (inside the optax schedule), epoch-end memory
  bank finalization injected into the train state.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from vidsgg.data.entry import Entry, EntryCapacity
from vidsgg.debias import MemoryAccumulator, accumulate_memory, finalize_memory
from vidsgg.eval import get_ag_evaluators
from vidsgg.eval.temporal import (
    evaluate_temporal_consistency,
    temporal_consistency_summary,
)
from vidsgg.train.checkpoint import save_checkpoint
from vidsgg.train.eval_pipeline import EvalPipeline
from vidsgg.train.metrics import MetricsWriter
from vidsgg.train.state import TrainState, obj_memory_dim
from vidsgg.train.steps import LossFlags, eval_step_jit, make_train_step

# accumulate_memory is pure device math (debias/memory.py docstring: "call
# under jit") — unjitted it dispatches dozens of small ops per video
accumulate_memory_jit = jax.jit(accumulate_memory, static_argnums=(3, 4, 5))


def _accumulate_memory_batch(acc, batch_entry, batch_out, rel_wt, obj_wt,
                             obj_compute):
    """Fold a stacked batch of (entry, unc-forward output) pairs into the
    memory accumulator — a scan over the batch axis of the data-parallel
    uncertainty pass (same algebra as the per-video fold)."""

    def body(a, eo):
        e, o = eo
        return accumulate_memory(a, e, o, rel_wt, obj_wt, obj_compute), None

    acc, _ = jax.lax.scan(body, acc, (batch_entry, batch_out))
    return acc


accumulate_memory_batch_jit = jax.jit(
    _accumulate_memory_batch, static_argnums=(3, 4, 5)
)


def _entry_sig(entry) -> tuple:
    """Shape/dtype signature — entries from the same capacity bucket share
    one signature and can stack into one data-parallel batch."""
    from vidsgg.runtime.parallel import tree_shape_sig

    return tree_shape_sig(entry)


class MetricWindow(list):
    """Sliding window of per-step metric dicts (device scalars). Bounded to
    the last ``size`` entries: only those are ever read at log time, and
    each dict pins live device buffers — unbounded growth held ~50k tiny
    buffers per AG epoch."""

    def __init__(self, size: int):
        super().__init__()
        self.size = max(int(size), 1)

    def push(self, metrics: dict):
        self.append(metrics)
        del self[: -self.size]


@dataclasses.dataclass
class TrainLoopConfig:
    mode: str = "predcls"
    nepoch: int = 10
    log_iter: int = 100
    save_path: str = "checkpoint/"
    rel_mem_weight_type: str = "simple"
    obj_mem_weight_type: str = "simple"
    obj_mem_compute: bool = False
    mem_enabled: bool = True
    compute_temporal_consistency: bool = True
    # >1 enables data-parallel training: same-bucket videos batch into
    # groups of this size, sharded over a 1-D ICI mesh (runtime/parallel.py)
    # with one optimizer step per group (gradients averaged across the
    # group's videos — the standard multi-chip generalization of the
    # reference's one-video steps). Epoch remainders fall back to the
    # single-device step; validation shards the same way in every mode
    # (predcls forward, sgcls/sgdet fused stages vmapped over the batch).
    data_parallel: int = 1


VideoBatch = tuple[Entry, np.ndarray, list]  # (entry, fmaps, gt_annotation)


def run_training(
    state: TrainState,
    flags: LossFlags,
    loop_cfg: TrainLoopConfig,
    train_data: Callable[[], Iterable[VideoBatch]],
    val_data: Callable[[], Iterable[VideoBatch]],
    cap: EntryCapacity,
    writer: MetricsWriter,
    rng,
    model_cfg=None,
) -> TrainState:
    train_step = make_train_step(flags)
    pipeline = EvalPipeline(loop_cfg.mode, cap)
    best_recall, best_mrecall = 0.0, 0.0
    obj_dim = obj_memory_dim(model_cfg) if model_cfg is not None else 1024

    dp = max(int(loop_cfg.data_parallel), 1)
    par_step = par_unc = par_eval = par_fused = stack_entries = None
    if dp > 1:
        from vidsgg.runtime.mesh import make_mesh, replicate_sharding
        from vidsgg.runtime.parallel import (
            make_parallel_eval_step,
            make_parallel_train_step,
            stack_entries,
        )

        mesh = make_mesh(dp)
        par_step = make_parallel_train_step(flags, mesh)
        par_eval = make_parallel_eval_step(mesh)
        if loop_cfg.mem_enabled:
            par_unc = make_parallel_eval_step(mesh, unc=True)
        # the sharded-validation jit must be built ONCE here — a fresh
        # wrapper per epoch would retrace + recompile the fused eval
        # program (minutes on TPU) every validation pass
        par_fused = None
        if loop_cfg.mode == "sgcls":
            from vidsgg.runtime.parallel import make_parallel_sgcls_eval_step

            par_fused = make_parallel_sgcls_eval_step(mesh)
        elif loop_cfg.mode == "sgdet":
            from vidsgg.runtime.parallel import make_parallel_sgdet_eval_step

            par_fused = make_parallel_sgdet_eval_step(mesh)
        state = jax.device_put(state, replicate_sharding(mesh))

    step_i = 0
    for epoch in range(loop_cfg.nepoch):
        acc = MemoryAccumulator.zeros(obj_dim=obj_dim)
        window = MetricWindow(loop_cfg.log_iter)
        epoch_steps = 0
        videos_seen = 0
        t0 = time.time()

        def log_metrics(metrics, n_videos):
            nonlocal step_i, epoch_steps, videos_seen
            # keep device scalars; fetch one batched transfer per log window
            # (a per-metric float() here costs one ~28 ms tunnel round trip
            # EACH — it made the loop ~15x slower than the train step)
            window.push(metrics)
            step_i += 1
            epoch_steps += 1
            videos_seen += n_videos
            if step_i % loop_cfg.log_iter == 0:
                recent = jax.device_get(window[-loop_cfg.log_iter:])
                mean = {
                    k: float(np.mean([w[k] for w in recent]))
                    for k in recent[-1]
                }
                dt = (time.time() - t0) / max(videos_seen, 1)
                writer.text(
                    f"epoch {epoch} step {step_i}  {dt:.3f}s/video  "
                    + "  ".join(f"{k}={v:.4f}" for k, v in mean.items())
                )
                writer.scalars(
                    {
                        "att_loss": mean.get("attention_relation_loss", 0.0),
                        "spatial_loss": mean.get("spatial_relation_loss", 0.0),
                        "contact_loss": mean.get("contacting_relation_loss", 0.0),
                        "total_loss": mean.get("total_loss", 0.0),
                    },
                    step_i,
                )

        def single_video_step(state, acc, entry, rng):
            state, metrics = train_step(state, entry, rng)
            if loop_cfg.mem_enabled:
                out_unc = eval_step_jit(state, entry, True)
                acc = accumulate_memory_jit(
                    acc, entry, out_unc,
                    loop_cfg.rel_mem_weight_type, loop_cfg.obj_mem_weight_type,
                    loop_cfg.obj_mem_compute,
                )
            return state, acc, metrics

        pending: dict[tuple, list] = {}
        for entry, fmaps, gt in train_data():
            rng, sub = jax.random.split(rng)
            if dp > 1:
                group = pending.setdefault(_entry_sig(entry), [])
                group.append(entry)
                if len(group) < dp:
                    continue
                batch = stack_entries(group)
                group.clear()
                state, metrics = par_step(
                    state, batch, jax.random.split(sub, dp)
                )
                if loop_cfg.mem_enabled:
                    out_unc = par_unc(state, batch)
                    acc = accumulate_memory_batch_jit(
                        acc, batch, out_unc,
                        loop_cfg.rel_mem_weight_type,
                        loop_cfg.obj_mem_weight_type,
                        loop_cfg.obj_mem_compute,
                    )
                log_metrics(metrics, dp)
            else:
                state, acc, metrics = single_video_step(state, acc, entry, sub)
                log_metrics(metrics, 1)
        # epoch remainder: groups that never filled flush through the
        # single-device step (the replicated state is a valid input to it)
        for group in pending.values():
            for entry in group:
                rng, sub = jax.random.split(rng)
                state, acc, metrics = single_video_step(state, acc, entry, sub)
                log_metrics(metrics, 1)
        pending.clear()

        # honest skip accounting (over-capacity videos dropped by the source)
        stats = getattr(train_data, "stats", None)
        if stats is not None and (stats.yielded or stats.skipped):
            writer.scalar("skipped_videos", stats.skipped, epoch)
            writer.scalar("skip_rate", stats.skip_rate, epoch)
            if stats.bucket_counts:
                writer.text(
                    f"epoch {epoch} buckets: "
                    + ", ".join(
                        f"{k}f={v}" for k, v in sorted(stats.bucket_counts.items())
                    )
                    + f"  skipped={stats.skipped}"
                )

        # ---- validation ----
        ev_with, ev_semi, ev_no = get_ag_evaluators(loop_cfg.mode)
        tc_s, tc_c = [], []

        def consume_pred(pred, gt):
            for ev in (ev_with, ev_semi, ev_no):
                ev.evaluate_scene_graph(gt, pred)
            if loop_cfg.compute_temporal_consistency and loop_cfg.mode != "sgdet":
                s, c = evaluate_temporal_consistency(pred, loop_cfg.mode)
                if s is not None:
                    tc_s.extend(s)
                    tc_c.extend(c)

        shard_val = dp > 1 and loop_cfg.mode in ("predcls", "sgcls", "sgdet")
        if shard_val:
            # predcls eval is one jit region per video, and the sgcls/sgdet
            # fused stages (classify -> device postprocess -> relation) are
            # too — shard whole-video batches over the mesh, pull ONE
            # batched transfer, then slice per video for the host evaluator.
            # sgcls/sgdet group additionally by fmap canvas so the
            # union-refeaturize input stacks; sgdet videos whose device
            # postprocess overflows fall back per-video through the
            # pipeline (same fallback as the unsharded fused stage).
            from vidsgg.eval.adapter import to_eval_pred
            from vidsgg.train.eval_pipeline import EvalPipeline as _EP

            val_pending: dict[tuple, list] = {}
            for entry, fmaps, gt in val_data():
                sig = _entry_sig(entry)
                if loop_cfg.mode in ("sgcls", "sgdet"):
                    sig = sig + (tuple(np.shape(fmaps)),)
                group = val_pending.setdefault(sig, [])
                group.append((entry, fmaps, gt))
                if len(group) < dp:
                    # bound device memory: each buffered row pins its base
                    # feature map (hundreds of MB at the 64-frame bucket);
                    # past the cap, drain the oldest OTHER group through the
                    # single-video pipeline (same as end-of-epoch remainders)
                    while sum(len(g) for g in val_pending.values()) > 4 * dp:
                        key = next(
                            (k for k, g in val_pending.items()
                             if g and k != sig),
                            None,
                        )
                        if key is None:
                            break
                        for e, f, g in val_pending.pop(key):
                            consume_pred(pipeline(state, e, f, gt_entry=e), g)
                    continue
                batch = stack_entries([e for e, _, _ in group])
                if loop_cfg.mode in ("sgcls", "sgdet"):
                    fmb = jnp.stack([jnp.asarray(f) for _, f, _ in group])
                    res = par_fused(state, batch, fmb)
                    if loop_cfg.mode == "sgdet":
                        entry2_b, out_b, ovf_b = res
                        ovf_b = np.asarray(ovf_b)
                    else:
                        entry2_b, out_b = res
                        ovf_b = np.zeros(len(group), bool)
                    entry2_b, out_b = jax.device_get((entry2_b, out_b))
                    for i, (e, f, g) in enumerate(group):
                        if ovf_b[i]:  # rare clean_class blow-up -> host path
                            consume_pred(
                                pipeline(state, e, f, gt_entry=e), g
                            )
                            continue
                        pred = to_eval_pred(
                            jax.tree.map(lambda a: a[i], entry2_b),
                            jax.tree.map(lambda a: a[i], out_b),
                            loop_cfg.mode,
                        )
                        consume_pred(_EP._attach_gt(pred, e), g)
                else:
                    out = jax.device_get(par_eval(state, batch))
                    for i, (e, _, g) in enumerate(group):
                        consume_pred(
                            to_eval_pred(e, jax.tree.map(lambda a: a[i], out),
                                         "predcls"),
                            g,
                        )
                group.clear()
            for group in val_pending.values():
                for e, f, g in group:
                    consume_pred(pipeline(state, e, f, gt_entry=e), g)
        else:
            for entry, fmaps, gt in val_data():
                consume_pred(pipeline(state, entry, fmaps, gt_entry=entry), gt)
        recall = ev_with.recall_at(20)
        mrecall = ev_with.calc_mrecall()[20]
        writer.text(
            f"epoch {epoch} val: R@20={recall:.4f} mR@20={mrecall:.4f} "
            f"(semi R@20={ev_semi.recall_at(20):.4f}, no R@20={ev_no.recall_at(20):.4f})",
            val=True,
        )
        for name, ev in (("with", ev_with), ("semi", ev_semi), ("no", ev_no)):
            for k in ev.KS:
                writer.scalar(f"{name}_R@{k}", ev.recall_at(k), epoch)
                writer.scalar(f"{name}_MR@{k}", ev.mean_recall_at(k), epoch)
        if tc_s:
            tc = temporal_consistency_summary(np.array(tc_s), np.array(tc_c))
            writer.scalar("temporal_consistency", tc["combined"], epoch)

        # ---- checkpoints (every 5 epochs + best R/mR, ref :296-349) ----
        if epoch % 5 == 0:
            save_checkpoint(loop_cfg.save_path, state, f"checkpoint_{epoch}")
        if recall > best_recall:
            best_recall = recall
            writer.text(f"new best recall {recall:.4f} at epoch {epoch}", val=True)
            save_checkpoint(loop_cfg.save_path, state, "best_recall")
        if mrecall > best_mrecall:
            best_mrecall = mrecall
            writer.text(f"new best Mrecall {mrecall:.4f} at epoch {epoch}", val=True)
            save_checkpoint(loop_cfg.save_path, state, "best_Mrecall")

        # ---- epoch-end memory computation (ref :360-379) ----
        if loop_cfg.mem_enabled:
            rel_mem, obj_mem = finalize_memory(
                acc, loop_cfg.rel_mem_weight_type, loop_cfg.obj_mem_weight_type
            )
            state = state.with_memory(rel_mem, obj_mem)

    # the reference computes memory banks AFTER its epoch checkpoints, so
    # the final epoch's banks are never on disk; persist them explicitly
    save_checkpoint(loop_cfg.save_path, state, "checkpoint_final")
    return state
