"""Data-parallel training step (pjit over a video batch).

The per-video computation is the same jit region as the single-chip step
(vidsgg.train.steps); here it is vmapped over a leading video axis and the
batch is sharded across the mesh's ``data`` axis while the train state is
replicated. XLA then partitions the vmapped forward/backward per device and
inserts one gradient all-reduce over ICI — no hand-written collectives.

BatchNorm running stats are updated per video under vmap and averaged across
the batch afterwards (the reference trains with batch = 1 video, so its BN
stats are per-video EMAs too; averaging across the parallel videos is the
natural multi-chip generalization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vidsgg.data.entry import Entry
from vidsgg.runtime.mesh import data_sharding, replicate_sharding
from vidsgg.train.state import TrainState
from vidsgg.train.steps import LossFlags, assemble_losses, performer_rng


@jax.jit
def _stack_trees(trees):
    """ONE dispatch stacking a tuple of same-structure pytrees on a new
    leading axis. Eager per-leaf ``jnp.stack`` pays ~a dispatch per leaf
    (~20 for an Entry, each a ~28 ms round trip through the axon tunnel —
    docs/PERF.md "Batch EVERY host<->device boundary")."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def stack_entries(entries: list[Entry]) -> Entry:
    """Stack same-capacity entries into a batched Entry pytree (one
    dispatch; one compile per (group size, bucket) combination)."""
    return _stack_trees(tuple(entries))


def tree_shape_sig(*trees) -> tuple:
    """Shape/dtype grouping key: pytrees may stack into one batch only when
    every leaf agrees on BOTH shape and dtype (``_stack_trees``'s contract).
    The single helper keeps the group-by-shape consumers — the dp train
    loop, paired sgdet serving, and the VidVRD chunk batcher — consistent."""
    return tuple(
        (tuple(np.shape(x)), str(getattr(x, "dtype", "")))
        for t in trees
        for x in jax.tree.leaves(t)
    )


def make_parallel_train_step(flags: LossFlags, mesh):
    repl = replicate_sharding(mesh)
    shard = data_sharding(mesh)

    def step_fn(state: TrainState, batch: Entry, rngs: jnp.ndarray):
        def one_video(entry, rng):
            d_rng, g_rng = jax.random.split(rng)

            def loss_fn_inner(params):
                out, mutated = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    entry,
                    phase="train",
                    unc=False,
                    rel_memory=state.rel_memory,
                    obj_memory=state.obj_memory,
                    mem_active=state.mem_active,
                    rngs={
                        "dropout": d_rng,
                        "gmm": g_rng,
                        "performer": performer_rng(
                            state.step, flags.performer_redraw_interval
                        ),
                    },
                    mutable=["batch_stats"],
                )
                losses = assemble_losses(out, entry, flags)
                return sum(losses.values()), (losses, mutated["batch_stats"])

            return loss_fn_inner

        def loss_fn(params):
            def fwd(entry, rng):
                total, aux = one_video(entry, rng)(params)
                return total, aux

            totals, (losses, stats) = jax.vmap(fwd)(batch, rngs)
            mean_losses = jax.tree.map(lambda x: x.mean(0), losses)
            mean_stats = jax.tree.map(lambda x: x.mean(0), stats)
            return totals.mean(), (mean_losses, mean_stats)

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
        )
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(
        step_fn,
        in_shardings=(repl, shard, shard),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_parallel_eval_step(mesh, unc: bool = False):
    """Data-parallel test-phase forward: a batch of featurized entries
    sharded over the mesh, params replicated. Returns the distribution dict
    batched on axis 0 (predcls; sgcls/sgdet eval interleaves host
    postprocessing and stays per-video). ``unc=True`` is the uncertainty
    pass feeding the memory accumulator (the reference's second no-grad
    forward, Uncertainty.py:91-95, one per sharded video)."""
    repl = replicate_sharding(mesh)
    shard = data_sharding(mesh)

    def step_fn(state: TrainState, batch: Entry):
        def fwd(entry):
            return state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                entry,
                phase="test",
                unc=unc,
                rel_memory=state.rel_memory,
                obj_memory=state.obj_memory,
                mem_active=state.mem_active,
            )

        return jax.vmap(fwd)(batch)

    return jax.jit(step_fn, in_shardings=(repl, shard), out_shardings=shard)


def make_parallel_sgcls_eval_step(mesh, needs_union: bool = True):
    """Data-parallel sgcls test step: the whole fused stage (OSPU classify
    -> on-device relabel/dedup/pair rebuild -> union refeaturize ->
    relation forward) vmapped over a video batch sharded on the mesh.
    Requires same-shape fmaps across the batch (same spatial canvas), so
    the caller groups by (entry bucket, canvas)."""
    from vidsgg.train.eval_pipeline import _sgcls_fused

    repl = replicate_sharding(mesh)
    shard = data_sharding(mesh)

    def step_fn(state: TrainState, batch: Entry, fmaps):
        def fwd(entry, fm):
            return _sgcls_fused(state, entry, fm, needs_union)

        return jax.vmap(fwd)(batch, fmaps)

    return jax.jit(
        step_fn, in_shardings=(repl, shard, shard), out_shardings=shard
    )


def make_parallel_sgdet_eval_step(mesh, needs_union: bool = True,
                                  union_ppf: int | None = None):
    """Data-parallel sgdet test step: the fused stage (OSPU classify ->
    on-device clean_class + grouped NMS + relabel + pair rebuild -> union
    refeaturize -> relation forward) vmapped over a video batch sharded on
    the mesh. Returns per-video overflow flags alongside (entry2, out);
    the caller re-runs overflowing videos through the single-device
    pipeline's host fallback, exactly like the unsharded fused stage."""
    from vidsgg.train.eval_pipeline import _sgdet_fused

    repl = replicate_sharding(mesh)
    shard = data_sharding(mesh)

    def step_fn(state: TrainState, batch: Entry, fmaps):
        def fwd(entry, fm):
            return _sgdet_fused(state, entry, fm, needs_union, union_ppf)

        return jax.vmap(fwd)(batch, fmaps)

    return jax.jit(
        step_fn, in_shardings=(repl, shard, shard), out_shardings=shard
    )


def make_generic_parallel_train_step(model, tx, mesh):
    """Data-parallel step for the VidVRD generic-pair relation model
    (:mod:`vidsgg.models.generic_rel`): a batch of same-capacity chunk
    entries sharded over the ``data`` axis, params replicated, one XLA
    gradient all-reduce. Loss is the mean of per-chunk masked BCE."""
    from vidsgg.models.generic_rel import predicate_bce_loss

    repl = replicate_sharding(mesh)
    shard = data_sharding(mesh)

    def step_fn(params, opt_state, batch, rngs):
        def loss_fn(params):
            def fwd(entry, rng):
                logits = model.apply(
                    {"params": params}, entry, deterministic=False,
                    rngs={"dropout": rng},
                )
                return predicate_bce_loss(logits, entry)

            return jax.vmap(fwd)(batch, rngs).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, shard, shard),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
