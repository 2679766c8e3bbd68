"""Jitted train / eval steps with the reference's loss assembly.

Loss set (TEMPURA_train.py:190-218): attention CE + spatial/contacting BCE,
plus — for sgcls/sgdet — object CE (eos_coef-weighted) and the object
contrastive loss; optional relation contrastive ('ctl') losses at 0.2x; the
TEAT-GT temporal-consistency terms are weighted x2500 when present
(TEATGT_train.py:182-185).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from vidsgg.data.entry import Entry
from vidsgg.losses import contrastive_loss, masked_bce, masked_ce
from vidsgg.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class LossFlags:
    mode: str = "predcls"
    use_ctl_loss: bool = False
    obj_con_loss: str | None = None  # truthy => pml-style contrastive (ref)
    lambda_con: float = 1.0
    eos_coef: float = 1.0
    num_classes: int = 37
    use_cons_str_loss: bool = False
    use_cons_sem_loss: bool = False
    cons_weight: float = 2500.0
    # relation-contrastive ('ctl') assembly variant: the two train scripts
    # differ — TEMPURA uses 0.2x spatial+contact (TEMPURA_train.py:209-212,
    # attention commented out), TEAT-GT uses 0.25x and includes
    # attention_con_loss (TEATGT_train.py:176-179)
    ctl_variant: str = "tempura"
    # FAVOR+ projection redraw cadence (the reference's ProjectionUpdater):
    # the 'performer' RNG stream changes every N steps, so Performer
    # attention keeps one projection for N steps then redraws
    performer_redraw_interval: int = 1000


def performer_rng(step, interval: int):
    """Fixed-base key that changes exactly at redraw-interval boundaries."""
    return jax.random.fold_in(jax.random.PRNGKey(1123), step // interval)


def assemble_losses(out: dict, entry: Entry, flags: LossFlags) -> dict:
    losses = {}
    pm = entry.pair_mask
    if flags.mode in ("sgcls", "sgdet"):
        w = jnp.ones(flags.num_classes).at[0].set(flags.eos_coef)
        losses["object_loss"] = masked_ce(
            out["distribution"], entry.labels, entry.obj_mask, w
        )
        if flags.obj_con_loss:
            losses["object_contrastive_loss"] = flags.lambda_con * contrastive_loss(
                out["object_mem_features"], entry.labels, entry.obj_mask
            )
    losses["attention_relation_loss"] = masked_ce(
        out["attention_distribution"], entry.attention_gt, pm
    )
    losses["spatial_relation_loss"] = masked_bce(
        out["spatial_distribution"], entry.spatial_gt, pm
    )
    losses["contacting_relation_loss"] = masked_bce(
        out["contacting_distribution"], entry.contacting_gt, pm
    )
    if flags.use_ctl_loss:
        w = 0.25 if flags.ctl_variant == "teatgt" else 0.2
        if flags.ctl_variant == "teatgt":
            # TEATGT_train.py:177 — attention term keyed on the class index
            losses["attention_con_loss"] = w * contrastive_loss(
                out["attention_distribution"], entry.attention_gt, pm
            )
        losses["spatial_con_loss"] = w * contrastive_loss(
            out["spatial_distribution"], jnp.argmax(entry.spatial_gt, 1), pm
        )
        losses["contact_con_loss"] = w * contrastive_loss(
            out["contacting_distribution"], jnp.argmax(entry.contacting_gt, 1), pm
        )
    if flags.use_cons_str_loss and "structure_temp_loss" in out:
        losses["structure_temp_loss"] = out["structure_temp_loss"] * flags.cons_weight
    if flags.use_cons_sem_loss and "semantic_temp_loss" in out:
        losses["semantic_temp_loss"] = out["semantic_temp_loss"] * flags.cons_weight
    return losses


def make_train_step(flags: LossFlags):
    """Returns a jitted (state, entry, rng) -> (state, metrics) step."""

    def step_fn(state: TrainState, entry: Entry, rng):
        d_rng, g_rng = jax.random.split(rng)

        def loss_fn(params):
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
            total = sum(losses.values())
            return total, (losses, mutated)

        (total, (losses, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=mutated["batch_stats"],
            opt_state=opt_state,
        )
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def eval_step(state: TrainState, entry: Entry, unc: bool = False):
    """Forward in test phase (deterministic, running BN stats)."""
    return state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        entry,
        phase="test",
        unc=unc,
        rel_memory=state.rel_memory,
        obj_memory=state.obj_memory,
        mem_active=state.mem_active,
    )


eval_step_jit = jax.jit(eval_step, static_argnums=(2,))
