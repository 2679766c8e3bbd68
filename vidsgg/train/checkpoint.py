"""Checkpointing (orbax).

Reference behavior (TEMPURA_train.py:296-349): save every 5 epochs plus on
best R@20 and best mR@20; the checkpoint carries the model weights AND the
memory banks. The reference's test scripts then forget to restore the banks
(TEMPURA_test.py:58-59 loads state_dict only — a latent bug, SURVEY.md §5.4);
here restoration is explicit and complete: params, batch stats, optimizer
state, step, memory banks, and mem_active all round-trip.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from vidsgg.train.state import TrainState


def _to_pytree(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rel_memory": state.rel_memory,
        "obj_memory": state.obj_memory,
        "mem_active": state.mem_active,
    }


def save_checkpoint(path: str, state: TrainState, name: str = "checkpoint"):
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, name), _to_pytree(state), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state: TrainState, name: str = "checkpoint") -> TrainState:
    """Restore into an existing (template) state."""
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree.map(np.asarray, _to_pytree(state))
    restored = ckptr.restore(os.path.join(os.path.abspath(path), name), template)
    return state.replace(**restored)
