"""Train state: params + batch stats + optimizer + device-resident memory.

Unlike the reference — which dumps per-step embeddings to ``.npy`` files and
rebuilds memory banks from disk at epoch end (Uncertainty.py:74-79,105,147;
Memory.py) — the memory banks live in the train state as fixed-shape device
arrays, and ``mem_active`` gates the hallucinator until the first epoch-end
computation fills them.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vidsgg import constants as C
from vidsgg.data.entry import Entry
from vidsgg.models.ospu import OBJ_FEAT_DIM
from vidsgg.models.tempura import TempuraConfig

REL_FEATURE_DIM = 1936


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rel_memory: Any          # [26, 1936] joint bank (att/spatial/contact rows)
    obj_memory: jnp.ndarray  # [C-1, obj_dim]
    mem_active: jnp.ndarray  # [] bool
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def with_memory(self, rel_memory, obj_memory):
        return self.replace(
            rel_memory=rel_memory,
            obj_memory=obj_memory,
            mem_active=jnp.asarray(True),
        )


def obj_memory_dim(cfg: TempuraConfig) -> int:
    """2376 when tracking (memory attends pre-intermediate features), else
    1024 (TEMPURA_train.py:365-368)."""
    return OBJ_FEAT_DIM if cfg.tracking else 1024


def create_train_state(
    model, cfg: TempuraConfig, entry_template: Entry, rng, tx
) -> TrainState:
    rel_memory = jnp.zeros((C.NUM_PREDICATES, REL_FEATURE_DIM))
    obj_memory = jnp.zeros((cfg.num_classes - 1, obj_memory_dim(cfg)))
    p_rng, d_rng, g_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": p_rng, "dropout": d_rng, "gmm": g_rng},
        entry_template,
        phase="train",
        unc=False,
        rel_memory=rel_memory,
        obj_memory=obj_memory,
        mem_active=jnp.asarray(False),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rel_memory=rel_memory,
        obj_memory=obj_memory,
        mem_active=jnp.asarray(False),
        apply_fn=model.apply,
        tx=tx,
    )
