"""Device mesh utilities.

The reference has no distributed machinery at all (hardcoded ``cuda:0``,
SURVEY.md §2.4); scaling here is expressed the JAX way: a 1-D ``data`` mesh
over ICI, videos sharded along it, parameters replicated, XLA inserting the
psum for gradients. A second (currently trivial) ``model`` axis is carried
so tensor-parallel shardings can be layered in without changing call sites.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))
