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
    """Leading axis sharded across the data axis (and the DCN axis when the
    mesh is multi-slice — both axes partition the video batch)."""
    axes = tuple(n for n in (DCN_AXIS, DATA_AXIS) if n in mesh.axis_names)
    return NamedSharding(mesh, P(axes))


DCN_AXIS = "dcn"


def make_multislice_mesh(n_slices: int, devices=None) -> Mesh:
    """2-D (dcn, data) mesh for multi-slice pods: the outer axis crosses the
    data-center network, the inner axis rides ICI. Data parallelism shards
    videos over both axes; gradient all-reduce then hierarchically reduces
    within-slice over ICI before crossing DCN (XLA's default lowering for a
    2-D mesh reduction)."""
    devices = list(devices if devices is not None else jax.devices())
    per_slice = len(devices) // n_slices
    arr = np.array(devices[: n_slices * per_slice]).reshape(n_slices, per_slice)
    return Mesh(arr, (DCN_AXIS, DATA_AXIS))
