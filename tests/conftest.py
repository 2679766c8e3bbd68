"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is
validated on ``xla_force_host_platform_device_count=8`` per the standard JAX
recipe (SURVEY.md §4).

Note: this image pins ``JAX_PLATFORMS=axon`` globally and the axon plugin
re-asserts it at import time, so the env var alone is not enough — we must
also flip ``jax_platforms`` through jax.config before any backend is
initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
