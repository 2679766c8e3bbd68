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

import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Dozens of large-model jit programs accumulate across the suite in one
    process (several GB of host memory + compile caches on a 1-core box);
    drop them at module teardown."""
    yield
    jax.clear_caches()
    gc.collect()
