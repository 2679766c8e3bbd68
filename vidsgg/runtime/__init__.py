"""Runtime: device mesh + pjit data parallelism, input pipeline, bench."""

from vidsgg.runtime.mesh import make_mesh, replicate_sharding, data_sharding  # noqa: F401
from vidsgg.runtime.parallel import make_parallel_train_step, stack_entries  # noqa: F401
