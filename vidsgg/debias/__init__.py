"""Debiasing: uncertainty-weighted memory banks (MDU) computed on device."""

from vidsgg.debias.memory import (  # noqa: F401
    MemoryAccumulator,
    accumulate_memory,
    finalize_memory,
    uncertainty_stats,
)
