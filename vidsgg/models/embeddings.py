"""Class-name word embeddings (GloVe stand-in).

The reference initializes its label-embedding tables from a cached
glove.6B.200d lookup with a longest-prefix fallback
(tools/utils/word_vectors.py:21-111; the cache itself is gitignored data).
Here the loader prefers an ``.npz`` asset (``{name: vector}``) when present
and otherwise falls back to deterministic per-name pseudo-vectors (seeded by
a stable hash of the class name) — these tables are trainable parameters in
both stacks, so only the initialization differs.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

WV_DIM = 200


def _pseudo_vector(name: str, dim: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.randn(dim).astype(np.float32)


def obj_edge_vectors(names, wv_dim: int = WV_DIM, wv_path: str | None = None) -> np.ndarray:
    """[len(names), wv_dim] embedding table.

    Mirrors the reference's lookup-with-fallback: the exact name first, then
    the segment before '/' (word_vectors.py fallback for the merged classes
    like 'cup/glass/bottle').
    """
    table = {}
    path = wv_path or os.environ.get("VIDSGG_WORD_VECTORS", "")
    if path and os.path.exists(path):
        data = np.load(path)
        table = {k: np.asarray(data[k], np.float32) for k in data.files}

    out = np.zeros((len(names), wv_dim), np.float32)
    for i, name in enumerate(names):
        key = name if name in table else name.split("/")[0]
        if key in table:
            out[i] = table[key][:wv_dim]
        else:
            out[i] = _pseudo_vector(name, wv_dim)
    return out
