"""Deterministic vectorized 64-bit hashing.

The analog of the reference's content-hash identity keys
(``entity.Block.Hash``, ``block.go:13``; unique indexes at
``mongodb.go:84-115``): every URL gets a stable uint64 hash used for
seen-set sharding, fetch-index bucketing and event dedup keys.

``pandas.util.hash_array`` (SipHash-1-3 with a fixed key) is vectorized,
deterministic across processes, and needs no extra dependency.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def hash_strings(values) -> np.ndarray:
    """uint64 hash per string. Accepts a pyarrow Array/ChunkedArray,
    numpy array, pandas Series or list."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = np.asarray(values.to_pandas(), dtype=object)
    elif isinstance(values, pd.Series):
        arr = np.asarray(values, dtype=object)
    else:
        arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, categorize=False)


def hash_one(value: str) -> int:
    return int(hash_strings([value])[0])


def mix64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Canonical seeded splitmix64 finalizer over uint64 keys — THE one
    integer-mix primitive (bucket routing, bloom probes, graph-pass
    checksums all route through here so a constant tweak can never
    desynchronize them)."""
    x = np.asarray(x).astype(np.uint64) + np.uint64(
        (seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    )
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))
