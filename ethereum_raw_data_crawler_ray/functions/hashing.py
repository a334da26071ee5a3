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
