"""Deterministic sampling operators for training-data pipelines.

All sampling here is HASH-BASED and seed-keyed, never RNG-state-based:
a row's fate depends only on (seed, key), so results are independent of
partitioning, stable under retries/resume (the crawl engine's
replay-safety discipline), and reproducible across cluster sizes.

- ``hash_sample``: Bernoulli p-sample by keyed hash threshold.  Nested:
  the p=0.1 sample is a SUBSET of the p=0.2 sample for the same seed
  (threshold monotonicity), which makes growing a training subset cheap.
- ``stratified_sample``: exactly min(n, |group|) rows per group, chosen
  as the n smallest keyed hashes in the group.  Heavy-hitters-style
  combiner: each batch forwards at most n candidate rows per group it
  contains (a batch-local top-n by hash), so the final per-group
  selection ranks ≤ n·n_batches candidate rows, never the full group.
- ``weighted_mixture``: union of per-source hash-samples with rates set
  to hit target mixture proportions.

Scale notes: no shuffle at all for hash_sample; stratified_sample's
only wide step is a groupby over the candidate rows (≤ n per group per
batch).  Skew-safe: a giant group contributes the same ≤ n rows per
batch as a small one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _keyed_hash(arr: np.ndarray, seed: int) -> np.ndarray:
    """uint64 hash of (seed, key) — splitmix-style finalizer over the
    pandas vectorized hash, so thresholds are uniform in [0, 2^64)."""
    x = pd.util.hash_array(np.asarray(arr)).astype(np.uint64)
    x ^= np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> 30)) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> 27)) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> 31)


def hash_sample(
    ds: rd.Dataset, key_col: str, fraction: float, *, seed: int = 0
) -> rd.Dataset:
    """Deterministic Bernoulli sample: keep rows whose keyed hash falls
    under fraction·2^64.  Streaming, shuffle-free, partition-invariant;
    nested across fractions at the same seed."""
    thresh = np.uint64(min(int(fraction * 2.0**64), 2**64 - 1))

    def f(t: pa.Table) -> pa.Table:
        h = _keyed_hash(t[key_col].to_numpy(zero_copy_only=False), seed)
        return t.filter(pa.array(h <= thresh))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(
    ds: rd.Dataset,
    group_col: str,
    key_col: str,
    n_per_group: int,
    *,
    seed: int = 0,
) -> rd.Dataset:
    """Exactly min(n_per_group, |group|) rows per group — the rows with
    the n smallest keyed hashes, so the choice is deterministic and
    partition-invariant.  Ties cannot occur for distinct keys (64-bit
    hash); duplicate keys tie-break by key order inside the final rank.
    """

    def candidates(t: pa.Table) -> pa.Table:
        h = _keyed_hash(t[key_col].to_numpy(zero_copy_only=False), seed)
        t = t.append_column("__h", pa.array(h.astype(np.int64)))
        df = t.to_pandas()
        # batch-local top-n per group: anything ranked below n here can
        # never be in the group's global smallest-n
        keep = df.groupby(group_col, sort=False)["__h"].rank(method="first") <= n_per_group
        return pa.Table.from_pandas(df[keep], preserve_index=False)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["__h", key_col], kind="mergesort")
            .head(n_per_group)
            .drop(columns="__h")
        )

    return (
        ds.map_batches(candidates, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(pick, batch_format="pandas")
    )


def weighted_mixture(
    sources: dict[str, rd.Dataset],
    weights: dict[str, float],
    counts: dict[str, int],
    total: int,
    key_col: str,
    *,
    seed: int = 0,
    source_col: str = "source_name",
) -> rd.Dataset:
    """Deterministic weighted mixture: from each source take an
    (expected) total·wᵢ/Σw rows via hash_sample at rate
    total·wᵢ/(Σw·nᵢ), tagging provenance.  ``counts`` are the source
    sizes (count() is a cheap metadata op for parquet sources)."""
    wsum = sum(weights.values())
    parts = []
    for name, src in sources.items():
        want = total * weights[name] / wsum
        rate = min(1.0, want / max(1, counts[name]))
        part = hash_sample(src, key_col, rate, seed=seed)
        parts.append(
            part.map_batches(
                lambda t, name=name: t.append_column(
                    source_col, pa.array([name] * len(t), type=pa.string())
                ),
                batch_format="pyarrow",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
