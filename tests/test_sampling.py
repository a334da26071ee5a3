"""Tests for stages/sampling.py: hash sampling, stratified sampling,
weighted mixture — all deterministic, partition-invariant properties."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ethereum_raw_data_crawler_ray.stages.sampling import (
    _keyed_hash,
    hash_sample,
    stratified_sample,
    weighted_mixture,
)

RNG = np.random.default_rng(3)


def _docs(n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": RNG.choice(["en", "de", "fr", "sw"], size=n, p=[0.7, 0.15, 0.1, 0.05]),
        }
    )


class TestHashSample:
    def test_fraction_and_determinism(self):
        df = _docs(20_000)
        a = hash_sample(rd.from_pandas(df).repartition(4), "doc_id", 0.2, seed=5).to_pandas()
        b = hash_sample(rd.from_pandas(df).repartition(13), "doc_id", 0.2, seed=5).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # partition-invariant
        assert abs(len(a) / len(df) - 0.2) < 0.02

    def test_nested_fractions(self):
        """Same seed: the 10% sample is a subset of the 30% sample."""
        df = _docs(10_000)
        ds = rd.from_pandas(df)
        small = set(hash_sample(ds, "doc_id", 0.1, seed=9).to_pandas()["doc_id"])
        big = set(hash_sample(ds, "doc_id", 0.3, seed=9).to_pandas()["doc_id"])
        assert small <= big

    def test_seed_changes_sample(self):
        df = _docs(5_000)
        ds = rd.from_pandas(df)
        a = set(hash_sample(ds, "doc_id", 0.2, seed=1).to_pandas()["doc_id"])
        b = set(hash_sample(ds, "doc_id", 0.2, seed=2).to_pandas()["doc_id"])
        assert a != b


class TestStratifiedSample:
    def test_exact_counts_and_reference(self):
        df = _docs(8_000)
        out = stratified_sample(
            rd.from_pandas(df).repartition(7), "lang", "doc_id", 100, seed=4
        ).to_pandas()
        sizes = df["lang"].value_counts()
        got = out["lang"].value_counts()
        for lang, n in sizes.items():
            assert got[lang] == min(100, n), lang
        # the choice is exactly the n smallest keyed hashes per group
        df2 = df.copy()
        df2["__h"] = _keyed_hash(df2["doc_id"].to_numpy(), 4).astype(np.int64)
        ref = (
            df2.sort_values(["__h", "doc_id"], kind="mergesort")
            .groupby("lang", sort=False)
            .head(100)
        )
        assert sorted(out["doc_id"]) == sorted(ref["doc_id"])

    def test_partition_invariance(self):
        df = _docs(3_000)
        a = stratified_sample(rd.from_pandas(df).repartition(2), "lang", "doc_id", 30).to_pandas()
        b = stratified_sample(rd.from_pandas(df).repartition(11), "lang", "doc_id", 30).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])

    def test_small_group_taken_whole(self):
        df = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64), "lang": ["xx"] * 10})
        out = stratified_sample(rd.from_pandas(df), "lang", "doc_id", 50).to_pandas()
        assert sorted(out["doc_id"]) == list(range(10))


class TestWeightedMixture:
    def test_proportions_and_provenance(self):
        na, nb = 30_000, 10_000
        a = pd.DataFrame({"doc_id": np.arange(na, dtype=np.int64)})
        b = pd.DataFrame({"doc_id": np.arange(nb, dtype=np.int64) + 1_000_000})
        out = weighted_mixture(
            {"web": rd.from_pandas(a), "books": rd.from_pandas(b)},
            weights={"web": 1.0, "books": 1.0},
            counts={"web": na, "books": nb},
            total=8_000,
            key_col="doc_id",
            seed=2,
        ).to_pandas()
        by_src = out["source_name"].value_counts()
        # equal weights → ~4k from each source despite 3x size imbalance
        assert abs(by_src["web"] - 4_000) < 300
        assert abs(by_src["books"] - 4_000) < 300
        assert (out[out["source_name"] == "books"]["doc_id"] >= 1_000_000).all()

    def test_small_source_capped_at_full(self):
        a = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64)})
        b = pd.DataFrame({"doc_id": np.arange(10_000, dtype=np.int64) + 10_000})
        out = weighted_mixture(
            {"rare": rd.from_pandas(a), "big": rd.from_pandas(b)},
            weights={"rare": 0.5, "big": 0.5},
            counts={"rare": 100, "big": 10_000},
            total=5_000,
            key_col="doc_id",
        ).to_pandas()
        # rare source wants 2500 but only has 100 → rate capped at 1.0
        assert (out["source_name"] == "rare").sum() == 100
