"""Deduplication operators for training-data pipelines.

The reference's dedup is exact unique-index identity
(``mongodb.go:84-115``; duplicate-key-as-success
``crawler_service.go:447-453``). At corpus scale a training-data engine
needs the approximate family too. All operators follow the same shape:
vectorized per-batch signature computation inside ``map_batches``, a
``groupby`` ONLY over the (small) signature/bucket space, and pairwise
verification confined to candidate groups — the shuffle moves signatures,
never the corpus.

Scale notes (honest assumptions, per SURVEY.md §7.4):
* LSH candidate-pair sets are assumed << corpus (standard near-dup
  regime); the final union-find over *verified pairs* runs on the driver.
  If a dataset produced pathological pair counts, the label-propagation
  variant (iterated groupby-min) replaces it.
* Exact dedup hash-partitions by content hash — one shuffle of (hash,
  id) pairs, not of documents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import hash_strings
from ..functions.textstats import (
    char_shingles,
    jaccard_ngrams,
    lsh_band_keys,
    minhash_signature,
    simhash64,
)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
def exact_dedup(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """One row per distinct ``text_col`` value, keeping the minimum id —
    hash-partition + per-group first (SURVEY.md §2.8 layer-1 analog).
    Returns (content_hash, keep_id, dups)."""

    def sig(t: pa.Table) -> pa.Table:
        # int64 bit-view: Ray's groupby key conversion rejects uint64 > 2^63
        h = hash_strings(t[text_col]).view(np.int64)
        return pa.table(
            {
                "content_hash": pa.array(h, type=pa.int64()),
                id_col: t[id_col],
            }
        )

    from ray.data.aggregate import Count, Min

    return (
        ds.map_batches(sig, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name="keep_id"), Count(alias_name="dups"))
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------
def minhash_stage(t: pa.Table, *, text_col: str, id_col: str,
                  n_perm: int = 64, n_bands: int = 16) -> pa.Table:
    """map_batches task: text → MinHash signature + LSH band keys.
    Stateless (permutation coefficients are an lru-cached function of the
    seed) — a task pool avoids the actor-pool startup cost this tiny
    stage would otherwise pay. Shingling is the only per-row step
    (variable-length text); signatures and band keys are batch-level
    numpy ops."""
    texts = t[text_col].to_pylist()
    ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
    sigs = np.empty((len(texts), n_perm), dtype=np.uint64)
    for i, txt in enumerate(texts):
        sigs[i] = minhash_signature(char_shingles(txt), n_perm)
    keys = lsh_band_keys(sigs, n_bands)  # (n_docs, n_bands) uint64
    sig_bytes = [s.tobytes() for s in sigs]
    return pa.table(
        {
            id_col: pa.array(np.repeat(ids, n_bands), type=pa.int64()),
            # int64 bit-view: Ray groupby keys must fit signed 64-bit
            "band_key": pa.array(keys.reshape(-1).view(np.int64), type=pa.int64()),
            "sig": pa.array(
                [sig_bytes[i] for i in range(len(texts)) for _ in range(n_bands)],
                type=pa.binary(),
            ),
        }
    )


def minhash_candidates(ds: rd.Dataset, text_col: str, id_col: str,
                       n_perm: int = 64, n_bands: int = 16,
                       max_bucket: int = 64) -> rd.Dataset:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.
    shingle → minhash → band → bucket groupby (the guide's canonical
    shape); pairs are emitted per bucket with estimated signature
    similarity.

    ``max_bucket``: buckets larger than this are skipped (standard
    stop-bucket practice — a band bucket shared by a large fraction of
    the corpus is a stop-shingle artifact, and emitting its O(n²) pairs
    would dominate the run without finding real near-dups)."""

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        if len(g) > max_bucket:  # stop-bucket: skip
            return pd.DataFrame(
                {"id_a": pd.Series(dtype=np.int64),
                 "id_b": pd.Series(dtype=np.int64),
                 "est_sim": pd.Series(dtype=np.float64)}
            )
        ids = g[id_col].to_numpy()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        a_out, b_out, est = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(int(ids[i]))
                b_out.append(int(ids[j]))
                est.append(float((sigs[i] == sigs[j]).mean()))
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "est_sim": est})

    sigs = ds.map_batches(
        minhash_stage,
        fn_kwargs=dict(text_col=text_col, id_col=id_col, n_perm=n_perm, n_bands=n_bands),
        batch_format="pyarrow",
        batch_size=1024,
    )
    return sigs.groupby("band_key").map_groups(pairs_of_group, batch_format="pandas")


def minhash_dedup_groups(
    docs: pd.DataFrame, pairs: pd.DataFrame, text_col: str, id_col: str,
    threshold: float = 0.8,
) -> pd.DataFrame:
    """Verify candidates with word-3-gram Jaccard, then union-find the
    verified pairs into groups. Driver-side on the (small) pair set."""
    texts = dict(zip(docs[id_col], docs[text_col]))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    seen_pairs = set()
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        if (a, b) in seen_pairs:
            continue
        seen_pairs.add((a, b))
        if jaccard_ngrams(texts[a], texts[b]) >= threshold:
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    rows = [(int(i), find(int(i))) for i in docs[id_col]]
    return pd.DataFrame(rows, columns=[id_col, "group_id"])


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------
def simhash_table(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """Per-doc 64-bit SimHash plus 4×16-bit band keys: docs equal in any
    band are candidates within Hamming distance ≤ 3 of each other
    (pigeonhole), the standard banded SimHash search layout."""

    def sig(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        sh = np.array([simhash64(x) for x in texts], dtype=np.uint64)
        cols = {
            id_col: t[id_col],
            "simhash": pa.array(sh, type=pa.uint64()),
        }
        for b in range(4):
            cols[f"band{b}"] = pa.array(
                (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF), type=pa.uint64()
            )
        return pa.table(cols)

    return ds.map_batches(sig, batch_format="pyarrow")


# --------------------------------------------------------------------------
# embedding cosine near-dup (exact, broadcast)
# --------------------------------------------------------------------------
class CosinePairs:
    """map_batches actor: batch rows × broadcast normalized matrix →
    pairs with cosine ≥ threshold. The small side (the full normalized
    embedding matrix) is ray.put once and fetched per actor, not per
    batch (broadcast-join shape, SURVEY.md J-rules)."""

    def __init__(self, mat_ref, ids_ref, threshold: float):
        import ray

        self.mat = ray.get(mat_ref)  # (N, d) float32, L2-normalized
        self.ids = ray.get(ids_ref)
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vecs = vecs / norms
        sims = vecs @ self.mat.T  # (batch, N)
        a_out, b_out, s_out = [], [], []
        for i in range(len(ids)):
            hits = np.flatnonzero(sims[i] >= self.threshold)
            for j in hits:
                if self.ids[j] > ids[i]:  # i<j once, no self-pairs
                    a_out.append(int(ids[i]))
                    b_out.append(int(self.ids[j]))
                    s_out.append(float(sims[i, j]))
        return pa.table(
            {
                "id_a": pa.array(a_out, type=pa.int64()),
                "id_b": pa.array(b_out, type=pa.int64()),
                "cosine": pa.array(s_out, type=pa.float64()),
            }
        )


def embedding_dedup_pairs(ds: rd.Dataset, threshold: float = 0.95) -> rd.Dataset:
    """Exact cosine near-dup pairs over an embedding column."""
    import ray

    full = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    mat = np.asarray(full["embedding"].to_list(), dtype=np.float32)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat_ref = ray.put(mat / norms)
    ids_ref = ray.put(full["vec_id"].to_numpy(dtype=np.int64))
    return ds.map_batches(
        CosinePairs,
        fn_constructor_args=(mat_ref, ids_ref, threshold),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    )
