"""Sharded page-store actors — the simulated content store / KV service.

The reference fetches payloads over the network per work unit
(``ethereum_service.go:142-185``); the sandbox replacement is a pool of
long-lived actors, each owning one hash range of the pages corpus
(``url_hash % n_shards``). A fetch is a scatter-gather of point lookups
— O(batch) per batch, never O(corpus) — which is the honest shape of a
distributed content store and keeps per-round cost proportional to the
round.

Two residency modes (``extra["store_mode"]``):

* ``preload`` (default) — each shard decodes its buckets' pages into a
  dict once per run. Fastest lookups; memory = corpus/n_shards.
* ``lazy`` — the 100-TB shape: each shard holds ONLY a
  ``url_hash → (file, row_group)`` index (8+4 bytes per page, built
  from one thin pass over the url column) and reads row groups on
  demand through a bounded LRU of decoded groups. Memory is
  index + LRU, independent of corpus payload size.

Both modes share the packed-buffer fetch protocol and are
cross-validated by tests (lazy crawl output == preload crawl output).
"""

from __future__ import annotations

import collections
import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..functions.hashing import hash_strings


@ray.remote(num_cpus=0, max_restarts=2, max_task_retries=-1)
class PageStoreShard:
    """Owns the pages whose url_hash % n_shards == shard_id.

    Restart-safe for free: the constructor re-reads the (immutable)
    fetch index, so a restarted shard is bit-identical and in-flight
    fetch calls transparently retry (max_task_retries=-1) — the
    Ray-native analog of the reference's reconnect-all health check
    (crawler_service.go:855-861)."""

    def __init__(self, index_dir: str, n_buckets: int, n_shards: int,
                 shard_id: int, mode: str = "preload", lru_groups: int = 64):
        self.mode = mode
        self.store: dict[str, tuple[int, bytes, str]] = {}
        # lazy-mode state: sorted url_hash array + parallel (file_id,
        # row_group) locators; LRU of decoded row-group dicts
        self._files: list[str] = []
        self._idx_hash = np.empty(0, dtype=np.uint64)
        self._idx_loc = np.empty((0, 2), dtype=np.int32)
        self._lru: "collections.OrderedDict[tuple, dict]" = collections.OrderedDict()
        self._lru_groups = lru_groups
        self._n_pages = 0
        # buckets are a finer partition than shards: shard j owns every
        # bucket b with b % n_shards == j (n_buckets must be a multiple)
        paths = []
        for b in range(n_buckets):
            if b % n_shards != shard_id:
                continue
            paths.extend(
                sorted(glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet")))
            )
        self.load_files(paths)

    # --- loading ----------------------------------------------------------
    def _load_file_preload(self, path: str) -> int:
        t = pq.read_table(path, columns=["url", "warc_ts", "html", "lang"])
        for u, ts, h, lg in zip(
            t["url"].to_pylist(),
            t["warc_ts"].cast(pa.int64()).to_pylist(),
            t["html"].to_pylist(),
            t["lang"].to_pylist(),
        ):
            self.store[u] = (ts, h, lg)
        return len(t)

    def _load_file_lazy(self, path: str) -> int:
        """One THIN pass over the url column per row group → index
        entries (url_hash, file_id, row_group). Payload bytes stay on
        disk until a fetch touches their row group."""
        fid = len(self._files)
        self._files.append(path)
        pf = pq.ParquetFile(path)
        hashes, locs = [], []
        for rg in range(pf.metadata.num_row_groups):
            urls = pf.read_row_group(rg, columns=["url"])["url"]
            h = hash_strings(urls)
            hashes.append(h)
            locs.append(
                np.column_stack(
                    [np.full(len(h), fid, dtype=np.int32),
                     np.full(len(h), rg, dtype=np.int32)]
                )
            )
        n = 0
        if hashes:
            h = np.concatenate(hashes)
            loc = np.vstack(locs)
            n = len(h)
            allh = np.concatenate([self._idx_hash, h])
            allloc = np.vstack([self._idx_loc, loc])
            order = np.argsort(allh, kind="stable")
            self._idx_hash = allh[order]
            self._idx_loc = allloc[order]
        return n

    def load_files(self, paths: list[str]) -> int:
        """Initial + incremental (watch-mode) loading. Restart-safe for
        free — the files live under the index dir, so a restarted
        shard's __init__ re-reads them."""
        if self.mode == "lazy":
            n = sum(self._load_file_lazy(p) for p in paths)
        else:
            n = sum(self._load_file_preload(p) for p in paths)
        self._n_pages += n
        return n

    # --- lookups ----------------------------------------------------------
    def _row_group(self, fid: int, rg: int) -> dict:
        key = (fid, rg)
        got = self._lru.get(key)
        if got is not None:
            self._lru.move_to_end(key)
            return got
        t = pq.ParquetFile(self._files[fid]).read_row_group(
            rg, columns=["url", "warc_ts", "html", "lang"]
        )
        got = {
            u: (ts, h, lg)
            for u, ts, h, lg in zip(
                t["url"].to_pylist(),
                t["warc_ts"].cast(pa.int64()).to_pylist(),
                t["html"].to_pylist(),
                t["lang"].to_pylist(),
            )
        }
        self._lru[key] = got
        while len(self._lru) > self._lru_groups:
            self._lru.popitem(last=False)
        return got

    def _get_many(self, urls: list[str]) -> list:
        if self.mode != "lazy":
            return [self.store.get(u) for u in urls]
        h = hash_strings(urls)
        pos = np.searchsorted(self._idx_hash, h)
        out: list = [None] * len(urls)
        # group row-group reads: decode each touched group once
        by_group: dict[tuple, list[int]] = {}
        for i in range(len(urls)):
            p = pos[i]
            if p < len(self._idx_hash) and self._idx_hash[p] == h[i]:
                by_group.setdefault(
                    (int(self._idx_loc[p, 0]), int(self._idx_loc[p, 1])), []
                ).append(i)
        for (fid, rg), ixs in by_group.items():
            grp = self._row_group(fid, rg)
            for i in ixs:
                out[i] = grp.get(urls[i])
        return out

    def fetch(self, urls: list[str]):
        """Point lookups; None marks a miss (404 analog)."""
        return self._get_many(urls)

    def fetch_packed(self, urls: list[str]):
        """Batched lookup with ONE concatenated payload buffer — Ray
        zero-copies large buffers, while a list of thousands of small
        bytes objects pays per-object pickle cost (that serialization was
        the fetch stage's scaling ceiling)."""
        metas = self._get_many(urls)
        n = len(metas)
        found = np.array([m is not None for m in metas], dtype=bool)
        ts = np.array([m[0] if m else 0 for m in metas], dtype=np.int64)
        langs = [m[2] if m else "" for m in metas]
        sizes = np.array([len(m[1]) if m else 0 for m in metas], dtype=np.int64)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes, out=offs[1:])
        buf = b"".join(m[1] for m in metas if m is not None and len(m[1]))
        return found, ts, langs, offs, buf

    def health(self) -> dict:
        """SystemHealth analog (crawler_metrics.go:46-68)."""
        try:
            rec = ray.get_runtime_context().was_current_actor_reconstructed
        except Exception:
            rec = False
        from .resources import proc_rss_kb

        n = len(self.store) if self.mode == "preload" else self._n_pages
        tm = os.times()
        return {"reconstructed": bool(rec), "items": int(n),
                "cpu_s": float(tm.user + tm.system),
                "rss_kb": proc_rss_kb()}

    def count(self) -> int:
        return self._n_pages


class ActorPageStore:
    """Driver-side bundle; handles serialize into fetch-stage closures."""

    def __init__(self, index_dir: str, n_buckets: int, n_shards: int,
                 mode: str = "preload", lru_groups: int = 64,
                 num_cpus_each: float | None = None):
        from .resources import shard_cpu_reservation

        if n_buckets % n_shards != 0:
            raise ValueError("n_buckets must be a multiple of n_store_shards")
        if num_cpus_each is None:
            num_cpus_each = shard_cpu_reservation("store", n_shards)
        self.n_shards = n_shards
        self.handles = [
            PageStoreShard.options(num_cpus=num_cpus_each).remote(
                index_dir, n_buckets, n_shards, j, mode, lru_groups
            )
            for j in range(n_shards)
        ]

    def health(self) -> list[dict]:
        return ray.get([h.health.remote() for h in self.handles])

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
