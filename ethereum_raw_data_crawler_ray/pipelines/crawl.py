"""The crawl round loop — the engine's flagship pipeline.

Ray-Data-native lifecycle (SURVEY.md §3.4), replacing the reference's
WebSocket-listener/scheduler/worker-pool loop (``scheduler_service.go``,
``crawler_service.go``) with a driver-side round loop where each round is
ONE streaming Dataset execution plus two small derived executions:

  round r (frontier_r on disk):
    main exec:   read frontier_r
                 → map_batches(PolitenessPhase1)          # robots + partial top-k
                 → groupby(pkey).map_groups(PolitenessFinal)  # host shuffle, final budgets
                 → map_batches(FetchSim actors)           # fetch-sim + extract
                 → write rounds/round=r   (tmp dir + atomic rename = the store commit)
    events exec: rounds_r[fetched] → projection → events/round=r
                 (written only after the store rename — the gating mirror
                  of publish-after-DB-success, crawler_service.go:592-607)
    frontier exec: carry(defer/skipped/retry) ∪ seen-filtered(discovered outlinks)
                 → frontier/round=r+1
    checkpoint:  seen shard dumps → seen/round=r ; per-shard lineage rows
                 → lineage/round=r (+_COMPLETE marker = round commit point)

Resume: max complete round R (lineage marker), reload seen/round=R,
continue at R+1 — bit-identical because no decision anywhere reads a wall
clock and every write is an idempotent tmp-dir + rename.

All state lives in the seen-shard actors or in checkpoint Parquet — never
in driver mutexes (the reference's single-process ceiling, SURVEY.md §4).
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Min

from ..config import CrawlConfig
from ..functions.hashing import hash_strings
from ..functions.urlnorm import normalize_many
from ..schema import FRONTIER, LINEAGE
from ..stages.fetch import STATUS_ERROR, STATUS_FETCHED, FetchSim, build_fetch_index
from ..state.politeness import (
    GATE_DEFER,
    GATE_FETCH,
    GATE_ROBOTS,
    GATE_SKIPPED,
    PolitenessFinal,
    PolitenessPhase1,
    load_robots,
)
from ..state.seen import ActorSeenSet, SeenFilterBatch

EPOCH0 = pa.scalar(0, type=pa.timestamp("us"))


def _atomic_write(ds: rd.Dataset, final_dir: str, **kwargs) -> int:
    """write_parquet to a tmp dir, fsync-free atomic rename. Returns row
    count from the written file metadata (no re-execution)."""
    tmp = final_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp, **kwargs)
    os.makedirs(tmp, exist_ok=True)  # a 0-row write creates nothing
    shutil.rmtree(final_dir, ignore_errors=True)
    os.rename(tmp, final_dir)
    return _count_rows(final_dir)


def _count_rows(parquet_dir: str) -> int:
    total = 0
    for root, _, files in os.walk(parquet_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def frontier_from_seeds(seeds: pa.Table) -> pa.Table:
    """Seed list → frontier rows (analog of START_BLOCK_NUMBER bootstrap,
    crawler_service.go:199-226). Malformed seed URLs are dropped."""
    urls, hosts, ok = normalize_many(seeds["url"].to_pylist())
    t = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "url_hash": pa.array(hash_strings(urls), type=pa.uint64()),
            "host": pa.array(hosts, type=pa.string()),
            "priority": seeds["priority"].cast(pa.int32()),
            "depth": seeds["depth"].cast(pa.int32()),
            "warc_ts": pa.array(np.zeros(len(urls), dtype=np.int64), type=pa.timestamp("us")),
            "attempts": pa.array(np.zeros(len(urls), dtype=np.int32), type=pa.int32()),
            "skip_until_round": pa.array(np.full(len(urls), -1, dtype=np.int32), type=pa.int32()),
        },
        schema=FRONTIER,
    )
    return t.filter(pa.array(ok))


class CrawlPipeline:
    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.out = cfg.out_dir
        self.seen: ActorSeenSet | None = None
        self.robots_ref = None

    # --- layout helpers ---------------------------------------------------
    def _p(self, *parts: str) -> str:
        return os.path.join(self.out, *parts)

    def _round_complete(self, r: int) -> bool:
        return os.path.exists(self._p("lineage", f"round_{r:05d}", "_COMPLETE"))

    def last_complete_round(self) -> int:
        r = -1
        while self._round_complete(r + 1):
            r += 1
        return r

    # --- setup ------------------------------------------------------------
    def close(self) -> None:
        """Release the seen-shard actors (state is on disk in seen/)."""
        if self.seen is not None:
            self.seen.kill()
            self.seen = None

    def prepare(self) -> None:
        cfg = self.cfg
        os.makedirs(self.out, exist_ok=True)
        build_fetch_index(cfg.pages_path, cfg.index_dir, cfg.n_fetch_buckets)
        robots = load_robots(cfg.extra["robots_path"]) if "robots_path" in cfg.extra else {}
        self.robots_ref = ray.put(robots)
        self.seen = ActorSeenSet(cfg.n_seen_shards, cfg.seen_shard_capacity)

    def bootstrap(self, seeds: pa.Table) -> None:
        """Write frontier/round=0 from the seed list, claiming seeds in
        the seen set (duplicate seeds collapse, mirror of dedup layer 1)."""
        t = frontier_from_seeds(seeds)
        hashes = np.asarray(t["url_hash"].to_pandas(), dtype=np.uint64)
        novel = self.seen.check_and_insert(hashes)
        t = t.filter(pa.array(novel))
        d = self._p("frontier", "round_00000")
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(t, os.path.join(tmp, "part-0.parquet"))
        shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)
        self.seen.save(self._p("seen", "bootstrap"))

    # --- one round --------------------------------------------------------
    def run_round(self, r: int) -> dict:
        cfg = self.cfg
        t0 = time.perf_counter()
        frontier_dir = self._p("frontier", f"round_{r:05d}")
        rounds_dir = self._p("rounds", f"round_{r:05d}")

        n_salt = int(cfg.extra.get("host_salt", 1))
        phase1_args = (
            self.robots_ref, r, cfg.round_ms, cfg.default_crawl_delay_ms,
            cfg.max_per_host_round, n_salt,
        )
        final_args = (
            self.robots_ref, cfg.round_ms, cfg.default_crawl_delay_ms,
            cfg.max_per_host_round, n_salt,
        )

        ds = (
            rd.read_parquet(frontier_dir)
            .map_batches(
                PolitenessPhase1,
                fn_constructor_args=phase1_args,
                batch_format="pandas",
                batch_size=8192,
                concurrency=(1, 4),
                num_cpus=0.5,
            )
            .groupby("pkey")
            .map_groups(
                PolitenessFinal,
                fn_constructor_args=final_args,
                batch_format="pandas",
                concurrency=(1, 4),
                num_cpus=0.5,
            )
            .map_batches(
                FetchSim,
                fn_constructor_args=(
                    cfg.index_dir,
                    cfg.n_fetch_buckets,
                    int(cfg.extra.get("error_permille", 0)),
                ),
                batch_format="pandas",
                batch_size=cfg.extract_batch_size,
                # autoscaling (min,max): a fixed pool sized to the node
                # deadlocks when the other stages need their CPUs too
                concurrency=(1, cfg.fetch_concurrency),
                num_cpus=cfg.cpus_per_fetch_actor,
            )
            .drop_columns(["pkey"])
            .map_batches(
                lambda t, r=r: t.append_column(
                    "round", pa.array(np.full(len(t), r, dtype=np.int32))
                ),
                batch_format="pyarrow",
            )
        )
        _atomic_write(ds, rounds_dir)

        # --- events (gated: written only after the rounds rename) --------
        ev = (
            rd.read_parquet(
                rounds_dir,
                columns=["url", "url_hash", "host", "page_ts", "n_bytes", "lang", "status"],
                filter=(pc.field("status") == STATUS_FETCHED),
            )
            .map_batches(self._event_project, batch_format="pyarrow", fn_kwargs={"r": r})
        )
        _atomic_write(ev, self._p("events", f"round_{r:05d}"))

        # --- next frontier ------------------------------------------------
        n_next = self._build_next_frontier(r, rounds_dir)

        # --- checkpoint: seen dumps + per-shard lineage -------------------
        digests = self.seen.save(self._p("seen", f"round_{r:05d}"))
        stats = self._lineage(r, rounds_dir, digests, time.perf_counter() - t0)
        stats["next_frontier"] = n_next
        return stats

    @staticmethod
    def _event_project(t: pa.Table, r: int) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "url_hash": t["url_hash"],
                "host": t["host"],
                "warc_ts": t["page_ts"],
                "n_bytes": t["n_bytes"],
                "lang": t["lang"],
                "round": pa.array(np.full(len(t), r, dtype=np.int32)),
            }
        )

    def _build_next_frontier(self, r: int, rounds_dir: str) -> int:
        cfg = self.cfg
        frontier_cols = [f.name for f in FRONTIER]

        # carry: deferred / skipped rows unchanged; errored rows retry,
        # then sit out a skip window at max_retries, then get one final
        # chance before permanent drop (mirror of
        # handleBlockProcessingError's failedBlocks→skippedBlocks,
        # scheduler_service.go:324-357, made terminating)
        def carry_fn(t: pa.Table) -> pa.Table:
            gate = np.asarray(t["gate"].to_pandas(), dtype=object)
            status = np.asarray(t["status"].to_pandas(), dtype=object)
            attempts = np.asarray(t["attempts"].to_pandas(), dtype=np.int32).copy()
            skip_until = np.asarray(
                t["skip_until_round"].to_pandas(), dtype=np.int32
            ).copy()
            keep = (gate == GATE_DEFER) | (gate == GATE_SKIPPED)
            err = (gate == GATE_FETCH) & (status == STATUS_ERROR)
            attempts[err] += 1
            skip_now = err & (attempts == cfg.max_retries)
            skip_until[skip_now] = r + 1 + cfg.skip_rounds
            dropped = err & (attempts > cfg.max_retries)  # permanent failure
            keep |= err & ~dropped
            t = t.set_column(
                t.schema.get_field_index("attempts"), "attempts",
                pa.array(attempts, type=pa.int32()),
            ).set_column(
                t.schema.get_field_index("skip_until_round"), "skip_until_round",
                pa.array(skip_until, type=pa.int32()),
            )
            return t.select(frontier_cols).filter(pa.array(keep))

        carry = (
            rd.read_parquet(rounds_dir, columns=frontier_cols + ["gate", "status"])
            .map_batches(carry_fn, batch_format="pyarrow")
        )

        # discovered: explode outlinks of fetched pages, normalize, dedup
        # per round (min over parents — deterministic), seen-filter (the
        # anti-join vs crawl history, SURVEY.md J5)
        def explode(t: pa.Table) -> pa.Table:
            parents_p = t["priority"].to_numpy()
            parents_d = t["depth"].to_numpy()
            parents_ts = t["page_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            links = t["outlinks"].to_pylist()
            urls, prio, depth, ts = [], [], [], []
            for i, ls in enumerate(links):
                for u in ls or ():
                    urls.append(u)
                    prio.append(parents_p[i])
                    depth.append(parents_d[i] + 1)
                    ts.append(parents_ts[i])
            norm, hosts, ok = normalize_many(urls)
            t2 = pa.table(
                {
                    "url": pa.array(norm, type=pa.string()),
                    "host": pa.array(hosts, type=pa.string()),
                    "priority": pa.array(np.array(prio, dtype=np.int32)),
                    "depth": pa.array(np.array(depth, dtype=np.int32)),
                    "warc_ts_us": pa.array(np.array(ts, dtype=np.int64)),
                }
            )
            return t2.filter(pa.array(ok))

        def finish_discovered(t: pa.Table) -> pa.Table:
            n = len(t)
            urls = t["url"]
            return pa.table(
                {
                    "url": urls.cast(pa.string()),
                    "url_hash": pa.array(hash_strings(urls), type=pa.uint64()),
                    "host": t["host"].cast(pa.string()),
                    "priority": t["min(priority)"].cast(pa.int32()),
                    "depth": t["min(depth)"].cast(pa.int32()),
                    "warc_ts": t["min(warc_ts_us)"].cast(pa.int64()).cast(pa.timestamp("us")),
                    "attempts": pa.array(np.zeros(n, dtype=np.int32)),
                    "skip_until_round": pa.array(np.full(n, -1, dtype=np.int32)),
                },
                schema=FRONTIER,
            )

        discovered = (
            rd.read_parquet(
                rounds_dir,
                columns=["priority", "depth", "page_ts", "outlinks", "status"],
                filter=(pc.field("status") == STATUS_FETCHED),
            )
            .map_batches(explode, batch_format="pyarrow")
            .groupby("url")
            .aggregate(Min("priority"), Min("depth"), Min("warc_ts_us"))
            .map_batches(self._first_host_fix, batch_format="pyarrow")
            .map_batches(finish_discovered, batch_format="pyarrow")
            .map_batches(
                SeenFilterBatch(self.seen.handles),
                batch_format="pyarrow",
                batch_size=8192,
            )
        )
        return _atomic_write(carry.union(discovered), self._p("frontier", f"round_{r + 1:05d}"))

    @staticmethod
    def _first_host_fix(t: pa.Table) -> pa.Table:
        """groupby.aggregate drops non-aggregated cols; host is re-derived
        from the url (cheap, deterministic)."""
        urls = t["url"].to_pylist()
        hosts = [u.split("/", 3)[2] for u in urls]
        if "host" in t.schema.names:
            t = t.drop_columns(["host"])
        return t.append_column("host", pa.array(hosts, type=pa.string()))

    def _lineage(self, r: int, rounds_dir: str, digests: list[bytes], wall_s: float) -> dict:
        cfg = self.cfg
        t = pads.dataset(rounds_dir, format="parquet").to_table(
            columns=["url_hash", "gate", "status"]
        )
        gate = np.asarray(t["gate"].to_pandas(), dtype=object)
        status = np.asarray(t["status"].to_pandas(), dtype=object)
        shard = (
            np.asarray(t["url_hash"].to_pandas(), dtype=np.uint64)
            % np.uint64(cfg.n_seen_shards)
        ).astype(np.int64)

        fetched = (gate == GATE_FETCH) & (status == STATUS_FETCHED)
        errors = (gate == GATE_FETCH) & (status == STATUS_ERROR)
        deferred = (gate == GATE_DEFER) | (gate == GATE_SKIPPED)
        failed = gate == GATE_ROBOTS
        scheduled = gate == GATE_FETCH

        rows = {
            "round": np.full(cfg.n_seen_shards, r, dtype=np.int32),
            "partition_id": np.arange(cfg.n_seen_shards, dtype=np.int32),
            "seen_shard_digest": digests,
            "urls_scheduled": np.bincount(shard[scheduled], minlength=cfg.n_seen_shards).astype(np.int64),
            "urls_fetched": np.bincount(shard[fetched], minlength=cfg.n_seen_shards).astype(np.int64),
            "urls_deferred": np.bincount(shard[deferred], minlength=cfg.n_seen_shards).astype(np.int64),
            "urls_failed": np.bincount(shard[failed], minlength=cfg.n_seen_shards).astype(np.int64),
            "errors": np.bincount(shard[errors], minlength=cfg.n_seen_shards).astype(np.int64),
            "wall_s": np.full(cfg.n_seen_shards, wall_s, dtype=np.float64),
        }
        lt = pa.table(
            {k: pa.array(v, type=LINEAGE.field(k).type) for k, v in rows.items()},
            schema=LINEAGE,
        )
        d = self._p("lineage", f"round_{r:05d}")
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(lt, os.path.join(tmp, "part-0.parquet"))
        shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)
        with open(os.path.join(d, "_COMPLETE"), "w") as f:
            f.write("ok")
        return {
            "round": r,
            "scheduled": int(scheduled.sum()),
            "fetched": int(fetched.sum()),
            "deferred": int(deferred.sum()),
            "failed": int(failed.sum()),
            "errors": int(errors.sum()),
            "wall_s": wall_s,
        }

    # --- full run ---------------------------------------------------------
    def run(self, seeds: pa.Table | None = None, max_rounds: int | None = None) -> dict:
        """Crawl to frontier exhaustion (or max_rounds). Resumes from the
        last complete round if checkpoints exist."""
        cfg = self.cfg
        self.prepare()
        last = self.last_complete_round()
        if last >= 0:
            self.seen.load(self._p("seen", f"round_{last:05d}"))
            start = last + 1
        elif os.path.exists(self._p("frontier", "round_00000")) and os.path.exists(
            self._p("seen", "bootstrap", "shard_0.npz")
        ):
            self.seen.load(self._p("seen", "bootstrap"))
            start = 0
        else:
            if seeds is None:
                seeds = pq.read_table(cfg.extra["seeds_path"])
            self.bootstrap(seeds)
            start = 0

        limit = max_rounds if max_rounds is not None else cfg.max_rounds
        totals = {"rounds": 0, "fetched": 0, "scheduled": 0, "errors": 0, "failed": 0}
        r = start
        while r < start + limit:
            fdir = self._p("frontier", f"round_{r:05d}")
            if not os.path.exists(fdir) or _count_rows(fdir) == 0:
                break
            stats = self.run_round(r)
            totals["rounds"] += 1
            for k in ("fetched", "scheduled", "errors", "failed"):
                totals[k] += stats[k]
            if stats["next_frontier"] == 0:
                r += 1
                break
            r += 1
        totals["last_round"] = r - 1
        return totals


def pages_output(out_dir: str) -> rd.Dataset:
    """The stored-pages dataset (analog of reading the transactions
    collection): fetched rows across all rounds."""
    return rd.read_parquet(
        os.path.join(out_dir, "rounds"),
        filter=(pc.field("status") == STATUS_FETCHED),
    )


def events_output(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(out_dir, "events"))


def lineage_output(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(out_dir, "lineage"))
