"""The crawl round loop — the engine's flagship pipeline.

Ray-Data-native lifecycle (SURVEY.md §3.4), replacing the reference's
WebSocket-listener/scheduler/worker-pool loop (``scheduler_service.go``,
``crawler_service.go``) with a driver-side round loop.

Pipelined mode (default, ``politeness_mode="cutoff"``): each round is
ONE streaming Dataset execution of the fused ``round_step`` stage
(stages/roundstep.py — gate → fetch → extract → enrich → carry →
discover/seen-claim → politeness offers for r+1), writing the combined
round table atomically, hive-partitioned by ``row_kind`` so the next
round's frontier read touches only thin carry/discovered files:

  round r:
    collect politeness cutoffs for r (offered during round r-1's exec)
    read frontier_r → map_batches(round_step) → rounds/round_r (atomic)
    seen-shard checkpoint (synchronous — snapshots end-of-round state)
    events projection + per-shard lineage (overlapped with round r+1)

No all-to-all shuffle anywhere: politeness selection is exact
per-(host,salt) top-k via offered partial top-ks + broadcast cutoffs
(the groupby sort-barrier cost seconds of wall per round for
milliseconds of compute), and round dedup is the seen-shard first claim
over discovered rows that are pure functions of (url, round).

Legacy mode (``politeness_mode="groupby"``): the host-keyed shuffle +
map_groups top-k with separate frontier/events executions — semantically
identical, kept and cross-validated by tests.

Resume: rewind to the newest complete seen dump, replay the rounds since
(deterministic → bit-identical; tests kill -9 and compare). No decision
anywhere reads a wall clock and every write is an idempotent tmp-dir +
rename. All state lives in the actor pools (seen shards, page store,
cutoff buckets) or in checkpoint Parquet — never in driver mutexes (the
reference's single-process ceiling, SURVEY.md §4).
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
from ..config import CrawlConfig
from ..functions.hashing import hash_strings
from ..functions.urlnorm import normalize_many
from ..schema import FRONTIER, LINEAGE
from ..stages.fetch import (
    STATUS_ERROR,
    STATUS_FETCHED,
    FetchSim,
    build_fetch_index,
    fetch_via_store,
)
from ..state.politeness import (
    GATE_DEFER,
    GATE_FETCH,
    GATE_ROBOTS,
    GATE_SKIPPED,
    CutoffPool,
    final_gate,
    load_robots,
    phase1_gate,
)
from ..state.seen import ActorSeenSet, SeenFilterBatch
from ..state.store import ActorPageStore

EPOCH0 = pa.scalar(0, type=pa.timestamp("us"))


def _atomic_write(ds: rd.Dataset, final_dir: str, count: bool = True, **kwargs) -> int:
    """write_parquet to a tmp dir, fsync-free atomic rename. Returns row
    count from the written file metadata (no re-execution); pass
    count=False when the caller doesn't need it (metadata opens across
    hundreds of part files add up)."""
    tmp = final_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp, **kwargs)
    os.makedirs(tmp, exist_ok=True)  # a 0-row write creates nothing
    shutil.rmtree(final_dir, ignore_errors=True)
    os.rename(tmp, final_dir)
    return _count_rows(final_dir) if count else -1


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


def _carry_rows(t: pa.Table, *, round_no: int, max_retries: int, skip_rounds: int) -> pa.Table:
    """Carry rows into the next frontier: deferred / skipped rows
    unchanged; errored rows retry, sit out a skip window at max_retries,
    get one final chance, then drop permanently (mirror of
    handleBlockProcessingError's failedBlocks→skippedBlocks,
    scheduler_service.go:324-357, made terminating)."""
    frontier_cols = [f.name for f in FRONTIER]
    gate = np.asarray(t["gate"].to_pandas(), dtype=object)
    status = np.asarray(t["status"].to_pandas(), dtype=object)
    attempts = np.asarray(t["attempts"].to_pandas(), dtype=np.int32).copy()
    skip_until = np.asarray(t["skip_until_round"].to_pandas(), dtype=np.int32).copy()
    keep = (gate == GATE_DEFER) | (gate == GATE_SKIPPED)
    err = (gate == GATE_FETCH) & (status == STATUS_ERROR)
    attempts[err] += 1
    skip_now = err & (attempts == max_retries)
    skip_until[skip_now] = round_no + 1 + skip_rounds
    dropped = err & (attempts > max_retries)  # permanent failure
    keep |= err & ~dropped
    t = t.set_column(
        t.schema.get_field_index("attempts"), "attempts",
        pa.array(attempts, type=pa.int32()),
    ).set_column(
        t.schema.get_field_index("skip_until_round"), "skip_until_round",
        pa.array(skip_until, type=pa.int32()),
    )
    return t.select(frontier_cols).filter(pa.array(keep))


# discovered-row attributes are PURE FUNCTIONS of (url, discovery round):
#   depth    := round + 1   (discovery depth — frontier enters in BFS waves)
#   priority := 0           (base priority; reprioritization is a frontier rewrite)
#   warc_ts  := BASE + url_hash-derived jitter (deterministic enqueue-time analog)
# Consequence: duplicates of a URL discovered by many parents in the same
# round are IDENTICAL rows, so the seen-shard first-claim IS the dedup —
# no per-round groupby(url) shuffle (the sort-based aggregate was the
# dominant per-round cost; this removes the all-to-all entirely,
# SURVEY.md §7.3 "minimize shuffles").
_TS_JITTER_US = np.int64(30 * 86400) * np.int64(1_000_000)
_TS_BASE_US = np.int64(1753401600000000)  # 2025-07-25T00:00:00Z


def _explode_outlinks(t: pa.Table, *, round_no: int) -> pa.Table:
    """fetched rows → one frontier row per distinct valid outlink in the
    batch (normalized; invalid URLs dropped — the malformed-input
    robustness mirror). Cross-batch duplicates are handled by the seen
    filter (identical rows, order-independent)."""
    links = t["outlinks"].to_pylist()
    urls: list[str] = []
    for ls in links:
        if ls:
            urls.extend(ls)
    norm, hosts, ok = normalize_many(urls)
    # within-batch dedup (cheap; reduces seen-actor traffic)
    seen_local: set = set()
    for i in range(len(norm)):
        if ok[i]:
            if norm[i] in seen_local:
                ok[i] = False
            else:
                seen_local.add(norm[i])
    norm = norm[ok]
    hosts = hosts[ok]
    n = len(norm)
    h = hash_strings(norm)
    ts = _TS_BASE_US + (h % np.uint64(_TS_JITTER_US)).astype(np.int64)
    return pa.table(
        {
            "url": pa.array(norm, type=pa.string()),
            "url_hash": pa.array(h, type=pa.uint64()),
            "host": pa.array(hosts, type=pa.string()),
            "priority": pa.array(np.zeros(n, dtype=np.int32)),
            "depth": pa.array(np.full(n, round_no + 1, dtype=np.int32)),
            "warc_ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
            "attempts": pa.array(np.zeros(n, dtype=np.int32)),
            "skip_until_round": pa.array(np.full(n, -1, dtype=np.int32)),
        },
        schema=FRONTIER,
    )


class CrawlPipeline:
    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.out = cfg.out_dir
        self.seen: ActorSeenSet | None = None
        self.robots_ref = None
        # round → [(frontier file, n_rows)] — footers read once per round
        # (shared by the count, the balanced task assignment and resume
        # healing; invalidated when watch-mode ingest adds files)
        self._fplan_cache: dict[int, list] = {}

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
        """Release the seen-shard + page-store actors (seen state is on
        disk in seen/; the store is rebuilt from the index)."""
        self._join_bg()
        if self.seen is not None:
            self.seen.kill()
            self.seen = None
        if getattr(self, "store", None) is not None:
            self.store.kill()
            self.store = None
        if getattr(self, "cutoff_pool", None) is not None:
            self.cutoff_pool.kill()
            self.cutoff_pool = None
        self._prepared = False

    def prepare(self) -> None:
        # idempotent: run() always calls prepare(), but a caller that
        # prepared explicitly (bench setup, watch loops) must NOT pay a
        # second actor-pool spinup + full store-index reload inside its
        # timed window — the live pools are reused; close() resets.
        # The guard flag is set at the END, so a prepare() that failed
        # partway (e.g. store-pool creation raised) is retried in full
        # rather than leaving a half-initialized pipeline.
        if getattr(self, "_prepared", False):
            return
        cfg = self.cfg
        os.makedirs(self.out, exist_ok=True)
        build_fetch_index(cfg.pages_path, cfg.index_dir, cfg.n_fetch_buckets)
        robots = load_robots(cfg.extra["robots_path"]) if "robots_path" in cfg.extra else {}
        self._robots = robots  # driver-side copy (ingest offers)
        self.robots_ref = ray.put(robots)
        self.seen = ActorSeenSet(
            cfg.n_seen_shards, cfg.seen_shard_capacity, ckpt_root=self._p("seen")
        )
        self.store = None
        if cfg.extra.get("fetch_mode", "store") == "store":
            n_store = int(cfg.extra.get("n_store_shards", min(8, cfg.n_fetch_buckets)))
            self.store = ActorPageStore(
                cfg.index_dir, cfg.n_fetch_buckets, n_store,
                mode=cfg.extra.get("store_mode", "preload"),
                lru_groups=int(cfg.extra.get("store_lru_groups", 64)),
            )
            self.store.wait_ready()  # index loads ONCE per run, not per round
        self.cutoff_pool = None
        if cfg.extra.get("politeness_mode", "cutoff") == "cutoff":
            self.cutoff_pool = CutoffPool(
                int(cfg.extra.get("n_cutoff_actors", 8)),
                self.robots_ref,
                cfg.round_ms,
                cfg.default_crawl_delay_ms,
                cfg.max_per_host_round,
                max(1, int(cfg.extra.get("host_salt", 1))),
                error_backoff=bool(cfg.extra.get("error_backoff", False)),
            )
            self.cutoff_pool.consume_fresh()  # clear the initial flags
        self._prepared = True

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
        bdir = self._p("seen", "bootstrap")
        self.seen.save(bdir)
        with open(os.path.join(bdir, "_COMPLETE"), "w") as f:
            f.write("ok")

    # --- frontier source (pipelined mode embeds the next frontier in the
    #     combined rounds output, hive-partitioned by row_kind so frontier
    #     reads touch only the thin carry/discovered files and counts are
    #     metadata-only; round 0 reads the bootstrap dir) -----------------
    def _frontier_source(self, r: int) -> list[str]:
        """Parquet file paths holding round r's frontier rows (ray's
        read_parquet wants explicit files when given a list)."""
        import glob as _glob

        if self.cutoff_pool is None or r == 0:
            d = self._p("frontier", f"round_{r:05d}")
            dirs = [d] if os.path.exists(d) else []
        else:
            base = self._p("rounds", f"round_{r - 1:05d}")
            dirs = [
                p
                for kind in ("carry", "discovered")
                if os.path.exists(p := os.path.join(base, f"row_kind={kind}"))
            ]
        # watch-mode pushed rows for this round (WS-push analog)
        ing = self._p("ingest", f"round_{r:05d}")
        if os.path.exists(ing):
            dirs.append(ing)
        files: list[str] = []
        for d in dirs:
            files.extend(sorted(_glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)))
        return files

    def _frontier_plan(self, r: int) -> list:
        """[(file, n_rows)] for round r's frontier — footer metadata only,
        read in a thread pool and cached per round."""
        plan = self._fplan_cache.get(r)
        if plan is None:
            from concurrent.futures import ThreadPoolExecutor

            files = self._frontier_source(r)
            if len(files) > 4:
                with ThreadPoolExecutor(max_workers=16) as ex:
                    rows = list(
                        ex.map(lambda f: pq.ParquetFile(f).metadata.num_rows, files)
                    )
            else:
                rows = [pq.ParquetFile(f).metadata.num_rows for f in files]
            plan = self._fplan_cache[r] = list(zip(files, rows))
        return plan

    def _frontier_count(self, r: int) -> int:
        return sum(n for _, n in self._frontier_plan(r))

    @staticmethod
    def _balanced_items(plan: list, batch: int, max_tasks: int) -> list[dict]:
        """Pack frontier file spans into ``batch``-row processing groups,
        then those groups into ≤ ``max_tasks`` task items — the
        shuffle-free replacement for ``repartition(ntasks)``: task
        balance comes from the assignment, not from moving rows. Item
        count stays O(cluster cores) regardless of frontier size (a
        10^10-URL round must not enumerate one driver item per batch);
        within a task, ``round_task`` streams one batch group at a time
        (generator), so task memory stays one batch wide."""
        groups: list[tuple[list, list, list]] = []
        cur_p: list = []
        cur_o: list = []
        cur_l: list = []
        cur_rows = 0
        for f, n in plan:
            off = 0
            while off < n:
                take = min(n - off, batch - cur_rows)
                cur_p.append(f)
                cur_o.append(off)
                cur_l.append(take)
                cur_rows += take
                off += take
                if cur_rows >= batch:
                    groups.append((cur_p, cur_o, cur_l))
                    cur_p, cur_o, cur_l, cur_rows = [], [], [], 0
        if cur_rows:
            groups.append((cur_p, cur_o, cur_l))
        if not groups:
            return []
        # round-robin batch groups across tasks: consecutive groups read
        # consecutive file regions, so striding also spreads any residual
        # per-file skew across tasks
        n_tasks = max(1, min(len(groups), max_tasks))
        items: list[dict] = []
        for t in range(n_tasks):
            mine = groups[t::n_tasks]
            items.append(
                {
                    "paths": [p for g in mine for p in g[0]],
                    "offsets": [o for g in mine for o in g[1]],
                    "lengths": [ln for g in mine for ln in g[2]],
                    "batch_id": [bi for bi, g in enumerate(mine) for _ in g[0]],
                }
            )
        return items

    # --- automatic host-skew salting state (SURVEY.md §4) ----------------
    # hot maps host → per-host salt count for one specific round; decided
    # at collect(r) from round r's raw candidate counts (so a host that
    # exceeds host_skew_threshold in round r is salted from round r+1 on)
    # and persisted per round for deterministic resume.
    def _hot_path(self, r: int) -> str:
        return self._p("hot", f"round_{r:05d}.json")

    def _load_hot(self, r: int) -> dict:
        import json

        p = self._hot_path(r)
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return {str(k): int(v) for k, v in json.load(f).items()}

    def _save_hot(self, r: int, hot: dict) -> None:
        import json

        if not hot and not os.path.exists(self._hot_path(r)):
            return
        os.makedirs(self._p("hot"), exist_ok=True)
        tmp = self._hot_path(r) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(hot, f, sort_keys=True)
        os.replace(tmp, self._hot_path(r))

    def _hot_next(self, host_counts: dict) -> dict:
        from ..state.politeness import salt_count_for

        cfg = self.cfg
        base = max(1, int(cfg.extra.get("host_salt", 1)))
        out = {}
        for h, c in host_counts.items():
            n = salt_count_for(c, cfg.host_skew_threshold, base)
            if n > base:
                out[h] = n
        return out

    def _backfill_offers(self, r: int) -> None:
        """Stream politeness offers for round ``r`` from its frontier
        source — needed at bootstrap and at resume, where the producing
        execution's offers are gone with the old process. One extra
        (cheap, thin-column) execution; everything is re-derived
        deterministically."""
        if self.cutoff_pool is None or self._frontier_count(r) == 0:
            return
        src = self._frontier_source(r)
        cfg = self.cfg
        kwargs = dict(
            robots_ref=self.robots_ref,
            round_no=r,
            round_ms=cfg.round_ms,
            default_delay_ms=cfg.default_crawl_delay_ms,
            max_per_host=cfg.max_per_host_round,
            n_salt=max(1, int(cfg.extra.get("host_salt", 1))),
            cutoff_handles=self.cutoff_pool.handles,
            hot=self._load_hot(r),
        )

        def offers_only(df: pd.DataFrame, **kw) -> pa.Table:
            from ..functions.broadcast import get_broadcast
            from ..state.politeness import offer_candidates

            kw = dict(kw)
            kw["robots"] = get_broadcast(kw.pop("robots_ref"))
            offer_candidates(df, **kw)
            return pa.table({"n": pa.array([len(df)], type=pa.int64())})

        rd.read_parquet(src, columns=[f.name for f in FRONTIER]).map_batches(
            offers_only, fn_kwargs=kwargs, batch_format="pandas", batch_size=8192
        ).count()

    def _backfill_errors(self, r: int) -> None:
        """Authoritatively re-derive round ``r``'s per-host fetch-error
        counts from its committed output and SET them on the cutoff
        shards (resume / shard-restart path for error backoff)."""
        if self.cutoff_pool is None or r < 0:
            return
        page_dir = self._p("rounds", f"round_{r:05d}", "row_kind=page")
        src = page_dir if os.path.exists(page_dir) else self._p("rounds", f"round_{r:05d}")
        if not os.path.exists(src):
            return
        t = pads.dataset(src, format="parquet").to_table(
            columns=["host", "status", "error_class"]
        )
        status = np.asarray(t["status"].to_pandas(), dtype=object)
        err_m = status == STATUS_ERROR
        hosts = np.asarray(t["host"].to_pandas(), dtype=object)[err_m]
        rl = (
            np.asarray(t["error_class"].to_pandas(), dtype=object)[err_m]
            == "rate_limit"
        )
        from ..functions.hashing import hash_strings

        handles = self.cutoff_pool.handles
        k = len(handles)
        if len(hosts):
            uh = np.unique(hosts)
            owner = hash_strings(list(uh)) % np.uint64(k)
            per_host = {
                str(h): (
                    int(((hosts == h) & ~rl).sum()),
                    int(((hosts == h) & rl).sum()),
                )
                for h in uh
            }
        else:
            uh, owner, per_host = np.array([]), np.array([]), {}
        refs = []
        for j in range(k):
            counts = {str(h): per_host[str(h)] for h, o in zip(uh, owner) if o == j}
            refs.append(handles[j].set_errors.remote(r, counts))
        ray.get(refs)

    # --- incremental ingest (watch mode — the WS-push analog of
    #     websocket_scheduler.go:110-130: newly published pages are picked
    #     up at the next round boundary without restarting the run) -------
    def _processed_watch_files(self) -> set:
        import glob as _glob
        import json

        out: set = set()
        for mf in _glob.glob(self._p("ingest", "*", "*", "_MANIFEST.json")):
            with open(mf) as f:
                out |= set(json.load(f))
        return out

    def _ingest_version(self) -> int:
        """Monotonic index version (count of ingest batches) — busts the
        per-worker bucket-file cache in parquet fetch mode."""
        import glob as _glob

        return len(_glob.glob(self._p("ingest", "*", "*", "_MANIFEST.json")))

    def ingest_new_pages(self, r: int) -> int:
        """Scan ``extra["watch_dir"]`` for pushed files not yet consumed.
        Three push CHANNELS mirror the reference's three WebSocket
        subscription types (``websocket_listener.go:119-196``), routed
        by subdirectory:

        - ``<watch_dir>/*.parquet`` or ``<watch_dir>/pages/`` — full
          page payloads (the ``newHeads`` analog): rows are appended to
          the fetch index (per-bucket files — restarted store shards
          re-read them for free), loaded into the resident store
          shards, seen-claimed and written as frontier rows.
        - ``<watch_dir>/urls/`` — URL-only announcements (the
          ``newPendingTransactions`` analog: a unit id whose payload
          may not exist yet): seen-claimed + frontier rows ONLY — no
          index/store write; if the payload never arrives the fetch
          fails through the normal attempts/skip retry machinery.
          Columns: ``url`` (+ optional ``priority:int32``).
        - ``<watch_dir>/logs/`` — externally-published event rows (the
          filtered ``logs`` subscription analog): rows matching
          ``extra["watch_log_event_types"]`` (a list; None = all) are
          committed under ``external/round_r/batch_k/`` — they never
          touch the frontier.

        Frontier rows land in ingest/round_r/batch_k/; new candidates
        are offered to the politeness cutoffs. Returns the number of
        new frontier rows. Driver-side work is bounded by the pushed
        batch size (the reference handles one block per WS message; a
        push batch is the analog)."""
        import glob as _glob
        import json

        cfg = self.cfg
        wd = cfg.extra.get("watch_dir")
        if not wd:
            return 0
        if self.cutoff_pool is None:
            # fail loudly instead of silently never ingesting (r02 verdict):
            # push ingest offers candidates to the cutoff actors, which the
            # legacy groupby politeness mode does not run
            raise ValueError(
                "watch_dir is configured but politeness_mode='groupby' has no "
                "cutoff actors to offer pushed pages to — watch mode requires "
                "the default politeness_mode='cutoff'"
            )
        if not os.path.isdir(wd):
            return 0
        processed = self._processed_watch_files()

        def _new(pattern: str) -> list[str]:
            return sorted(
                f
                for f in _glob.glob(os.path.join(wd, pattern))
                if os.path.relpath(f, wd) not in processed
            )

        files = _new("*.parquet") + _new(os.path.join("pages", "*.parquet"))
        url_files = _new(os.path.join("urls", "*.parquet"))
        log_files = _new(os.path.join("logs", "*.parquet"))
        if not files and not url_files and not log_files:
            return 0

        # A malformed external push must never wedge the watch loop: the
        # reference WS listener logs-and-continues on a bad message
        # (websocket_listener.go), and consumer.py dead-letters the same
        # poison case after MaxDeliver. Each channel validates PER FILE;
        # an unreadable / schema-broken file is quarantined — recorded in
        # the batch manifest (so it is never re-scanned) plus a
        # _REJECTED.json error map for the operator (ADVICE r04).
        rejected: dict[str, str] = {}
        _PUSH_ERRORS = (KeyError, ValueError, OSError, pa.ArrowInvalid,
                        pa.ArrowNotImplementedError, pa.ArrowTypeError)

        def _quarantine(path: str, err: Exception) -> None:
            import logging

            rel = os.path.relpath(path, wd)
            rejected[rel] = f"{type(err).__name__}: {err}"
            logging.getLogger(__name__).warning(
                "quarantined pushed file %s: %s", rel, rejected[rel]
            )

        def _read_push(path: str, required: tuple[str, ...]) -> pa.Table:
            t = pq.read_table(path)
            for col in required:
                if col not in t.schema.names:
                    raise KeyError(
                        f"pushed file missing required column {col!r}"
                    )
            if "url" in required and not pa.types.is_string(
                t.schema.field("url").type
            ) and not pa.types.is_large_string(t.schema.field("url").type):
                raise ValueError(
                    f"pushed url column has non-string type "
                    f"{t.schema.field('url').type}"
                )
            return t

        tables = []
        files_by_bucket: dict[int, list[str]] = {}
        batch_no = len(_glob.glob(self._p("ingest", f"round_{r:05d}", "batch_*")))
        tag = f"r{r:05d}b{batch_no}"
        for fi, path in enumerate(files):
            try:
                # pages payloads feed the fetch index: the store shards
                # read (url, warc_ts, html, lang) from every index file,
                # so all four are required — a file missing one would
                # poison every later store load, not just this batch
                t = _read_push(path, ("url", "warc_ts", "html", "lang"))
                # the frontier build casts warc_ts→int64: validate now so
                # a bad file is quarantined instead of poisoning the
                # per-file frontier build below
                t["warc_ts"].combine_chunks().cast(pa.int64())
            except _PUSH_ERRORS as e:
                _quarantine(path, e)
                continue
            tables.append(t)
            # append to the fetch index under deterministic names
            h = hash_strings(t["url"])
            buckets = (h % np.uint64(cfg.n_fetch_buckets)).astype(np.int64)
            for b in np.unique(buckets):
                dest_dir = os.path.join(cfg.index_dir, f"bucket={b}")
                os.makedirs(dest_dir, exist_ok=True)
                dest = os.path.join(dest_dir, f"ingest_{tag}_f{fi}.parquet")
                if not os.path.exists(dest):
                    tmp = dest + ".tmp"
                    pq.write_table(t.filter(pa.array(buckets == b)), tmp)
                    os.replace(tmp, dest)
                files_by_bucket.setdefault(int(b), []).append(dest)
        if self.store is not None:
            self.store.load_new_files(files_by_bucket)

        def _frontier_rows(url_list, ts_us: np.ndarray | None,
                           prio: np.ndarray | None) -> pa.Table:
            """Normalized frontier rows for THIS round (depth r,
            deterministic — warc_ts from the push or epoch 0)."""
            urls, hosts, ok = normalize_many(url_list)
            n = int(ok.sum())
            ts = (ts_us[ok] if ts_us is not None
                  else np.zeros(n, dtype=np.int64))
            pr = (prio[ok] if prio is not None
                  else np.zeros(n, dtype=np.int32))
            return pa.table(
                {
                    "url": pa.array(urls[ok], type=pa.string()),
                    "url_hash": pa.array(hash_strings(urls[ok]), type=pa.uint64()),
                    "host": pa.array(hosts[ok], type=pa.string()),
                    "priority": pa.array(pr.astype(np.int32)),
                    "depth": pa.array(np.full(n, r, dtype=np.int32)),
                    "warc_ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
                    "attempts": pa.array(np.zeros(n, dtype=np.int32)),
                    "skip_until_round": pa.array(np.full(n, -1, dtype=np.int32)),
                },
                schema=FRONTIER,
            )

        fts = []
        # pages channel (newHeads analog): payload + frontier. Frontier
        # rows build PER FILE — concatenating whole pushed tables would
        # reintroduce the cross-file poison the quarantine just removed
        # (two individually-valid files with divergent payload schemas
        # crash a plain concat); _frontier_rows output is always the
        # fixed FRONTIER schema, so the fts concat below is safe.
        for t in tables:
            # fill nulls BEFORE the numpy cast (same rule as the urls
            # channel's priority): a null warc_ts would silently become
            # INT64_MIN and jump the row to an extreme of the frontier
            # ordering (warc_ts is the comparator's third key)
            fts.append(_frontier_rows(
                t["url"].to_pylist(),
                np.asarray(
                    pc.fill_null(
                        t["warc_ts"].combine_chunks().cast(pa.int64()), 0
                    ).to_pandas(),
                    dtype=np.int64,
                ),
                None,
            ))
        for path in url_files:
            # urls channel (newPendingTransactions analog): frontier only
            try:
                t = _read_push(path, ("url",))
                prio = None
                if "priority" in t.schema.names:
                    # fill nulls BEFORE the numpy cast: NaN→int32 silently
                    # becomes INT32_MIN, which would jump the announcement
                    # to an extreme of the frontier ordering (priority is
                    # the comparator's first key) instead of the default 0
                    prio = np.asarray(
                        pc.fill_null(pc.cast(t["priority"].combine_chunks(),
                                             pa.int32()), 0).to_pandas(),
                        dtype=np.int32,
                    )
            except _PUSH_ERRORS as e:
                _quarantine(path, e)
                continue
            fts.append(_frontier_rows(t["url"].to_pylist(), None, prio))
        ft = (pa.concat_tables(fts) if fts
              else pa.table({f.name: pa.nulls(0, f.type) for f in FRONTIER},
                            schema=FRONTIER))
        hashes = np.asarray(ft["url_hash"].to_pandas(), dtype=np.uint64)
        novel = self.seen.check_and_insert(hashes)
        ft = ft.filter(pa.array(novel))

        # logs channel (filtered logs-subscription analog): externally
        # published event rows committed per ingest batch, never frontier
        if log_files:
            kinds = cfg.extra.get("watch_log_event_types")
            lts = []
            for path in log_files:
                try:
                    t = pq.read_table(path)
                    if kinds is not None and "event_type" not in t.schema.names:
                        # a configured filter with no column to filter on
                        # would silently pass EVERY row — quarantine the
                        # file instead of wedging the loop (ADVICE r04)
                        raise KeyError(
                            "watch_log_event_types is configured but the "
                            "pushed logs file has no event_type column"
                        )
                except _PUSH_ERRORS as e:
                    _quarantine(path, e)
                    continue
                lts.append(t)
            # permissive promote: pushers evolve their log schema; a
            # missing column in one file must null-fill, not poison the
            # watch loop with an ArrowInvalid on every restart
            lt = (pa.concat_tables(lts, promote_options="permissive")
                  if lts else pa.table({}))
            if kinds is not None and len(lt):
                keep = np.isin(
                    np.asarray(lt["event_type"].to_pandas(), dtype=object),
                    np.asarray(list(kinds), dtype=object),
                )
                lt = lt.filter(pa.array(keep))
            if len(lt):
                ext = self._p("external", f"round_{r:05d}", f"batch_{batch_no}")
                etmp = ext + ".tmp"
                shutil.rmtree(etmp, ignore_errors=True)
                os.makedirs(etmp, exist_ok=True)
                pq.write_table(lt, os.path.join(etmp, "part-0.parquet"))
                shutil.rmtree(ext, ignore_errors=True)
                os.rename(etmp, ext)
            # all-filtered batch: the manifest alone marks the files
            # processed — an empty committed dir would only break
            # external_events_output's parquet read

        d = self._p("ingest", f"round_{r:05d}", f"batch_{batch_no}")
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        if len(ft):
            pq.write_table(ft, os.path.join(tmp, "part-0.parquet"))
        with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
            # quarantined files are manifest-marked too: processed means
            # "never re-scan", which is exactly the poison-pill contract
            json.dump(
                sorted(os.path.relpath(p, wd)
                       for p in (*files, *url_files, *log_files)),
                f,
            )
        if rejected:
            with open(os.path.join(tmp, "_REJECTED.json"), "w") as f:
                json.dump(rejected, f)
        shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)
        # new frontier files for this round → re-plan it
        self._fplan_cache.pop(r, None)

        if len(ft):
            from ..state.politeness import offer_candidates

            offer_candidates(
                ft.to_pandas(),
                robots=self._robots,
                round_no=r,
                round_ms=cfg.round_ms,
                default_delay_ms=cfg.default_crawl_delay_ms,
                max_per_host=cfg.max_per_host_round,
                n_salt=max(1, int(cfg.extra.get("host_salt", 1))),
                cutoff_handles=self.cutoff_pool.handles,
                hot=self._load_hot(r),
            )
        return len(ft)

    def _reclaim_ingest(self, r: int) -> None:
        """Resume path: round ``r``'s ingest rows were seen-claimed after
        the checkpoint being resumed from — re-claim them (same filter
        state ⇒ identical novel set ⇒ bit-identical replay)."""
        d = self._p("ingest", f"round_{r:05d}")
        if not os.path.exists(d):
            return
        t = pads.dataset(d, format="parquet").to_table(columns=["url_hash"])
        if len(t):
            self.seen.check_and_insert(
                np.asarray(t["url_hash"].to_pandas(), dtype=np.uint64)
            )

    # --- seen-shard gap healing (ADVICE r02) ------------------------------
    def _heal_seen(self, r: int) -> list[int]:
        """A restarted seen shard restored the newest COMPLETE npz dump —
        with checkpoint_every > 1 that dump can predate the last executed
        round by up to N-1 rounds, silently forgetting their claims.
        Detect the restart (consume_fresh, same pattern as CutoffPool)
        and replay the gap rounds' claims from the committed frontier
        outputs: the frontier rows of round f are exactly the urls
        claimed as novel during round f-1 (plus round f's ingest), so
        re-inserting frontier rounds dump+1 … r restores membership
        exactly (inserting an existing member is a no-op).  The replay
        starts at dump+1, not dump+2: the round-``base`` npz dump
        predates round ``base+1``'s watch-mode ingest, whose seen-claims
        land in frontier round ``base+1`` — starting at ``base+2`` would
        forget them and double-admit a later push of the same URL (r03
        ADVICE).  Round ``base+1``'s frontier also repeats round
        ``base``'s claims, but re-claiming members is a no-op, so the
        only cost is one extra thin frontier read."""
        states = self.seen.consume_fresh()
        fresh = [(j, rr) for j, (f, rr) in enumerate(states) if f]
        if not fresh:
            return []
        shard_ids = [j for j, _ in fresh]
        base = min(rr for _, rr in fresh)
        for rf in range(base + 1, r + 1):
            files = self._frontier_source(rf)
            if not files:
                continue
            t = pads.dataset(files, format="parquet").to_table(columns=["url_hash"])
            if len(t):
                self.seen.insert_to_shards(
                    shard_ids, np.asarray(t["url_hash"].to_pandas(), dtype=np.uint64)
                )
        return shard_ids

    # --- one round --------------------------------------------------------
    def run_round(self, r: int) -> dict:
        self._heal_seen(r)
        if self.cutoff_pool is not None:
            return self._run_round_pipelined(r)
        return self._run_round_legacy(r)

    def _run_round_pipelined(self, r: int) -> dict:
        """Pipelined mode (default): ONE Ray execution per round — the
        fused round_task reads its pre-balanced frontier file spans and
        runs round_step (gate→fetch→extract→carry→discover→offer),
        writing a combined table; see stages/roundstep.py. No repartition
        barrier, no separate read stage, no extra stamp stage — the
        per-round fixed cost is one execution launch plus the atomic
        write rename (r02 verdict #1)."""
        from ..stages.roundstep import round_task

        cfg = self.cfg
        t0 = time.perf_counter()
        rounds_dir = self._p("rounds", f"round_{r:05d}")
        n_frontier = self._frontier_count(r)
        ncpu = int(ray.cluster_resources().get("CPU", 8))

        if self.cutoff_pool.consume_fresh():
            # a cutoff shard restarted: its buffered offers for this
            # round are gone; drop the round's offer state on ALL shards
            # and re-derive it deterministically from the frontier
            self.cutoff_pool.drop_round(r)
            self._backfill_offers(r)
            if self.cfg.extra.get("error_backoff"):
                self._backfill_errors(r - 1)
        hot_r = self._load_hot(r)
        # shard-resident collect (r04 verdict #3): cutoffs stay on their
        # shards; the driver sees one count per shard plus the hot-host
        # subset (flat in active-host count). Transport: "auto" ships a
        # small total as ONE broadcast dict (fewer RPCs in the round
        # tasks — the single-node fast path) and leaves a large one
        # resident for per-batch slice pulls; "broadcast"/"pull" force.
        base_salt = max(1, int(cfg.extra.get("host_salt", 1)))
        n_cutoffs, hot_counts = self.cutoff_pool.finalize(
            r, cfg.host_skew_threshold, base_salt
        )
        hot_next = self._hot_next(hot_counts)
        self._save_hot(r + 1, hot_next)  # persisted BEFORE the round runs
        transport = cfg.extra.get("cutoff_transport", "auto")
        if transport not in ("auto", "broadcast", "pull"):
            raise ValueError(f"unknown cutoff_transport {transport!r}")
        max_bc = int(cfg.extra.get("max_cutoff_broadcast", 500_000))
        cutoff_pull = transport == "pull" or (
            transport == "auto" and n_cutoffs > max_bc
        )
        cutoffs_ref = ray.put(
            {} if cutoff_pull else self.cutoff_pool.fetch_ready(r)
        )
        kwargs = dict(
            round_no=r,
            cutoffs_ref=cutoffs_ref,
            cutoff_pull=cutoff_pull,
            hot_gate=hot_r,
            hot_offer=hot_next,
            robots_ref=self.robots_ref,
            store_handles=self.store.handles if self.store is not None else None,
            parquet_index=(
                (cfg.index_dir, cfg.n_fetch_buckets, self._ingest_version())
                if self.store is None
                else None
            ),
            seen_handles=self.seen.handles,
            cutoff_handles=self.cutoff_pool.handles,
            round_ms=cfg.round_ms,
            default_delay_ms=cfg.default_crawl_delay_ms,
            max_per_host=cfg.max_per_host_round,
            n_salt=max(1, int(cfg.extra.get("host_salt", 1))),
            max_retries=cfg.max_retries,
            skip_rounds=cfg.skip_rounds,
            error_permille=int(cfg.extra.get("error_permille", 0)),
            enrich=bool(cfg.extra.get("enrich", False)),
            error_backoff=bool(cfg.extra.get("error_backoff", False)),
        )
        # ~4 waves of equal-sized tasks: the parquet files' natural sizes
        # follow the producing tasks' skew (carry vs discovered files
        # differ 5-10×), and uneven tasks turn the last wave into a
        # straggler tail. Balance comes from the ASSIGNMENT (file spans
        # packed to equal row counts from footer metadata) instead of a
        # repartition of the rows — same equal tasks, zero all-to-all,
        # and the read happens inside the round task itself.
        batch = max(256, min(cfg.extract_batch_size, -(-n_frontier // (4 * ncpu))))
        items = self._balanced_items(self._frontier_plan(r), batch, 4 * ncpu)
        t_m0 = time.perf_counter()
        ds = rd.from_items(items, override_num_blocks=max(1, len(items))).map_batches(
            round_task,
            fn_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=None,  # one pre-balanced item per task
            # the seen/store/cutoff pools hold fractional reservations
            # (state/resources.py), so task concurrency is ncpu minus
            # the pools' proportional share — no oversubscription
            num_cpus=float(cfg.extra.get("round_task_cpus", 1.0)),
        )
        # hive-partitioned by row_kind: the next round's frontier read and
        # the events/lineage reads each touch only their own files
        _atomic_write(ds, rounds_dir, count=False, partition_cols=["row_kind"])
        t_main = time.perf_counter() - t_m0
        # execution barrier passed + output committed → claim logs for
        # this round can never be replayed again
        self.seen.end_round(r)

        # lineage bincounts were accumulated on the cutoff shards by the
        # round's own tasks; completeness is verified by the row total
        # (a cutoff-shard restart mid-round loses reports → sum short →
        # fall back to the driver-side recount, the rare path)
        lin_counts, lin_rows = self.cutoff_pool.collect_lineage(r)
        if lin_counts is None or lin_rows != n_frontier:
            lin_counts = None

        # next-frontier size from file metadata (cheap, needed now for the
        # loop/checkpoint decisions)
        n_next = self._frontier_count(r + 1)

        # seen checkpoint is SYNCHRONOUS: the dump must snapshot state at
        # the end of round r, before round r+1's discovery inserts
        t_c0 = time.perf_counter()
        ckpt_every = int(cfg.extra.get("checkpoint_every", 1))
        if r % ckpt_every == ckpt_every - 1 or n_next == 0:
            seen_dir = self._p("seen", f"round_{r:05d}")
            digests = self.seen.save(seen_dir)
            with open(os.path.join(seen_dir, "_COMPLETE"), "w") as f:
                f.write("ok")
        else:
            digests = self.seen.digests()
        t_ckpt = time.perf_counter() - t_c0

        # events + lineage only read the committed rounds dir — overlap
        # them with the next round's execution (1-deep: joined before the
        # following round's bookkeeping, and at run() end)
        wall = time.perf_counter() - t0

        def _post():
            try:
                self._write_events(r, rounds_dir)
                self._write_health(r)
                self._lineage(r, rounds_dir, digests, wall, pre=lin_counts)
            except BaseException as e:  # surfaced by the next _join_bg
                self._bg_exc = e

        self._join_bg()
        import threading

        self._bg_exc = None
        self._bg = threading.Thread(target=_post, daemon=False)
        self._bg.start()
        return {
            "round": r,
            "next_frontier": n_next,
            "wall_s": wall,
            "t_main": round(t_main, 2),
            "t_ckpt": round(t_ckpt, 2),
            "t_frontier": 0.0,
        }

    def _join_bg(self) -> None:
        bg = getattr(self, "_bg", None)
        if bg is not None:
            bg.join()
            self._bg = None
            exc = getattr(self, "_bg_exc", None)
            if exc is not None:
                self._bg_exc = None
                raise RuntimeError(
                    "background events/lineage write failed"
                ) from exc

    def _run_round_legacy(self, r: int) -> dict:
        cfg = self.cfg
        t0 = time.perf_counter()
        frontier_dir = self._p("frontier", f"round_{r:05d}")
        rounds_dir = self._p("rounds", f"round_{r:05d}")

        n_salt = int(cfg.extra.get("host_salt", 1))
        err = int(cfg.extra.get("error_permille", 0))
        enrich = bool(cfg.extra.get("enrich", False))
        pol = dict(
            robots_ref=self.robots_ref,
            round_ms=cfg.round_ms,
            default_delay_ms=cfg.default_crawl_delay_ms,
            max_per_host=cfg.max_per_host_round,
            n_salt=n_salt,
        )

        # split the frontier read so phase1 parallelizes even when the
        # previous round wrote few files (blocks are the unit of
        # map-task parallelism in Ray Data)
        n_frontier = _count_rows(frontier_dir)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        blocks = max(1, min(2 * ncpu, -(-n_frontier // 8192)))
        frontier = rd.read_parquet(frontier_dir, override_num_blocks=blocks)

        # groupby mode (politeness_mode="groupby"): the host-keyed
        # shuffle + per-group final top-k — semantically identical to the
        # pipelined cutoff mode, kept for cross-validation
        gated = frontier.map_batches(
            phase1_gate,
            fn_kwargs=dict(pol, round_no=r),
            batch_format="pandas",
            batch_size=8192,
        ).groupby("pkey").map_groups(
            final_gate, fn_kwargs=pol, batch_format="pandas"
        )
        if self.store is not None:
            # store mode: stateless tasks scatter-gather to the resident
            # page-store shard actors — no per-round pool spin-up
            fetched = gated.map_batches(
                fetch_via_store,
                fn_kwargs={
                    "store_handles": self.store.handles,
                    "error_permille": err,
                    "enrich": enrich,
                },
                batch_format="pandas",
                batch_size=cfg.extract_batch_size,
            )
        else:
            fetched = gated.map_batches(
                FetchSim,
                fn_constructor_args=(cfg.index_dir, cfg.n_fetch_buckets, err, enrich),
                batch_format="pandas",
                batch_size=cfg.extract_batch_size,
                # autoscaling (min,max): a fixed pool sized to the node
                # deadlocks when the other stages need their CPUs too
                concurrency=(1, cfg.fetch_concurrency),
                num_cpus=cfg.cpus_per_fetch_actor,
            )
        t_m0 = time.perf_counter()
        ds = (
            fetched.drop_columns(["pkey"])
            .map_batches(
                lambda t, r=r: t.append_column(
                    "round", pa.array(np.full(len(t), r, dtype=np.int32))
                ).append_column(
                    "row_kind",
                    pa.array(np.full(len(t), "page", dtype=object), type=pa.string()),
                ),
                batch_format="pyarrow",
            )
        )
        _atomic_write(ds, rounds_dir)
        t_main = time.perf_counter() - t_m0

        t_e0 = time.perf_counter()
        self._write_events(r, rounds_dir)
        t_events = time.perf_counter() - t_e0

        # --- next frontier ------------------------------------------------
        t_f0 = time.perf_counter()
        n_next = self._build_next_frontier(r, rounds_dir)
        self.seen.end_round(r)
        t_frontier = time.perf_counter() - t_f0

        # --- checkpoint: seen dumps + per-shard lineage -------------------
        # seen-shard state persists every checkpoint_every rounds (resume
        # replays the rounds since the last dump — deterministic, so the
        # replay is bit-identical); digests go into lineage every round
        t_c0 = time.perf_counter()
        ckpt_every = int(cfg.extra.get("checkpoint_every", 1))
        if r % ckpt_every == ckpt_every - 1 or n_next == 0:
            seen_dir = self._p("seen", f"round_{r:05d}")
            digests = self.seen.save(seen_dir)
            with open(os.path.join(seen_dir, "_COMPLETE"), "w") as f:
                f.write("ok")  # all shards dumped (partial dumps unsafe to load)
        else:
            digests = self.seen.digests()
        t_ckpt = time.perf_counter() - t_c0
        t_l0 = time.perf_counter()
        self._write_health(r)
        stats = self._lineage(r, rounds_dir, digests, time.perf_counter() - t0)
        stats["t_lineage"] = round(time.perf_counter() - t_l0, 2)
        stats["t_events"] = round(t_events, 2)
        stats["t_ckpt"] = round(t_ckpt, 2)
        stats["next_frontier"] = n_next
        stats["t_main"] = round(t_main, 2)
        stats["t_frontier"] = round(t_frontier, 2)
        return stats

    def _write_events(self, r: int, rounds_dir: str) -> None:
        """Events projection — written only after the rounds-dir rename
        (the publish-after-DB-success gating mirror,
        crawler_service.go:592-607). Per-round events are bounded by the
        round's fetch budget, so a driver-side pyarrow write by default;
        extra["events_via_ray"]=True switches to a Ray execution for
        giant-round configurations. Carry/discovered rows have null
        status, so the status filter selects page rows only."""
        cols = ["url", "url_hash", "host", "page_ts", "n_bytes", "lang", "status"]
        filt = pc.field("status") == STATUS_FETCHED
        page_dir = os.path.join(rounds_dir, "row_kind=page")
        src = page_dir if os.path.exists(page_dir) else rounds_dir
        if self.cfg.extra.get("events_via_ray"):
            ev = rd.read_parquet(src, columns=cols, filter=filt).map_batches(
                self._event_project, batch_format="pyarrow", fn_kwargs={"r": r}
            )
            _atomic_write(ev, self._p("events", f"round_{r:05d}"))
            return
        t = pads.dataset(src, format="parquet").to_table(columns=cols, filter=filt)
        d = self._p("events", f"round_{r:05d}")
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(self._event_project(t, r), os.path.join(tmp, "part-0.parquet"))
        shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)

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
        """Hybrid: small rounds derive the next frontier driver-side
        (bounded pandas/numpy work — a Ray execution's fixed startup cost
        would dominate); big rounds run the distributed pipeline. Both
        paths share the same primitive functions, so content is
        identical (tested by resume bit-identity with mixed paths)."""
        threshold = int(self.cfg.extra.get("frontier_driver_threshold", 30_000))
        if _count_rows(rounds_dir) <= threshold:
            return self._build_next_frontier_driver(r, rounds_dir)
        return self._build_next_frontier_ray(r, rounds_dir)

    def _build_next_frontier_ray(self, r: int, rounds_dir: str) -> int:
        cfg = self.cfg
        frontier_cols = [f.name for f in FRONTIER]
        n_rows = _count_rows(rounds_dir)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        blocks = max(1, min(2 * ncpu, -(-n_rows // 8192)))

        carry = (
            rd.read_parquet(
                rounds_dir,
                columns=frontier_cols + ["gate", "status"],
                override_num_blocks=blocks,
            )
            .map_batches(
                _carry_rows,
                fn_kwargs=dict(
                    round_no=r, max_retries=cfg.max_retries, skip_rounds=cfg.skip_rounds
                ),
                batch_format="pyarrow",
            )
        )

        # discovered: explode outlinks of fetched pages, normalize,
        # seen-filter (the anti-join vs crawl history, SURVEY.md J5).
        # No shuffle: discovered rows are pure functions of (url, round),
        # so the seen-shard first-claim is the round dedup.
        discovered = (
            rd.read_parquet(
                rounds_dir,
                columns=["outlinks", "status"],
                filter=(pc.field("status") == STATUS_FETCHED),
                override_num_blocks=blocks,
            )
            .map_batches(
                _explode_outlinks, fn_kwargs={"round_no": r}, batch_format="pyarrow"
            )
            .map_batches(
                SeenFilterBatch(self.seen.handles, round_no=r),
                batch_format="pyarrow",
                batch_size=8192,
            )
        )
        return _atomic_write(carry.union(discovered), self._p("frontier", f"round_{r + 1:05d}"))

    def _build_next_frontier_driver(self, r: int, rounds_dir: str) -> int:
        cfg = self.cfg
        frontier_cols = [f.name for f in FRONTIER]
        t = pads.dataset(rounds_dir, format="parquet").to_table(
            columns=frontier_cols + ["gate", "status", "outlinks"]
        )
        carry = _carry_rows(
            t, round_no=r, max_retries=cfg.max_retries, skip_rounds=cfg.skip_rounds
        )

        fetched = t.filter(pc.equal(t["status"], pa.scalar(STATUS_FETCHED)))
        disc = _explode_outlinks(fetched.select(["outlinks"]), round_no=r)
        if len(disc):
            hashes = np.asarray(disc["url_hash"].to_pandas(), dtype=np.uint64)
            novel = self.seen.check_and_insert(hashes)
            disc = disc.filter(pa.array(novel))
            nxt = pa.concat_tables([carry, disc.select([f.name for f in FRONTIER])])
        else:
            nxt = carry

        d = self._p("frontier", f"round_{r + 1:05d}")
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        if len(nxt):
            pq.write_table(nxt, os.path.join(tmp, "part-0.parquet"))
        shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)
        return len(nxt)

    def _lineage_bincounts(self, rounds_dir: str) -> np.ndarray:
        """Driver-side fallback: thin-column read of the round output →
        per-seen-shard bincount matrix, rows = [scheduled, fetched,
        deferred, failed, errors]. The pipelined mode normally gets the
        SAME matrix from the per-batch reports accumulated on the cutoff
        shards during the round (roundstep.py:5b — nothing corpus-sized
        ever crosses the driver); this path serves the legacy mode and
        the shard-restart-mid-round case where reports were lost.
        Works for both layouts: legacy flat (row_kind column in files)
        and pipelined (hive-partitioned row_kind=... subdirs)."""
        page_dir = os.path.join(rounds_dir, "row_kind=page")
        if os.path.exists(page_dir):
            pt = pads.dataset(page_dir, format="parquet").to_table(
                columns=["url_hash", "gate", "status"]
            )
            parts = [
                (pt, np.ones(len(pt), dtype=bool)),
            ]
            for kind in ("carry", "discovered"):
                d = os.path.join(rounds_dir, f"row_kind={kind}")
                if os.path.exists(d):
                    kt = pads.dataset(d, format="parquet").to_table(
                        columns=["url_hash", "gate", "status"]
                    )
                    parts.append((kt, np.zeros(len(kt), dtype=bool)))
            t = pa.concat_tables([p for p, _ in parts])
            page = np.concatenate([m for _, m in parts])
        else:
            t = pads.dataset(rounds_dir, format="parquet").to_table(
                columns=["url_hash", "gate", "status", "row_kind"]
            )
            row_kind = np.asarray(t["row_kind"].to_pandas(), dtype=object)
            page = row_kind == "page"
        gate = np.asarray(t["gate"].to_pandas(), dtype=object)
        status = np.asarray(t["status"].to_pandas(), dtype=object)
        n = self.cfg.n_seen_shards
        shard = (
            np.asarray(t["url_hash"].to_pandas(), dtype=np.uint64) % np.uint64(n)
        ).astype(np.int64)
        masks = [
            page & (gate == GATE_FETCH),
            page & (gate == GATE_FETCH) & (status == STATUS_FETCHED),
            (gate == GATE_DEFER) | (gate == GATE_SKIPPED),
            page & (gate == GATE_ROBOTS),
            page & (gate == GATE_FETCH) & (status == STATUS_ERROR),
        ]
        return np.stack(
            [np.bincount(shard[m], minlength=n) for m in masks]
        ).astype(np.int64)

    def _write_health(self, r: int) -> None:
        """Per-round component-health rows — the SystemHealth analog
        (``crawler_metrics.go:46-68``; reconnect-on-failure
        ``crawler_service.go:822-861``): one row per stateful shard actor
        with its reconstruction flag and state size, so a cluster
        operator can see which components restarted in which round.
        Written BEFORE the lineage _COMPLETE marker, so every complete
        round has health rows."""
        comps: list[tuple[str, list[dict]]] = [("seen", self.seen.health())]
        if getattr(self, "store", None) is not None:
            comps.append(("store", self.store.health()))
        if getattr(self, "cutoff_pool", None) is not None:
            comps.append(("cutoff", self.cutoff_pool.health()))
        comp_col, shard_col, rec_col, items_col = [], [], [], []
        cpu_col, rss_col = [], []
        for name, rows in comps:
            for j, h in enumerate(rows):
                comp_col.append(name)
                shard_col.append(j)
                rec_col.append(bool(h["reconstructed"]))
                items_col.append(int(h["items"]))
                cpu_col.append(float(h.get("cpu_s", 0.0)))
                rss_col.append(int(h.get("rss_kb", 0)))
        t = pa.table(
            {
                "round": pa.array(
                    np.full(len(comp_col), r, dtype=np.int32), type=pa.int32()
                ),
                "component": pa.array(comp_col, type=pa.string()),
                "shard_id": pa.array(
                    np.asarray(shard_col, dtype=np.int32), type=pa.int32()
                ),
                "reconstructed": pa.array(rec_col, type=pa.bool_()),
                "items": pa.array(
                    np.asarray(items_col, dtype=np.int64), type=pa.int64()
                ),
                # resource gauges (crawler_metrics.go:18-43 analog):
                # cumulative actor-process CPU seconds + resident memory
                "cpu_s": pa.array(
                    np.asarray(cpu_col, dtype=np.float64), type=pa.float64()
                ),
                "rss_kb": pa.array(
                    np.asarray(rss_col, dtype=np.int64), type=pa.int64()
                ),
            }
        )
        d = self._p("health", f"round_{r:05d}")
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(t, os.path.join(tmp, "part-0.parquet"))
        shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)

    def _lineage(self, r: int, rounds_dir: str, digests: list[bytes],
                 wall_s: float, pre: np.ndarray | None = None) -> dict:
        cfg = self.cfg
        c = pre if pre is not None else self._lineage_bincounts(rounds_dir)
        scheduled, fetched, deferred, failed, errors = c

        rows = {
            "round": np.full(cfg.n_seen_shards, r, dtype=np.int32),
            "partition_id": np.arange(cfg.n_seen_shards, dtype=np.int32),
            "seen_shard_digest": digests,
            "urls_scheduled": scheduled.astype(np.int64),
            "urls_fetched": fetched.astype(np.int64),
            "urls_deferred": deferred.astype(np.int64),
            "urls_failed": failed.astype(np.int64),
            "errors": errors.astype(np.int64),
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
        # resume needs seen-shard state: rewind to the newest round with a
        # seen dump (checkpoint_every may skip rounds); the replayed
        # rounds are deterministic → outputs overwrite bit-identically
        while last >= 0 and not os.path.exists(
            self._p("seen", f"round_{last:05d}", "_COMPLETE")
        ):
            last -= 1
        if last >= 0:
            self.seen.load(self._p("seen", f"round_{last:05d}"))
            start = last + 1
            self._reclaim_ingest(start)
        elif os.path.exists(self._p("frontier", "round_00000")) and os.path.exists(
            self._p("seen", "bootstrap", "_COMPLETE")
        ):
            self.seen.load(self._p("seen", "bootstrap"))
            start = 0
        else:
            if seeds is None:
                seeds = pq.read_table(cfg.extra["seeds_path"])
            self.bootstrap(seeds)
            start = 0
        # pipelined mode: the resumed/bootstrap round's politeness offers
        # came from an execution that no longer exists — re-derive them
        self._backfill_offers(start)
        if self.cfg.extra.get("error_backoff") and start > 0:
            self._backfill_errors(start - 1)

        limit = max_rounds if max_rounds is not None else cfg.max_rounds
        totals = {"rounds": 0, "fetched": 0, "scheduled": 0, "errors": 0, "failed": 0}
        r = start
        # hybrid fallback (scheduler_service.go:250-263,427-519 analog):
        # with watch mode on, an exhausted frontier does not terminate the
        # run immediately — the loop idles up to watch_idle_rounds poll
        # ticks re-scanning the watch dir, and switches back to crawling
        # the moment pushed pages revive the frontier. The idle wait is
        # pure polling (no state written), so determinism of the outputs
        # is untouched: they remain a function of which files appear.
        idle_limit = int(cfg.extra.get("watch_idle_rounds", 0))
        poll_s = float(cfg.extra.get("watch_poll_s", 0.05))
        idle = 0
        while r < start + limit:
            # watch mode: pick up newly published pages at the round
            # boundary — they can revive an otherwise-empty frontier
            self.ingest_new_pages(r)
            if self._frontier_count(r) == 0:
                if cfg.extra.get("watch_dir") and idle < idle_limit:
                    idle += 1
                    time.sleep(poll_s)
                    continue
                break
            idle = 0
            stats = self.run_round(r)
            totals["rounds"] += 1
            for k in ("fetched", "scheduled", "errors", "failed"):
                if k in stats:
                    totals[k] += stats[k]
            r += 1
        self._join_bg()
        totals["last_round"] = r - 1
        if totals["rounds"] and totals["scheduled"] == 0:
            # pipelined rounds defer their counting to the background
            # lineage writer — aggregate from the lineage checkpoints
            lin = pads.dataset(self._p("lineage"), format="parquet").to_table(
                columns=["round", "urls_scheduled", "urls_fetched", "urls_failed", "errors"]
            ).to_pandas()
            lin = lin[(lin["round"] >= start) & (lin["round"] <= totals["last_round"])]
            totals["scheduled"] = int(lin["urls_scheduled"].sum())
            totals["fetched"] = int(lin["urls_fetched"].sum())
            totals["failed"] = int(lin["urls_failed"].sum())
            totals["errors"] = int(lin["errors"].sum())
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


def health_output(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(out_dir, "health"))


def external_events_output(out_dir: str) -> rd.Dataset:
    """Rows pushed through the watch-mode ``logs/`` channel (the
    filtered logs-subscription analog), committed per ingest batch."""
    return rd.read_parquet(os.path.join(out_dir, "external"))
