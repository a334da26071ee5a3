"""Sharded URL-seen set — the engine's core stateful stage (SURVEY.md ST2).

The reference's dedup identity lives in MongoDB unique indexes probed
before every write (``crawler_service.go:433-457``,
``block_repository_impl.go:135-148``). Here it is a pool of Ray actors,
each owning one :class:`~.cuckoo.CuckooFilter` shard; URLs route to the
shard ``url_hash % n_shards`` so each URL has exactly one authority —
an anti-join of candidates against crawl history with no shuffle of the
big side (SURVEY.md J5).

Two interchangeable implementations share the routing logic:

* :class:`LocalSeenSet` — plain in-process shards (golden single-threaded
  simulator + unit tests);
* :class:`ActorSeenSet` — ``@ray.remote`` shard actors; handles are
  serializable, so ``map_batches`` UDFs can probe shards from any worker.

Per-round checkpointing: each shard dumps its table to
``seen/round=<r>/shard_<j>.npz`` and its sha256 digest goes into the
lineage row — resume reloads shards bit-identically
(analog of resume-from-last-processed, ``crawler_service.go:199-226``).
"""

from __future__ import annotations

import os

import numpy as np
import ray

from .cuckoo import CuckooFilter


def shard_of(hashes: np.ndarray, n_shards: int) -> np.ndarray:
    return (hashes.astype(np.uint64) % np.uint64(n_shards)).astype(np.int64)


def _scatter_gather(hashes: np.ndarray, n_shards: int, call) -> np.ndarray:
    """Split ``hashes`` by owning shard, apply ``call(shard_id, sub)`` →
    bool array per shard, reassemble in input order."""
    out = np.zeros(len(hashes), dtype=bool)
    if len(hashes) == 0:
        return out
    sid = shard_of(hashes, n_shards)
    for j in range(n_shards):
        ix = np.flatnonzero(sid == j)
        if ix.size:
            out[ix] = call(j, hashes[ix])
    return out


class LocalSeenSet:
    """In-process reference implementation (shared by tests + golden)."""

    def __init__(self, n_shards: int, capacity_per_shard: int):
        self.n_shards = n_shards
        self.shards = [CuckooFilter(capacity_per_shard, seed=j) for j in range(n_shards)]

    def check_and_insert(self, hashes: np.ndarray) -> np.ndarray:
        return _scatter_gather(
            hashes, self.n_shards, lambda j, h: self.shards[j].check_and_insert_many(h)
        )

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return _scatter_gather(
            hashes, self.n_shards, lambda j, h: self.shards[j].contains_many(h)
        )

    def digests(self) -> list[bytes]:
        return [s.digest() for s in self.shards]

    def counts(self) -> list[int]:
        return [s.count for s in self.shards]


def claim_token(hashes: np.ndarray, salt: int = 0) -> int:
    """Stable identity of one claim call's content. A retried Ray task
    re-derives the same discovered sub-array (round inputs are
    deterministic), so its token matches and the shard replays the claim
    instead of reporting the rows as duplicates (which would silently
    drop them from the frontier — ADVICE r01, roundstep.py:158).

    ``salt`` mixes in a stable TASK identity (ADVICE r02: a purely
    content-derived token mis-classifies a different task whose per-shard
    sub-array happens to be byte-identical — e.g. two batches each
    discovering the same single URL — as a retry, double-admitting the
    URL). Callers pass the hash of the task's INPUT frontier batch:
    frontier batches partition a deduplicated frontier, so they are
    globally unique across tasks and reproduced exactly by a Ray retry."""
    import hashlib as _hl

    return int.from_bytes(
        _hl.blake2b(
            int(salt).to_bytes(8, "little", signed=False)
            + hashes.astype(np.uint64).tobytes(),
            digest_size=8,
        ).digest(),
        "little",
    )


def _replay_claims(
    filt: CuckooFilter, claims: dict, hashes: np.ndarray, round_no: int, token: int
) -> np.ndarray:
    """check_and_insert with replay safety: claims are logged per
    (round, url_hash) with the claimant's token; a non-novel hash whose
    logged claimant matches is a task RETRY and re-reports novel=True
    (first occurrence in the batch only, preserving within-batch dedup)."""
    log = claims.setdefault(round_no, {})
    novel = filt.check_and_insert_many(hashes)
    if log and not novel.all():
        seen_in_batch: set = set()
        for j in range(len(hashes)):
            h = int(hashes[j])
            if not novel[j] and h not in seen_in_batch and log.get(h) == token:
                novel[j] = True
            seen_in_batch.add(h)
    for j in np.flatnonzero(novel):
        log[int(hashes[j])] = token
    return novel


@ray.remote(num_cpus=0, max_restarts=2, max_task_retries=-1)
class SeenShard:
    """One shard actor. The decorator default ``num_cpus=0`` is always
    overridden at pool creation with a fractional reservation from
    state/resources.py — the pool claims a fixed fraction of the
    cluster, so its real CPU use is paid for proportionally at every
    cluster size instead of free-riding (r03 verdict #2); the shard's
    dominant footprint is still the filter table's memory.

    Fault tolerance (the Ray-native analog of the reference's
    reconnect-on-failure loops, ``crawler_service.go:727-864``): on actor
    RESTART the constructor rebuilds membership from the newest complete
    npz dump under ``ckpt_root`` (which must be shared storage on a real
    cluster) and raises the ``fresh`` flag with the dump's round. The
    driver (``CrawlPipeline._heal_seen``) detects this at the next round
    boundary and replays the claims of the GAP rounds (dump round+1 …
    now) from the committed frontier outputs — so checkpoint_every > 1
    no longer silently forgets up to N-1 rounds of claims on a shard
    restart (ADVICE r02)."""

    def __init__(self, shard_id: int, capacity: int, ckpt_root: str | None = None):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity, seed=shard_id)
        # round → {url_hash → claimant token}; dropped by end_round once
        # the round's output is committed (no more task retries possible)
        self._claims: dict[int, dict[int, int]] = {}
        # restart detection: (fresh flag, round of the restored dump;
        # -1 = bootstrap dump, -2 = nothing restored)
        self._fresh = False
        self._restored_round = -2
        if ckpt_root:
            try:
                restarted = ray.get_runtime_context().was_current_actor_reconstructed
            except Exception:
                restarted = False
            if restarted:
                self._fresh = True
                path, rr = self._newest_dump(ckpt_root)
                if path is not None:
                    z = np.load(path)
                    self.filter = CuckooFilter.restore(
                        {"table": z["table"], "count": int(z["count"]), "seed": shard_id}
                    )
                    self._restored_round = rr

    def _newest_dump(self, root: str) -> tuple[str | None, int]:
        import glob as _glob

        dirs = sorted(_glob.glob(os.path.join(root, "round_*")), reverse=True)
        dirs.append(os.path.join(root, "bootstrap"))
        for d in dirs:
            if os.path.exists(os.path.join(d, "_COMPLETE")):
                f = os.path.join(d, f"shard_{self.shard_id}.npz")
                if os.path.exists(f):
                    name = os.path.basename(d)
                    rr = int(name.split("_")[1]) if name.startswith("round_") else -1
                    return f, rr
        return None, -2

    def consume_fresh(self) -> tuple[bool, int]:
        """→ (restarted since last check, restored dump round). The
        driver replays gap-round claims to shards reporting fresh."""
        f, self._fresh = self._fresh, False
        return f, self._restored_round

    def health(self) -> dict:
        """SystemHealth analog (crawler_metrics.go:46-68): has this
        shard ever been reconstructed, and how much state does it hold."""
        try:
            rec = ray.get_runtime_context().was_current_actor_reconstructed
        except Exception:
            rec = False
        from .resources import proc_rss_kb

        tm = os.times()
        return {"reconstructed": bool(rec), "items": int(self.filter.count),
                "cpu_s": float(tm.user + tm.system),
                "rss_kb": proc_rss_kb()}

    def check_and_insert(
        self, hashes: np.ndarray, round_no: int | None = None, token: int | None = None
    ) -> np.ndarray:
        if round_no is None:
            return self.filter.check_and_insert_many(hashes)
        return _replay_claims(self.filter, self._claims, hashes, round_no, token)

    def end_round(self, upto_round: int) -> None:
        self._claims = {r: v for r, v in self._claims.items() if r > upto_round}

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.contains_many(hashes)

    def digest(self) -> bytes:
        return self.filter.digest()

    def count(self) -> int:
        return self.filter.count

    def dump_npz(self, path: str) -> bytes:
        """Persist shard state; returns the digest for the lineage row."""
        tmp = path + ".tmp.npz"  # np.savez appends .npz unless present
        np.savez_compressed(tmp, table=self.filter.table, count=self.filter.count)
        os.replace(tmp, path)
        return self.filter.digest()

    def load_npz(self, path: str) -> bytes:
        z = np.load(path)
        self.filter = CuckooFilter.restore(
            {"table": z["table"], "count": int(z["count"]), "seed": self.shard_id}
        )
        # a driver-driven load is authoritative: the resume path rewinds
        # to this dump's round and replays from there — no gap to heal
        self._fresh = False
        return self.filter.digest()


class ActorSeenSet:
    """Driver-side bundle of shard actor handles."""

    def __init__(self, n_shards: int, capacity_per_shard: int,
                 ckpt_root: str | None = None,
                 num_cpus_each: float | None = None):
        from .resources import shard_cpu_reservation

        if num_cpus_each is None:
            num_cpus_each = shard_cpu_reservation("seen", n_shards)
        self.n_shards = n_shards
        self.handles = [
            SeenShard.options(num_cpus=num_cpus_each).remote(
                j, capacity_per_shard, ckpt_root
            )
            for j in range(n_shards)
        ]

    def check_and_insert(self, hashes: np.ndarray) -> np.ndarray:
        sid = shard_of(hashes, self.n_shards)
        out = np.zeros(len(hashes), dtype=bool)
        refs, ixs = [], []
        for j in range(self.n_shards):
            ix = np.flatnonzero(sid == j)
            if ix.size:
                refs.append(self.handles[j].check_and_insert.remote(hashes[ix]))
                ixs.append(ix)
        for ix, res in zip(ixs, ray.get(refs)):
            out[ix] = res
        return out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        sid = shard_of(hashes, self.n_shards)
        out = np.zeros(len(hashes), dtype=bool)
        refs, ixs = [], []
        for j in range(self.n_shards):
            ix = np.flatnonzero(sid == j)
            if ix.size:
                refs.append(self.handles[j].contains.remote(hashes[ix]))
                ixs.append(ix)
        for ix, res in zip(ixs, ray.get(refs)):
            out[ix] = res
        return out

    def digests(self) -> list[bytes]:
        return ray.get([h.digest.remote() for h in self.handles])

    def counts(self) -> list[int]:
        return ray.get([h.count.remote() for h in self.handles])

    def consume_fresh(self) -> list[tuple[bool, int]]:
        """Per shard: (restarted since last check, restored dump round)."""
        return ray.get([h.consume_fresh.remote() for h in self.handles])

    def health(self) -> list[dict]:
        return ray.get([h.health.remote() for h in self.handles])

    def insert_to_shards(self, shard_ids: list[int], hashes: np.ndarray) -> None:
        """Route ``hashes`` by owner and re-insert into the GIVEN shards
        only (gap-round claim replay after a shard restart; inserting an
        existing member is a no-op, so over-replay is safe)."""
        want = set(shard_ids)
        sid = shard_of(hashes, self.n_shards)
        refs = []
        for j in shard_ids:
            ix = np.flatnonzero(sid == j)
            if ix.size and j in want:
                refs.append(self.handles[j].check_and_insert.remote(hashes[ix]))
        ray.get(refs)

    def save(self, dirpath: str) -> list[bytes]:
        os.makedirs(dirpath, exist_ok=True)
        return ray.get(
            [
                h.dump_npz.remote(os.path.join(dirpath, f"shard_{j}.npz"))
                for j, h in enumerate(self.handles)
            ]
        )

    def load(self, dirpath: str) -> list[bytes]:
        return ray.get(
            [
                h.load_npz.remote(os.path.join(dirpath, f"shard_{j}.npz"))
                for j, h in enumerate(self.handles)
            ]
        )

    def end_round(self, upto_round: int) -> None:
        """Drop claim logs for rounds ≤ upto_round (their executions are
        committed; no further task retries can arrive)."""
        ray.get([h.end_round.remote(upto_round) for h in self.handles])

    def kill(self) -> None:
        for h in self.handles:
            ray.kill(h)
        self.handles = []


class SeenFilterBatch:
    """``map_batches`` UDF: keep only rows whose ``url_hash`` is novel,
    claiming them in the seen shards as a side effect (the distributed
    equivalent of exists-probe-then-insert-with-E11000-as-success,
    ``crawler_service.go:433-457``). Actor handles serialize into the UDF
    closure; each batch task scatter-gathers to the owning shards.
    When ``round_no`` is given, claims are replay-safe under Ray task
    retry (see :func:`claim_token`)."""

    def __init__(self, handles: list, round_no: int | None = None):
        self.handles = handles
        self.n_shards = len(handles)
        self.round_no = round_no

    def __call__(self, batch):
        import pyarrow as pa

        hashes = np.asarray(batch["url_hash"].to_pandas(), dtype=np.uint64)
        novel = claim_scatter(self.handles, hashes, self.round_no)
        return batch.filter(pa.array(novel))


def claim_scatter_submit(
    handles: list, hashes: np.ndarray, round_no: int | None = None,
    task_key: int | None = None,
) -> tuple[list, list, int]:
    """Issue the shard claim calls WITHOUT waiting — lets the caller
    overlap other work (e.g. politeness offers for rows that don't
    depend on the claim results) with the actor round trips.

    ``task_key``: stable identity of the calling task (hash of its input
    frontier batch). Defaults to the full claimed array's own hash — the
    per-shard token is then still salted by what the task claimed
    OVERALL, so two tasks with identical per-shard sub-arrays but
    different claim sets can no longer collide (ADVICE r02)."""
    n_shards = len(handles)
    sid = shard_of(hashes, n_shards)
    if round_no is not None and task_key is None:
        task_key = claim_token(hashes)
    refs, ixs = [], []
    for j in range(n_shards):
        ix = np.flatnonzero(sid == j)
        if ix.size:
            sub = hashes[ix]
            if round_no is None:
                refs.append(handles[j].check_and_insert.remote(sub))
            else:
                refs.append(
                    handles[j].check_and_insert.remote(
                        sub, round_no, claim_token(sub, task_key)
                    )
                )
            ixs.append(ix)
    return refs, ixs, len(hashes)


def claim_scatter_finish(refs: list, ixs: list, n: int) -> np.ndarray:
    novel = np.zeros(n, dtype=bool)
    for ix, res in zip(ixs, ray.get(refs)):
        novel[ix] = res
    return novel


def claim_scatter(
    handles: list, hashes: np.ndarray, round_no: int | None = None,
    task_key: int | None = None,
) -> np.ndarray:
    """Scatter-gather check_and_insert against the owning shards; with a
    round_no, each sub-array carries its task-salted claim token so a
    retried task replays its own claims instead of losing the rows."""
    return claim_scatter_finish(
        *claim_scatter_submit(handles, hashes, round_no, task_key)
    )
