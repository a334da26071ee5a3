"""Per-host politeness budgets + robots gating (SURVEY.md ST3).

The reference rate-limits with ONE global token — a blocking
min-500ms-between-requests sleep shared by every worker
(``ethereum_service.go:29-30,585-591``) plus hardcoded inter-block /
inter-batch sleeps (``crawler_service.go:315-329``). That is the
reference's scaling ceiling: fine at 1 worker, fatal at 4N nodes.

Here politeness is **non-blocking and deterministic**: a crawl round
represents ``round_ms`` of simulated time; a host whose robots.txt says
``crawl_delay_ms = d`` gets ``floor(round_ms / d)`` fetch slots in the
round (capped at ``max_per_host_round``). URLs beyond the budget are
*deferred to the next round* instead of sleeping — the token bucket
refills at the round boundary. No wall clock appears anywhere, which is
what makes checkpoint-resume bit-identical.

Selection is exact per-host top-k by the frontier ordering
``(priority, depth, warc_ts, url)`` computed in two phases:

* phase 1 — stateless per-batch partial top-k (a combiner: the global
  top-k of a host is a subset of the union of per-batch top-ks), which
  bounds what the shuffle moves;
* phase 2 — ``groupby(politeness-key).map_groups`` over an actor pool
  holding the robots table (loaded once per actor from a ``ray.put``
  broadcast), final top-k per key.

Host-skew salting (explicit skew rule, SURVEY.md §4/§7.3): the groupby
key is ``host#(url_hash % n_salt)``, so a mega-host's frontier rows split
across ``n_salt`` groups; the host's budget is split deterministically
across salts (floor split, remainder to salt 0 — the sum is exactly the
budget, so the per-true-host cap still holds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

ORDER_COLS = ["priority", "depth", "warc_ts", "url"]

GATE_CANDIDATE = "candidate"
GATE_FETCH = "fetch"
GATE_DEFER = "defer"
GATE_ROBOTS = "robots_denied"
GATE_SKIPPED = "skipped"


def load_robots(path: str) -> dict:
    """robots.parquet → {host: (crawl_delay_ms, tuple(disallow_prefixes))}.
    Broadcast once per run with ray.put; actors ray.get it in __init__."""
    t = pq.read_table(path)
    return {
        h: (int(d), tuple(p))
        for h, d, p in zip(
            t["host"].to_pylist(),
            t["crawl_delay_ms"].to_pylist(),
            t["disallow_prefixes"].to_pylist(),
        )
    }


def budget_for(
    host: str,
    robots: dict,
    round_ms: int,
    default_delay_ms: int,
    max_per_host: int,
) -> int:
    delay = robots.get(host, (default_delay_ms, ()))[0]
    if delay <= 0:
        return max_per_host
    return max(1, min(max_per_host, round_ms // delay))


def salt_budget(budget: int, n_salt: int, salt: int) -> int:
    """Deterministic floor split; remainder goes to salt 0. Sums to budget."""
    if n_salt <= 1:
        return budget
    base = budget // n_salt
    if salt == 0:
        return budget - base * (n_salt - 1)
    return base


def path_of(url: str) -> str:
    parts = url.split("/", 3)
    return "/" + parts[3] if len(parts) > 3 else "/"


def robots_denied(url: str, host: str, robots: dict) -> bool:
    prefixes = robots.get(host, (0, ()))[1]
    if not prefixes:
        return False
    p = path_of(url)
    return any(p.startswith(pref) for pref in prefixes)


def phase1_gate(
    df: pd.DataFrame,
    *,
    robots_ref,
    round_no: int,
    round_ms: int,
    default_delay_ms: int,
    max_per_host: int,
    n_salt: int,
    cutoff_handles: list | None = None,
) -> pd.DataFrame:
    """Per-batch gate — a stateless map_batches task; the robots table is
    a ray.put broadcast resolved once per worker process (no per-round
    actor-pool spin-up — that fixed cost would cap scaling efficiency).

    Output: same rows with ``gate`` ∈ {candidate, defer, robots_denied,
    skipped} and a ``pkey`` politeness-shuffle key. Per-batch partial
    top-k caps each salted key at its budget share (a combiner: the
    global per-key top-k is a subset of the union of per-batch top-ks,
    so cutting here never cuts a row the final stage would select)."""
    from ..functions.broadcast import get_broadcast

    robots = get_broadcast(robots_ref)
    n_salt = max(1, n_salt)
    n = len(df)
    gate = np.full(n, GATE_CANDIDATE, dtype=object)

    urls = df["url"].to_numpy()
    hosts = df["host"].to_numpy()
    # robots gate (analog of skip-set filter F4, scheduler_service.go:291-303
    # — but content-based: disallowed prefixes never fetch)
    for i in range(n):
        if robots_denied(urls[i], hosts[i], robots):
            gate[i] = GATE_ROBOTS
    # retry skip-window: rows sitting out their skip_rounds penalty
    skipped = df["skip_until_round"].to_numpy() > round_no
    gate[skipped & (gate == GATE_CANDIDATE)] = GATE_SKIPPED

    df = df.assign(gate=gate)
    if n_salt > 1:
        salt = (
            df["url_hash"].to_numpy(dtype=np.uint64) % np.uint64(n_salt)
        ).astype(np.int64)
        df["pkey"] = df["host"] + "#" + salt.astype(str)
    else:
        df["pkey"] = df["host"]

    cand = df[df["gate"] == GATE_CANDIDATE]
    if len(cand):
        ranked = cand.sort_values(ORDER_COLS, kind="mergesort")
        keep_ix = []
        offers: dict[str, pd.DataFrame] = {}
        for pkey, g in ranked.groupby("pkey", sort=False):
            host, salt_no = (pkey.rsplit("#", 1) if n_salt > 1 else (pkey, 0))
            b = salt_budget(
                budget_for(host, robots, round_ms, default_delay_ms, max_per_host),
                n_salt,
                int(salt_no),
            )
            keep_ix.append(g.index[:b].to_numpy())
            if cutoff_handles is not None:
                offers[pkey] = g.iloc[:b]
        keep = pd.Index(np.concatenate(keep_ix))
        over = cand.index.difference(keep)
        df.loc[over, "gate"] = GATE_DEFER
        if cutoff_handles is not None and offers:
            _scatter_offers(offers, cutoff_handles)
    return df


def _scatter_offers(offers: dict, handles: list) -> None:
    """Send each pkey's partial top-k order-keys to its owning cutoff
    actor (hash routing); ray.get ensures delivery before the task ends,
    so the barrier at the end of the phase-1 execution means every
    candidate has been offered."""
    import ray

    from ..functions.hashing import hash_strings

    k = len(handles)
    pkeys = list(offers)
    owner = hash_strings(pkeys) % np.uint64(k)
    refs = []
    for j in range(k):
        batch = {
            pk: (
                offers[pk]["priority"].to_numpy(dtype=np.int64),
                offers[pk]["depth"].to_numpy(dtype=np.int64),
                offers[pk]["warc_ts"].to_numpy(dtype="datetime64[us]").astype(np.int64),
                offers[pk]["url"].to_numpy(dtype=object),
            )
            for i, pk in enumerate(pkeys)
            if owner[i] == j
        }
        if batch:
            refs.append(handles[j].offer.remote(batch))
    ray.get(refs)


class _CutoffState:
    """Per-key running top-budget of order keys. The retained set is the
    unique global top-budget (total order — url tie-break — no dups), so
    the result is independent of offer arrival order."""

    def __init__(self):
        self.keys: dict[str, list] = {}

    def offer(self, batch: dict, budgets: dict) -> None:
        for pk, (prio, depth, ts, urls) in batch.items():
            rows = list(zip(prio.tolist(), depth.tolist(), ts.tolist(), urls.tolist()))
            cur = self.keys.get(pk)
            if cur is None:
                cur = []
                self.keys[pk] = cur
            cur.extend(rows)
            b = budgets[pk]
            if len(cur) > b:
                cur.sort()
                del cur[b:]

    def cutoffs(self, budgets: dict) -> dict:
        out = {}
        for pk, rows in self.keys.items():
            rows.sort()
            b = budgets[pk]
            if len(rows) >= b:
                out[pk] = rows[b - 1]  # budget-th smallest order key
            # fewer candidates than budget → no cutoff (all selected)
        return out


def make_budget_fn(robots: dict, round_ms: int, default_delay_ms: int,
                   max_per_host: int, n_salt: int):
    def f(pkey: str) -> int:
        host, salt = (pkey.rsplit("#", 1) if n_salt > 1 else (pkey, 0))
        return salt_budget(
            budget_for(host, robots, round_ms, default_delay_ms, max_per_host),
            n_salt,
            int(salt),
        )

    return f


class CutoffPool:
    """Pool of politeness-bucket actors — the per-host token buckets of
    the north star, keyed by pkey hash instead of a groupby shuffle.
    Phase 1 offers partial top-ks during the gating execution; the driver
    then collects exact per-key cutoffs (the budget-th order key) and
    broadcasts them to the stateless cutoff gate. No all-to-all moves
    the frontier."""

    def __init__(self, n_actors: int, robots_ref, round_ms: int,
                 default_delay_ms: int, max_per_host: int, n_salt: int):
        import ray

        @ray.remote(num_cpus=0)
        class CutoffShard:
            def __init__(self, robots_ref, round_ms, default_delay_ms, max_per_host, n_salt):
                from ..functions.broadcast import get_broadcast
                from ..state.politeness import _CutoffState, make_budget_fn

                robots = get_broadcast(robots_ref)
                self._budget_fn = make_budget_fn(
                    robots, round_ms, default_delay_ms, max_per_host, n_salt
                )
                self._budgets: dict = {}
                self.state = _CutoffState()

            def _budget(self, pk):
                b = self._budgets.get(pk)
                if b is None:
                    b = self._budgets[pk] = self._budget_fn(pk)
                return b

            def offer(self, batch: dict) -> None:
                self.state.offer(batch, {pk: self._budget(pk) for pk in batch})

            def cutoffs(self) -> dict:
                return self.state.cutoffs({pk: self._budget(pk) for pk in self.state.keys})

            def reset(self) -> None:
                self.state = _CutoffState()

        self.handles = [
            CutoffShard.remote(robots_ref, round_ms, default_delay_ms, max_per_host, n_salt)
            for _ in range(n_actors)
        ]

    def reset(self) -> None:
        import ray

        ray.get([h.reset.remote() for h in self.handles])

    def collect(self) -> dict:
        import ray

        out: dict = {}
        for d in ray.get([h.cutoffs.remote() for h in self.handles]):
            out.update(d)
        return out

    def kill(self) -> None:
        import ray

        for h in self.handles:
            ray.kill(h)
        self.handles = []


def cutoff_gate(df: pd.DataFrame, *, cutoffs_ref) -> pd.DataFrame:
    """Stateless final gate: candidate → fetch iff its order key ≤ the
    broadcast per-key cutoff (or the key has no cutoff — fewer candidates
    than budget). Exactly reproduces the per-(host,salt) top-budget of
    the groupby path, with no shuffle."""
    from ..functions.broadcast import get_broadcast

    cutoffs = get_broadcast(cutoffs_ref)
    gate = df["gate"].to_numpy(dtype=object).copy()
    cand_ix = np.flatnonzero(gate == GATE_CANDIDATE)
    if len(cand_ix):
        sub = df.iloc[cand_ix]
        ts = sub["warc_ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        fetch = np.zeros(len(cand_ix), dtype=bool)
        for k, (pk, p, d, t, u) in enumerate(
            zip(sub["pkey"], sub["priority"], sub["depth"], ts, sub["url"])
        ):
            c = cutoffs.get(pk)
            fetch[k] = c is None or (int(p), int(d), int(t), u) <= c
        gate[cand_ix[fetch]] = GATE_FETCH
        gate[cand_ix[~fetch]] = GATE_DEFER
    return df.assign(gate=gate)


def final_gate(
    g: pd.DataFrame,
    *,
    robots_ref,
    round_ms: int,
    default_delay_ms: int,
    max_per_host: int,
    n_salt: int,
) -> pd.DataFrame:
    """Per-(host,salt)-group final top-k after the groupby("pkey")
    shuffle: the group IS the host's (salted) token bucket for the round
    — budget slots are granted in frontier order, the rest defer to the
    next round (the bucket refills at the round boundary). Deterministic:
    no wall clock, no mutable state — the reference's global-sleep rate
    limiter (ethereum_service.go:585-591) replaced by pure selection."""
    from ..functions.broadcast import get_broadcast

    if not len(g):
        return g
    robots = get_broadcast(robots_ref)
    n_salt = max(1, n_salt)
    pkey = g["pkey"].iat[0]
    if n_salt > 1:
        host, salt_s = pkey.rsplit("#", 1)
        salt = int(salt_s)
    else:
        host, salt = pkey, 0
    budget = salt_budget(
        budget_for(host, robots, round_ms, default_delay_ms, max_per_host),
        n_salt,
        salt,
    )
    cand_mask = g["gate"].to_numpy() == GATE_CANDIDATE
    cand = g[cand_mask].sort_values(ORDER_COLS, kind="mergesort")
    fetch_ix = cand.index[:budget]
    gate = g["gate"].copy()
    gate.loc[g.index[cand_mask]] = GATE_DEFER
    gate.loc[fetch_ix] = GATE_FETCH
    return g.assign(gate=gate)
