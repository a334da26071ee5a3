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


class PolitenessPhase1:
    """Stateless-per-batch gate (actor pool so the robots dict is fetched
    from the object store once per actor, not once per batch).

    Input: pandas frontier batch (+ current round). Output: same rows with
    ``gate`` ∈ {candidate, defer, robots_denied, skipped} and a ``pkey``
    politeness-shuffle key. Per-batch partial top-k caps each host's
    candidate rows at its full budget."""

    def __init__(self, robots_ref, round_no: int, round_ms: int,
                 default_delay_ms: int, max_per_host: int, n_salt: int):
        import ray

        self.robots = ray.get(robots_ref) if not isinstance(robots_ref, dict) else robots_ref
        self.round_no = round_no
        self.round_ms = round_ms
        self.default_delay_ms = default_delay_ms
        self.max_per_host = max_per_host
        self.n_salt = max(1, n_salt)

    def _budget(self, host: str) -> int:
        return budget_for(
            host, self.robots, self.round_ms, self.default_delay_ms, self.max_per_host
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        gate = np.full(n, GATE_CANDIDATE, dtype=object)

        urls = df["url"].to_numpy()
        hosts = df["host"].to_numpy()
        # robots gate (analog of skip-set filter F4, scheduler_service.go:291-303
        # — but content-based: disallowed prefixes never fetch)
        for i in range(n):
            if robots_denied(urls[i], hosts[i], self.robots):
                gate[i] = GATE_ROBOTS
        # retry skip-window: rows sitting out their skip_rounds penalty
        skipped = df["skip_until_round"].to_numpy() > self.round_no
        gate[skipped & (gate == GATE_CANDIDATE)] = GATE_SKIPPED

        df = df.assign(gate=gate)
        if self.n_salt > 1:
            salt = (
                df["url_hash"].to_numpy(dtype=np.uint64) % np.uint64(self.n_salt)
            ).astype(np.int64)
            df["pkey"] = df["host"] + "#" + salt.astype(str)
        else:
            df["pkey"] = df["host"]

        # partial top-k per salted key (a combiner: the global per-key
        # top-k is a subset of the union of per-batch top-ks, so cutting
        # here never cuts a row phase 2 would select)
        cand = df[df["gate"] == GATE_CANDIDATE]
        if len(cand):
            ranked = cand.sort_values(ORDER_COLS, kind="mergesort")
            keep_ix = []
            for pkey, g in ranked.groupby("pkey", sort=False):
                host, salt_no = (pkey.rsplit("#", 1) if self.n_salt > 1 else (pkey, 0))
                b = salt_budget(self._budget(host), self.n_salt, int(salt_no))
                keep_ix.append(g.index[:b].to_numpy())
            keep = pd.Index(np.concatenate(keep_ix))
            over = cand.index.difference(keep)
            df.loc[over, "gate"] = GATE_DEFER
        return df


class PolitenessFinal:
    """Per-(host,salt)-group final top-k, run as a ``map_groups`` actor
    pool after the groupby("pkey") shuffle — the 'token bucket lives on
    exactly one actor per key' stage of the north star. Candidates beyond
    the salt's budget share become defer."""

    def __init__(self, robots_ref, round_ms: int, default_delay_ms: int,
                 max_per_host: int, n_salt: int):
        import ray

        self.robots = ray.get(robots_ref) if not isinstance(robots_ref, dict) else robots_ref
        self.round_ms = round_ms
        self.default_delay_ms = default_delay_ms
        self.max_per_host = max_per_host
        self.n_salt = max(1, n_salt)

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return g
        pkey = g["pkey"].iat[0]
        if self.n_salt > 1:
            host, salt_s = pkey.rsplit("#", 1)
            salt = int(salt_s)
        else:
            host, salt = pkey, 0
        budget = salt_budget(
            budget_for(host, self.robots, self.round_ms,
                       self.default_delay_ms, self.max_per_host),
            self.n_salt,
            salt,
        )
        cand_mask = g["gate"].to_numpy() == GATE_CANDIDATE
        cand = g[cand_mask].sort_values(ORDER_COLS, kind="mergesort")
        fetch_ix = cand.index[:budget]
        gate = g["gate"].copy()
        gate.loc[g.index[cand_mask]] = GATE_DEFER
        gate.loc[fetch_ix] = GATE_FETCH
        return g.assign(gate=gate)
