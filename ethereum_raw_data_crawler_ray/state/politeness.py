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

Host-skew salting (explicit skew rule, SURVEY.md §4/§7.3): the politeness
key of a salted host is ``host#(url_hash % n)#n``, splitting its frontier
rows across ``n`` groups; the host's budget is split deterministically
across salts (floor split, remainder to salt 0 — the sum is exactly the
budget, so the per-true-host cap still holds). ``n`` is the global base
(``extra["host_salt"]``) raised AUTOMATICALLY per host by
:func:`salt_count_for` whenever the host's raw candidate count exceeds
``CrawlConfig.host_skew_threshold`` (decided at round collect from the
previous round's offered counts — one round of lag, deterministic, and
mirrored by the golden simulator). Auto-salting applies to the default
cutoff mode; the legacy groupby cross-validation mode uses the global
base only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

# frontier ordering comparator: (priority, depth, warc_ts) heap order
# with url_hash as the numeric tie-break — a total order except for
# 64-bit hash collisions (negligible; a collision can transiently exceed
# a host budget by one, which is crawl-sane and deterministic since the
# golden simulator uses the same comparator). A numeric tie-break keeps
# every sort/cutoff comparison vectorized — string tie-breaks made the
# politeness actors the serial floor.
ORDER_COLS = ["priority", "depth", "warc_ts", "url_hash"]

# cutoff sentinel: this politeness key selects NOTHING this round (its
# budget is 0 — e.g. a salt's share of a backoff-shrunk budget of 1).
# Distinct from "no cutoff entry", which means all candidates fetch.
CUTOFF_NONE = "none"

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


def salt_count_for(count: int, threshold: int, base: int, cap: int = 64) -> int:
    """Automatic host-skew salting rule (SURVEY.md §4): a host whose
    per-round CANDIDATE count exceeds ``threshold`` gets its politeness
    key split into ceil(count/threshold) salted sub-keys (bounded by
    ``cap``), so no single politeness group outgrows the threshold. The
    count is the raw candidate total — a pure function of the frontier,
    independent of batching, so the decision is deterministic."""
    base = max(1, base)
    if threshold <= 0 or count <= threshold:
        return base
    return max(base, min(cap, -(-count // threshold)))


def backoff_budget(budget: int, n_timeout: int, n_rate_limit: int = 0) -> int:
    """Per-host error-CLASS backoff (analog of the reference's split
    backoff, ``ethereum_service.go:594-624``: timeout errors back off
    linearly in the attempt, rate-limit errors quadratically). A host
    that produced ``n_timeout`` timeout errors and ``n_rate_limit``
    rate-limit errors last round behaves as if its crawl delay were
    ``(1 + n_timeout) * (1 + n_rate_limit)²`` times longer this round —
    linear in timeouts, quadratic in rate-limits — so its budget shrinks
    to ``max(1, budget // that)``, recovering the round after the errors
    stop (no sticky state)."""
    if n_timeout <= 0 and n_rate_limit <= 0:
        return budget
    return max(1, budget // ((1 + n_timeout) * (1 + n_rate_limit) ** 2))


def parse_pkey(pk: str) -> tuple[str, int, int]:
    """pkey → (host, salt, n_salt). Unsalted keys are the bare host;
    salted keys are ``host#salt#n_salt`` (self-describing, so budget
    computation needs no out-of-band salt table)."""
    if "#" not in pk:
        return pk, 0, 1
    host, s, n = pk.rsplit("#", 2)
    return host, int(s), int(n)


def path_of(url: str) -> str:
    parts = url.split("/", 3)
    return "/" + parts[3] if len(parts) > 3 else "/"


def robots_denied(url: str, host: str, robots: dict) -> bool:
    prefixes = robots.get(host, (0, ()))[1]
    if not prefixes:
        return False
    p = path_of(url)
    return any(p.startswith(pref) for pref in prefixes)


def robots_denied_mask(urls: np.ndarray, hosts: np.ndarray, robots: dict) -> np.ndarray:
    """Vectorized robots gate: look up each UNIQUE host once; the
    per-row prefix check runs only for rows of hosts that actually have
    disallow prefixes (typically a small minority — the round-1 version
    paid a dict probe per row in every round-step task)."""
    out = np.zeros(len(urls), dtype=bool)
    if not robots or len(urls) == 0:
        return out
    uniq = pd.unique(hosts)
    with_prefixes = [h for h in uniq if robots.get(h, (0, ()))[1]]
    if not with_prefixes:
        return out
    for i in np.flatnonzero(np.isin(hosts, with_prefixes)):
        out[i] = robots_denied(urls[i], hosts[i], robots)
    return out


def phase1_gate(
    df: pd.DataFrame,
    *,
    robots_ref,
    round_no: int,
    round_ms: int,
    default_delay_ms: int,
    max_per_host: int,
    n_salt: int,
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
    gate[robots_denied_mask(urls, hosts, robots)] = GATE_ROBOTS
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
        for pkey, g in ranked.groupby("pkey", sort=False):
            host, salt_no = (pkey.rsplit("#", 1) if n_salt > 1 else (pkey, 0))
            b = salt_budget(
                budget_for(host, robots, round_ms, default_delay_ms, max_per_host),
                n_salt,
                int(salt_no),
            )
            keep_ix.append(g.index[:b].to_numpy())
        keep = pd.Index(np.concatenate(keep_ix))
        over = cand.index.difference(keep)
        df.loc[over, "gate"] = GATE_DEFER
    return df


def pkey_of(
    hosts: np.ndarray, url_hash: np.ndarray, n_salt: int, hot: dict | None = None
) -> np.ndarray:
    """The politeness key: host, salted by url-hash for skew splitting.
    ``n_salt`` is the global base; ``hot`` maps specific hosts to larger
    per-host salt counts (automatic skew salting — see
    :func:`salt_count_for`). Salted keys are ``host#salt#n``."""
    base = max(1, n_salt)
    hot = hot or {}
    if base <= 1 and not hot:
        return np.asarray(hosts, dtype=object)
    n_arr = np.full(len(hosts), base, dtype=np.int64)
    for h, n in hot.items():
        n_arr[hosts == h] = max(base, int(n))
    salt = (url_hash.astype(np.uint64) % n_arr.astype(np.uint64)).astype(np.int64)
    out = np.asarray(hosts, dtype=object).copy()
    for i in np.flatnonzero(n_arr > 1):
        out[i] = f"{hosts[i]}#{salt[i]}#{n_arr[i]}"
    return out


def gate_pre(df: pd.DataFrame, robots: dict, round_no: int) -> np.ndarray:
    """Robots + skip-window gate (the part of gating that needs no
    cutoffs): candidate | robots_denied | skipped."""
    n = len(df)
    gate = np.full(n, GATE_CANDIDATE, dtype=object)
    urls = df["url"].to_numpy()
    hosts = df["host"].to_numpy()
    gate[robots_denied_mask(urls, hosts, robots)] = GATE_ROBOTS
    skipped = df["skip_until_round"].to_numpy() > round_no
    gate[skipped & (gate == GATE_CANDIDATE)] = GATE_SKIPPED
    return gate


def offer_candidates(
    df: pd.DataFrame,
    *,
    robots: dict,
    round_no: int,
    round_ms: int,
    default_delay_ms: int,
    max_per_host: int,
    n_salt: int,
    cutoff_handles: list,
    hot: dict | None = None,
) -> None:
    """Offer this batch's per-pkey partial top-k of candidates for
    ``round_no`` to the cutoff actors. Used by the producing tasks of the
    previous round (pipelined mode) and by bootstrap/resume backfill.
    Fully numpy (lexsort + group slicing): this runs in EVERY round-step
    task, so per-task pandas overhead would cap small-batch scaling.

    Alongside offers, each batch reports its RAW per-host candidate
    counts (pre-truncation, so the sum across batches is the exact
    candidate count — the skew signal for automatic salting); counts
    route to one owning actor per host, no double counting. Count
    reports are keyed by a content-derived batch token (offered rows are
    globally unique URLs, so batch tokens are unique across tasks and
    stable across Ray task retries): a retried task OVERWRITES its own
    contribution instead of double-counting it (ADVICE r02)."""
    import ray

    from ..functions.hashing import hash_strings
    from ..state.seen import claim_token

    gate = gate_pre(df, robots, round_no)
    m = gate == GATE_CANDIDATE
    if not m.any():
        return
    bkey = claim_token(df["url_hash"].to_numpy(dtype=np.uint64))
    hosts = df["host"].to_numpy()[m]
    h = df["url_hash"].to_numpy(dtype=np.uint64)[m]
    p = df["priority"].to_numpy(dtype=np.int64)[m]
    d = df["depth"].to_numpy(dtype=np.int64)[m]
    t = df["warc_ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)[m]
    pk = pkey_of(hosts, h, n_salt, hot)

    # sort by (pkey, order key): contiguous per-key groups, each already
    # in frontier order — spans give every key's local top-k by slicing
    order = np.lexsort((h, t, d, p, pk))
    pk_sorted = pk[order]
    uniq, first_ix = np.unique(pk_sorted, return_index=True)  # sorted keys → ascending first_ix
    bounds = np.append(first_ix, len(pk_sorted))
    spans = {
        key: order[bounds[i]:bounds[i + 1]] for i, key in enumerate(uniq)
    }
    k_actors = len(cutoff_handles)
    # route by HOST (not pkey): all salts of a host, its candidate counts
    # and its error reports land on the same shard, so backoff and skew
    # decisions need no cross-actor joins. Per-host offer volume is
    # bounded by the (truncated) host budget, so this cannot skew.
    owner = hash_strings([parse_pkey(u)[0] for u in uniq]) % np.uint64(k_actors)
    hc_hosts, hc_counts = np.unique(hosts, return_counts=True)
    hc_owner = hash_strings(list(hc_hosts)) % np.uint64(k_actors)
    refs = []
    for j in range(k_actors):
        mine = [u for u, o in zip(uniq, owner) if o == j]
        counts_j = {
            str(hh): int(c)
            for hh, c, o in zip(hc_hosts, hc_counts, hc_owner)
            if o == j
        }
        if not mine and not counts_j:
            continue
        if mine:
            keep_ix = []
            counts = []
            for key in mine:
                host, salt_no, n_key = parse_pkey(key)
                b = salt_budget(
                    budget_for(host, robots, round_ms, default_delay_ms, max_per_host),
                    n_key,
                    salt_no,
                )
                ix = spans[key][:b]
                keep_ix.append(ix)
                counts.append(len(ix))
            ix = np.concatenate(keep_ix)
            payload = (mine, counts, p[ix], d[ix], t[ix], h[ix])
        else:
            payload = None
        refs.append(cutoff_handles[j].offer.remote(round_no, payload, counts_j, bkey))
    ray.get(refs)


def note_errors_scatter(cutoff_handles: list, round_no: int,
                        error_hosts: np.ndarray,
                        task_key: int | None = None,
                        error_classes: np.ndarray | None = None) -> None:
    """Report this batch's fetch-error hosts to their owning cutoff
    shards as per-class (timeout, rate_limit) counts (same hash-by-host
    routing as offers/counts). ``task_key`` (the calling task's stable
    identity — hash of its input frontier batch) keys the report so a
    retried task overwrites rather than double-counts its errors
    (ADVICE r02); error-host LISTS are not unique across tasks, so
    content alone cannot key them."""
    import ray

    from ..functions.hashing import hash_strings
    from ..state.seen import claim_token

    if len(error_hosts) == 0:
        return
    if task_key is None:
        task_key = claim_token(
            hash_strings(np.asarray(error_hosts, dtype=object))
        )
    if error_classes is None:
        error_classes = np.full(len(error_hosts), "timeout", dtype=object)
    rl = np.asarray(error_classes, dtype=object) == "rate_limit"
    uh = np.unique(error_hosts)
    owner = hash_strings(list(uh)) % np.uint64(len(cutoff_handles))
    per_host = {
        str(h): (
            int(((error_hosts == h) & ~rl).sum()),
            int(((error_hosts == h) & rl).sum()),
        )
        for h in uh
    }
    refs = []
    for j in range(len(cutoff_handles)):
        counts = {str(h): per_host[str(h)] for h, o in zip(uh, owner) if o == j}
        if counts:
            refs.append(
                cutoff_handles[j].note_errors.remote(round_no, counts, task_key)
            )
    ray.get(refs)


def pull_cutoffs_for(
    df: pd.DataFrame,
    cutoff_handles: list,
    *,
    round_no: int,
    n_salt: int,
    hot: dict | None = None,
) -> dict:
    """Pull-transport gating (r04 verdict #3): fetch ONLY this batch's
    politeness-key cutoff slice from the owning cutoff shards (the same
    hash-by-host routing as offers), instead of reading a broadcast of
    the full O(active hosts) dict.  One RPC per shard that owns a host
    present in the batch; payload bounded by the batch's distinct
    pkeys."""
    import ray

    from ..functions.hashing import hash_strings

    pkeys = pkey_of(
        df["host"].to_numpy(), df["url_hash"].to_numpy(dtype=np.uint64),
        n_salt, hot,
    )
    uniq = pd.unique(pkeys)
    if not len(uniq):
        return {}
    hosts = [parse_pkey(u)[0] for u in uniq]
    owner = hash_strings(hosts) % np.uint64(len(cutoff_handles))
    refs = []
    for j in range(len(cutoff_handles)):
        mine = [u for u, o in zip(uniq, owner) if o == j]
        if mine:
            refs.append(cutoff_handles[j].pull_cutoffs.remote(round_no, mine))
    out: dict = {}
    for d in ray.get(refs):
        out.update(d)
    return out


def gate_full(
    df: pd.DataFrame,
    *,
    robots: dict,
    cutoffs: dict,
    round_no: int,
    n_salt: int,
    hot: dict | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Complete gate for the pipelined round step: robots/skip, then
    candidate → fetch iff order key ≤ the per-pkey cutoff (no cutoff
    entry = fewer candidates than budget → all fetch). Returns
    (gate array, pkey array). ``hot`` must be the SAME per-host salt map
    the offers for this round were made with."""
    gate = gate_pre(df, robots, round_no)
    pkeys = pkey_of(
        df["host"].to_numpy(), df["url_hash"].to_numpy(dtype=np.uint64), n_salt, hot
    )
    cand_ix = np.flatnonzero(gate == GATE_CANDIDATE)
    if len(cand_ix):
        sub = df.iloc[cand_ix]
        p = sub["priority"].to_numpy(dtype=np.int64)
        d = sub["depth"].to_numpy(dtype=np.int64)
        t = sub["warc_ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        h = sub["url_hash"].to_numpy(dtype=np.uint64)
        sub_pk = pkeys[cand_ix]
        fetch = np.ones(len(cand_ix), dtype=bool)
        # vectorized cutoff compare per politeness key present in the batch
        for pk in pd.unique(sub_pk):
            c = cutoffs.get(pk)
            if c is None:
                continue  # fewer candidates than budget → all selected
            m = sub_pk == pk
            if c == CUTOFF_NONE:  # zero budget → nothing fetches
                fetch[m] = False
            else:
                fetch[m] = _leq_cutoff(p[m], d[m], t[m], h[m], c)
        gate[cand_ix[fetch]] = GATE_FETCH
        gate[cand_ix[~fetch]] = GATE_DEFER
    return gate, pkeys


class _CutoffState:
    """Per-key running top-budget of order keys. The retained set is the
    unique global top-budget (total order — url_hash tie-break), so the
    result is independent of offer arrival order.

    Offers append numpy array chunks (O(1)); compaction (vectorized
    numeric lexsort + truncate to budget) runs only when a key's buffered
    rows exceed 4× its budget, and once at collect time."""

    def __init__(self):
        self.keys: dict[str, list] = {}  # pk → list of (p, d, t, h) chunks
        self.counts: dict[str, int] = {}

    @staticmethod
    def _topk(chunks: list, k: int):
        p = np.concatenate([c[0] for c in chunks])
        d = np.concatenate([c[1] for c in chunks])
        t = np.concatenate([c[2] for c in chunks])
        h = np.concatenate([c[3] for c in chunks])
        order = np.lexsort((h, t, d, p))[:k]
        return p[order], d[order], t[order], h[order]

    def offer(self, payload: tuple, budgets: dict) -> None:
        """payload = (pkeys, counts, p, d, t, h): one concatenated array
        set per call — minimizes serialization and actor queue time."""
        pkeys, counts, p, d, t, h = payload
        off = 0
        for pk, c in zip(pkeys, counts):
            chunk = (p[off:off + c], d[off:off + c], t[off:off + c], h[off:off + c])
            off += c
            self.keys.setdefault(pk, []).append(chunk)
            n = self.counts.get(pk, 0) + c
            b = budgets[pk]
            if n > 4 * b:
                self.keys[pk] = [self._topk(self.keys[pk], b)]
                n = min(n, b)
            self.counts[pk] = n

    def cutoffs(self, budgets: dict) -> dict:
        out = {}
        for pk, chunks in self.keys.items():
            b = budgets[pk]
            if b <= 0:
                # zero budget (a salt's share of a backoff-shrunk budget
                # of 1): absence of a cutoff means ALL-fetch, so emit the
                # explicit select-none sentinel instead
                out[pk] = CUTOFF_NONE
                continue
            if self.counts.get(pk, 0) < b:
                continue  # fewer candidates than budget → all selected
            p, d, t, h = self._topk(chunks, b)
            if len(p) >= b:
                out[pk] = (int(p[b - 1]), int(d[b - 1]), int(t[b - 1]), int(h[b - 1]))
        return out


def make_budget_fn(robots: dict, round_ms: int, default_delay_ms: int,
                   max_per_host: int):
    """pkey → budget. Salted pkeys are self-describing (host#salt#n), so
    per-host automatic salt counts need no side table here."""

    def f(pkey: str) -> int:
        host, salt, n = parse_pkey(pkey)
        return salt_budget(
            budget_for(host, robots, round_ms, default_delay_ms, max_per_host),
            n,
            salt,
        )

    return f


class CutoffPool:
    """Pool of politeness-bucket actors — the per-host token buckets of
    the north star, keyed by pkey hash instead of a groupby shuffle.

    Offers are ROUND-KEYED: while round r's execution produces the rows
    of round r+1, each producing task also offers its partial top-k for
    round r+1 to these actors; the execution barrier at the end of round
    r guarantees completeness, so at the start of round r+1 the driver
    collects exact per-key cutoffs (the budget-th order key) and
    broadcasts them. The frontier is never shuffled for politeness."""

    def __init__(self, n_actors: int, robots_ref, round_ms: int,
                 default_delay_ms: int, max_per_host: int, n_salt: int,
                 error_backoff: bool = False):
        import ray

        @ray.remote(num_cpus=0, max_restarts=2, max_task_retries=-1)
        class CutoffShard:
            def __init__(self, robots_ref, round_ms, default_delay_ms,
                         max_per_host, error_backoff):
                from ..functions.broadcast import get_broadcast
                from ..state.politeness import _CutoffState

                self._robots = get_broadcast(robots_ref)
                self._round_ms = round_ms
                self._default_delay = default_delay_ms
                self._max_per_host = max_per_host
                self._backoff = error_backoff
                self._host_budgets: dict = {}
                self.rounds: dict[int, _CutoffState] = {}
                # round → finalized cutoffs kept shard-RESIDENT for the
                # pull transport (r04 verdict #3)
                self.ready: dict[int, dict] = {}
                # round → {batch_token: {host: raw candidate count}}
                # (skew signal; each host is counted by exactly one
                # owning shard — offers, counts and errors all route by
                # hash(host)). Keyed per batch token so a retried task's
                # report OVERWRITES its own prior one instead of
                # double-counting (ADVICE r02); summed at collect.
                self.host_counts: dict[int, dict[int, dict[str, int]]] = {}
                # round → {batch_token: {host: fetch-error count}}
                # (backoff signal; same idempotency scheme)
                self.errors: dict[int, dict[int, dict[str, int]]] = {}
                # round → {batch_token: (lineage bincounts, n_rows)}
                self.lineage: dict[int, dict] = {}
                # restart detection: offers buffered here are volatile; a
                # restarted shard reports fresh=True once so the driver
                # drops the round's offer state everywhere and re-derives
                # it from the frontier (deterministic backfill)
                self._fresh = True

            def consume_fresh(self) -> bool:
                f, self._fresh = self._fresh, False
                return f

            def health(self) -> dict:
                """SystemHealth analog (crawler_metrics.go:46-68)."""
                import ray as _ray

                try:
                    rec = (
                        _ray.get_runtime_context().was_current_actor_reconstructed
                    )
                except Exception:
                    rec = False
                import os as _os

                from ..state.resources import proc_rss_kb

                tm = _os.times()
                return {
                    "reconstructed": bool(rec),
                    "items": sum(len(s.keys) for s in self.rounds.values()),
                    "cpu_s": float(tm.user + tm.system),
                    "rss_kb": proc_rss_kb(),
                }

            def drop_round(self, round_no: int) -> None:
                self.rounds.pop(round_no, None)
                self.host_counts.pop(round_no, None)

            def _host_budget(self, host: str) -> int:
                from ..state.politeness import budget_for

                b = self._host_budgets.get(host)
                if b is None:
                    b = self._host_budgets[host] = budget_for(
                        host, self._robots, self._round_ms,
                        self._default_delay, self._max_per_host,
                    )
                return b

            def _budget(self, pk: str, err: dict | None = None) -> int:
                from ..state.politeness import (
                    backoff_budget,
                    parse_pkey,
                    salt_budget,
                )

                host, salt, n = parse_pkey(pk)
                hb = self._host_budget(host)
                if err:
                    to, rl = err.get(host, (0, 0))
                    hb = backoff_budget(hb, to, rl)
                return salt_budget(hb, n, salt)

            def offer(self, round_no: int, payload: tuple | None,
                      host_counts: dict | None = None,
                      bkey: int | None = None) -> None:
                from ..state.politeness import _CutoffState

                if host_counts:
                    self.host_counts.setdefault(round_no, {})[bkey] = host_counts
                if payload is None:
                    return
                st = self.rounds.get(round_no)
                if st is None:
                    st = self.rounds[round_no] = _CutoffState()
                # truncation uses the UNSHRUNK budget (a superset of what
                # a backoff-shrunk collect will select — always safe)
                st.offer(payload, {pk: self._budget(pk) for pk in payload[0]})

            def note_errors(self, round_no: int, counts: dict,
                            bkey: int | None = None) -> None:
                self.errors.setdefault(round_no, {})[bkey] = counts

            def report_lineage(self, round_no: int, bkey: int,
                               counts, n_rows: int) -> None:
                """Per-batch lineage bincounts from inside round_step —
                keyed by the batch token (retry overwrites, never
                double-counts). Moves per-round lineage accounting OFF
                the driver (r02 verdict: the driver re-read the whole
                round's thin columns every round)."""
                self.lineage.setdefault(round_no, {})[bkey] = (counts, n_rows)

            def collect_lineage(self, round_no: int):
                """→ (summed counts array, total frontier rows covered).
                The driver checks the row total against the frontier size
                to detect lost reports (shard restart mid-round) and
                falls back to the driver-side recount."""
                d = self.lineage.pop(round_no, None)
                if not d:
                    return None, 0
                import numpy as _np

                total = _np.zeros_like(next(iter(d.values()))[0])
                n = 0
                for counts, n_rows in d.values():
                    total += counts
                    n += n_rows
                return total, n

            def set_errors(self, round_no: int, counts: dict) -> None:
                """Authoritative overwrite (resume / restart backfill,
                derived from the committed round output)."""
                self.errors[round_no] = {None: dict(counts)}

            @staticmethod
            def _sum_batches(per_batch: dict) -> dict:
                """Sum per-batch contributions; values are ints (host
                candidate counts) or (timeout, rate_limit) pairs (error
                class counts)."""
                out: dict = {}
                for counts in per_batch.values():
                    for h, c in counts.items():
                        if isinstance(c, (tuple, list)):
                            p = out.get(h, (0, 0))
                            out[h] = (p[0] + c[0], p[1] + c[1])
                        else:
                            out[h] = out.get(h, 0) + c
                return out

            def collect_and_drop(self, round_no: int) -> tuple[dict, dict]:
                hc = self._sum_batches(self.host_counts.pop(round_no, {}))
                st = self.rounds.pop(round_no, None)
                # budgets for THIS round shrink by last round's errors
                err = (
                    self._sum_batches(self.errors.pop(round_no - 1, {}))
                    if self._backoff
                    else None
                )
                self.errors = {r: v for r, v in self.errors.items() if r >= round_no - 1}
                if st is None:
                    return {}, hc
                return st.cutoffs({pk: self._budget(pk, err) for pk in st.keys}), hc

            def finalize_round(self, round_no: int, hot_threshold: int,
                               base_salt: int) -> tuple[int, dict]:
                """Shard-resident collect (r04 verdict #3): compute this
                shard's cutoffs for the round and KEEP them here —
                gating tasks pull only their batch's pkey slice
                (``pull_cutoffs``), so the driver payload is one int
                per shard instead of an O(active hosts) dict.  The
                skew-salting signal shrinks the same way: only hosts
                whose candidate count crosses the salting threshold
                (``salt_count_for(c) > base``, the exact predicate the
                driver's ``_hot_next`` applies) are returned — typically
                a handful of hot hosts, never the full host census."""
                from ..state.politeness import salt_count_for

                cutoffs, hc = self.collect_and_drop(round_no)
                self.ready = {
                    rn: v for rn, v in self.ready.items() if rn >= round_no
                }
                self.ready[round_no] = cutoffs
                hot = {
                    h: c for h, c in hc.items()
                    if salt_count_for(c, hot_threshold, base_salt) > base_salt
                }
                return len(cutoffs), hot

            def pull_cutoffs(self, round_no: int, pkeys: list[str]) -> dict:
                """→ {pkey: cutoff} slice for the caller's batch.  Fails
                loud if the round's resident cutoffs are gone (shard
                restarted mid-round): the round execution then fails
                before its output commits, and a rerun resumes from the
                checkpoint and re-derives them deterministically —
                silent fallback would over-fetch nondeterministically."""
                c = self.ready.get(round_no)
                if c is None:
                    raise KeyError(
                        f"cutoffs for round {round_no} are not resident "
                        "(cutoff shard restarted mid-round); rerun resumes "
                        "from the last checkpoint"
                    )
                return {pk: c[pk] for pk in pkeys if pk in c}

            def fetch_ready(self, round_no: int) -> dict:
                """Hand the resident cutoffs to the driver (broadcast
                transport — the small-cutoff fast path)."""
                return self.ready.pop(round_no, {})

            def reset(self) -> None:
                self.rounds = {}
                self.host_counts = {}
                self.errors = {}
                self.lineage = {}
                self.ready = {}

        from .resources import shard_cpu_reservation

        cpus_each = shard_cpu_reservation("cutoff", n_actors)
        self.handles = [
            CutoffShard.options(num_cpus=cpus_each).remote(
                robots_ref, round_ms, default_delay_ms, max_per_host, error_backoff
            )
            for _ in range(n_actors)
        ]

    def reset(self) -> None:
        import ray

        ray.get([h.reset.remote() for h in self.handles])

    def consume_fresh(self) -> bool:
        """True iff ANY shard (re)started since the last check — its
        buffered offers are gone and the caller must re-backfill."""
        import ray

        return any(ray.get([h.consume_fresh.remote() for h in self.handles]))

    def drop_round(self, round_no: int) -> None:
        import ray

        ray.get([h.drop_round.remote(round_no) for h in self.handles])

    def health(self) -> list[dict]:
        import ray

        return ray.get([h.health.remote() for h in self.handles])

    # NOTE: the old collect() (merge every shard's cutoff dict onto the
    # driver) was deleted with r04 verdict #3 — it reintroduced the
    # O(active hosts) driver payload and bypassed the shard-resident
    # `ready` lifecycle.  Use finalize() + fetch_ready()/pull_cutoffs.

    def finalize(self, round_no: int, hot_threshold: int,
                 base_salt: int) -> tuple[int, dict]:
        """Shard-resident collect (r04 verdict #3): → (total cutoff
        count, hot-host candidate counts).  The cutoff dicts stay on
        their shards; the driver payload is O(shards) ints plus the
        (tiny) hot-host set, flat in the active-host count."""
        import ray

        n = 0
        hot: dict = {}
        for c, h in ray.get(
            [hd.finalize_round.remote(round_no, hot_threshold, base_salt)
             for hd in self.handles]
        ):
            n += c
            hot.update(h)  # hosts are owned by exactly one shard
        return n, hot

    def fetch_ready(self, round_no: int) -> dict:
        """Pull every shard's finalized cutoffs to the driver — the
        broadcast transport's small-dict fast path."""
        import ray

        out: dict = {}
        for d in ray.get(
            [h.fetch_ready.remote(round_no) for h in self.handles]
        ):
            out.update(d)
        return out

    def collect_lineage(self, round_no: int):
        """→ (summed per-shard lineage bincounts | None, rows covered)."""
        import ray

        total, n = None, 0
        for arr, nr in ray.get(
            [h.collect_lineage.remote(round_no) for h in self.handles]
        ):
            if arr is not None:
                total = arr if total is None else total + arr
            n += nr
        return total, n

    def kill(self) -> None:
        import ray

        for h in self.handles:
            ray.kill(h)
        self.handles = []


def _leq_cutoff(p, d, t, h, c: tuple) -> np.ndarray:
    """Vectorized lexicographic (p,d,t,h) ≤ c."""
    cp, cd, ct, ch = c
    return (
        (p < cp)
        | ((p == cp) & (d < cd))
        | ((p == cp) & (d == cd) & (t < ct))
        | ((p == cp) & (d == cd) & (t == ct) & (h <= np.uint64(ch)))
    )


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
