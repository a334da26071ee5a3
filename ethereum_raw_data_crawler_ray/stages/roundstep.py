"""The fused round step — ONE map_batches stage does the whole round.

Pipelined crawl mode: for each frontier batch the task
  1. gates (robots / skip-window / politeness cutoff — cutoffs were
     collected from the offers streamed during the PREVIOUS round's
     execution, so no shuffle and no extra barrier is needed);
  2. fetches gated rows from the page-store shard actors + extracts
     (+ optional enrichment);
  3. derives carry rows (defer / skip / error-retry frontier rows for
     round r+1);
  4. explodes fetched outlinks → discovered rows, claims them in the
     seen shards (scatter; first claim wins — the round dedup);
  5. offers the r+1 candidates' partial top-k to the cutoff actors
     (politeness state for the NEXT round);
  6. emits one combined Arrow table: page rows (row_kind="page") +
     carry rows ("carry") + discovered rows ("discovered") — the next
     round reads the same files filtered to row_kind != "page".

The end-of-execution barrier makes steps 4/5 complete before round r+1
starts; every side effect is deterministic and replay-safe under task
retry: offers are top-k unions (re-offering is a no-op), and seen claims
carry a content-derived claim token logged per round, so a retried task
gets novel=True again for the rows it already claimed instead of
silently dropping them (see ``state.seen.claim_token``). One Ray
execution per round total.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import FRONTIER
from ..state.politeness import (
    GATE_DEFER,
    GATE_FETCH,
    GATE_ROBOTS,
    GATE_SKIPPED,
    gate_full,
    offer_candidates,
)
from .fetch import STATUS_ERROR, STATUS_FETCHED, _assemble, transient_fail_mask

ROW_PAGE = "page"
ROW_CARRY = "carry"
ROW_DISC = "discovered"

_FRONTIER_COLS = [f.name for f in FRONTIER]


def round_task(batch: pa.Table, *, round_no: int, **kwargs):
    """Fused read + round_step task (r02 verdict #1 — the execution
    floor). One item = a pre-balanced set of frontier file SPANS (path,
    row offset, row count) grouped into batch-sized processing groups
    (``batch_id``), packed by the driver from Parquet footer metadata —
    so every task processes the same number of frontier rows without
    the per-round ``repartition(ntasks)`` all-to-all barrier the
    previous layout paid (read → repartition → map became one task:
    read own spans → round_step → write). A GENERATOR over the batch
    groups: task memory stays one batch wide however many groups the
    item carries (item count is O(cluster cores), not O(frontier)).
    The round column is stamped here too, removing the extra map
    stage."""
    import pyarrow.parquet as _pq

    for paths, offs, lens, bids in zip(
        batch["paths"].to_pylist(), batch["offsets"].to_pylist(),
        batch["lengths"].to_pylist(), batch["batch_id"].to_pylist(),
    ):
        groups: dict[int, list] = {}
        for p, o, ln, bi in zip(paths, offs, lens, bids):
            groups.setdefault(bi, []).append((p, o, ln))
        for bi in sorted(groups):
            tables = []
            for p, o, ln in groups[bi]:
                tables.append(_read_span(_pq, p, o, ln))
            df = pa.concat_tables(tables).to_pandas()
            out = round_step(df, round_no=round_no, **kwargs)
            yield out.append_column(
                "round", pa.array(np.full(len(out), round_no, dtype=np.int32))
            )


def _read_span(_pq, path: str, offset: int, length: int) -> pa.Table:
    """Read rows [offset, offset+length) of a frontier file, decoding
    ONLY the row groups that overlap the span.  A frontier file larger
    than the batch size is striped across tasks as multiple spans;
    decoding the whole file per span amplified reads by up to ~4×ncpu
    when the frontier sat in one large file (r03 ADVICE).  Row-group
    boundaries come from the footer (already driver-cached for span
    packing, re-read here — footer reads are cheap vs column decode)."""
    pf = _pq.ParquetFile(path)
    md = pf.metadata
    if md.num_row_groups <= 1:
        t = pf.read(columns=_FRONTIER_COLS)
        return t if (offset == 0 and length == len(t)) else t.slice(offset, length)
    end = offset + length
    rgs, rg_start, start = [], 0, 0
    for g in range(md.num_row_groups):
        n = md.row_group(g).num_rows
        if start < end and start + n > offset:
            if not rgs:
                rg_start = start
            rgs.append(g)
        start += n
        if start >= end:
            break
    t = pf.read_row_groups(rgs, columns=_FRONTIER_COLS)
    return t.slice(offset - rg_start, length)


def _null_fill_to(t: pa.Table, names: list[str], template: pa.Table) -> pa.Table:
    """Add missing columns (typed nulls per the template) and order them."""
    n = len(t)
    cols = {}
    for name in names:
        if name in t.schema.names:
            cols[name] = t[name]
        else:
            typ = template.schema.field(name).type
            cols[name] = pa.nulls(n, type=typ)
    return pa.table(cols)


def round_step(
    df: pd.DataFrame,
    *,
    round_no: int,
    cutoffs_ref,
    robots_ref,
    store_handles: list | None,
    seen_handles: list,
    cutoff_handles: list,
    round_ms: int,
    default_delay_ms: int,
    max_per_host: int,
    n_salt: int,
    max_retries: int,
    skip_rounds: int,
    error_permille: int = 0,
    enrich: bool = False,
    parquet_index: tuple | None = None,  # (index_dir, n_buckets) store-less mode
    hot_gate: dict | None = None,   # per-host salt map for THIS round's pkeys
    hot_offer: dict | None = None,  # per-host salt map for round r+1's offers
    error_backoff: bool = False,
    cutoff_pull: bool = False,  # pull transport: per-batch cutoff slices
) -> pa.Table:
    import os
    import time as _time

    from ..functions.broadcast import get_broadcast
    from ..pipelines.crawl import _explode_outlinks
    from ..state.seen import claim_scatter_finish, claim_scatter_submit
    from ..state.store import fetch_scatter

    _timing = os.environ.get("ERDC_TIMING")
    _marks = [_time.perf_counter()]

    def _mark():
        _marks.append(_time.perf_counter())

    robots = get_broadcast(robots_ref)
    if cutoff_pull:
        # shard-resident transport (r04 verdict #3): fetch only THIS
        # batch's pkey slice from the owning cutoff shards — the full
        # cutoff dict never exists in any one process
        from ..state.politeness import pull_cutoffs_for

        cutoffs = pull_cutoffs_for(
            df, cutoff_handles, round_no=round_no, n_salt=n_salt,
            hot=hot_gate,
        )
    else:
        cutoffs = get_broadcast(cutoffs_ref)

    # 1. gate ---------------------------------------------------------------
    gate, _ = gate_full(
        df, robots=robots, cutoffs=cutoffs, round_no=round_no, n_salt=n_salt,
        hot=hot_gate,
    )
    df = df.assign(gate=gate)
    _mark()  # gate

    # 2. fetch + extract (page rows: fetch-gated + robots-denied log) -------
    page_mask = (gate == GATE_FETCH) | (gate == GATE_ROBOTS)
    pages_df = df[page_mask].reset_index(drop=True)
    fetch_mask = (pages_df["gate"] == GATE_FETCH).to_numpy()
    fetch_ix = np.flatnonzero(fetch_mask)
    urls = pages_df["url"].to_numpy()[fetch_mask]
    hashes = pages_df["url_hash"].to_numpy().astype(np.uint64)[fetch_mask]
    attempts = pages_df["attempts"].to_numpy()[fetch_mask]
    fail_now = transient_fail_mask(hashes, attempts, error_permille)
    payloads: list = [None] * len(urls)
    if (~fail_now).any():
        if store_handles is not None:
            got = fetch_scatter(store_handles, urls[~fail_now], hashes[~fail_now])
        else:
            from .fetch import parquet_probe

            got = parquet_probe(
                parquet_index[0], parquet_index[1], urls[~fail_now], hashes[~fail_now],
                version=parquet_index[2] if len(parquet_index) > 2 else 0,
            )
        for k, i in enumerate(np.flatnonzero(~fail_now)):
            payloads[i] = got[k]
    _mark()  # fetch-lookup
    pages = _assemble(pages_df, payloads, fetch_ix, fail_now, enrich=enrich)
    status = np.asarray(pages["status"].to_pandas(), dtype=object)
    _mark()  # assemble(extract+enrich)

    # 3. carry rows (defer/skip unchanged; errors retry→skip-window→drop,
    #    mirror of scheduler_service.go:324-357) ---------------------------
    page_positions = np.flatnonzero(page_mask)
    is_err = np.zeros(len(df), dtype=bool)
    is_err[page_positions[status == STATUS_ERROR]] = True
    keep = (gate == GATE_DEFER) | (gate == GATE_SKIPPED)
    att = df["attempts"].to_numpy(dtype=np.int32).copy()
    skip_until = df["skip_until_round"].to_numpy(dtype=np.int32).copy()
    att[is_err] += 1
    skip_until[is_err & (att == max_retries)] = round_no + 1 + skip_rounds
    keep |= is_err & (att <= max_retries)
    carry = df[keep].assign(attempts=att[keep], skip_until_round=skip_until[keep])
    _mark()  # carry

    # 4+5. discovered rows (explode + seen-claim) interleaved with the
    #    offers that don't depend on claim results: the claim calls are
    #    SUBMITTED first, then the carry offers + error reports run while
    #    those round trips are in flight, then claims are collected and
    #    the novel discovered rows are offered (offers are additive
    #    per-key top-k unions, so splitting them is semantics-free).
    #    Claims stay replay-safe via the per-round claim-token log
    #    (state.seen.claim_token).
    # stable task identity: the input frontier batch's url_hash content.
    # Frontier batches partition a deduplicated frontier, so this is
    # unique across tasks and reproduced exactly by a Ray retry — it
    # salts the seen-claim tokens and keys the error report (ADVICE r02)
    from ..state.seen import claim_token

    task_key = claim_token(df["url_hash"].to_numpy(dtype=np.uint64))

    disc = _explode_outlinks(pages.select(["outlinks"]), round_no=round_no)
    pending = None
    if len(disc):
        dh = np.asarray(disc["url_hash"].to_pandas(), dtype=np.uint64)
        pending = claim_scatter_submit(seen_handles, dh, round_no, task_key)

    offer_kwargs = dict(
        robots=robots,
        round_no=round_no + 1,
        round_ms=round_ms,
        default_delay_ms=default_delay_ms,
        max_per_host=max_per_host,
        n_salt=n_salt,
        cutoff_handles=cutoff_handles,
        hot=hot_offer,
    )
    # error backoff signal: this batch's fetch-error hosts → the shard
    # that will compute next round's budgets for them
    if error_backoff and (status == STATUS_ERROR).any():
        from ..state.politeness import note_errors_scatter

        err_m = status == STATUS_ERROR
        eh = np.asarray(pages["host"].to_pandas(), dtype=object)[err_m]
        ec = np.asarray(pages["error_class"].to_pandas(), dtype=object)[err_m]
        note_errors_scatter(cutoff_handles, round_no, eh, task_key, ec)
    if len(carry):
        offer_candidates(carry[_FRONTIER_COLS], **offer_kwargs)
    if pending is not None:
        novel = claim_scatter_finish(*pending)
        disc = disc.filter(pa.array(novel))
    _mark()  # explode+seen
    if len(disc):
        offer_candidates(disc.to_pandas()[_FRONTIER_COLS], **offer_kwargs)

    _mark()  # offers

    # 5b. lineage bincounts for this batch — reported to a cutoff shard
    # keyed by the task token (retry-overwrite idempotent), so the driver
    # never re-reads the round output to count (r02 verdict). Mirrors
    # CrawlPipeline._lineage_bincounts exactly: rows = [scheduled,
    # fetched, deferred, failed, errors] per seen shard.
    n_seen = len(seen_handles)
    page_hash = np.asarray(pages["url_hash"].to_pandas(), dtype=np.uint64)
    page_shard = (page_hash % np.uint64(n_seen)).astype(np.int64)
    df_shard = (
        df["url_hash"].to_numpy(dtype=np.uint64) % np.uint64(n_seen)
    ).astype(np.int64)
    page_gate = np.asarray(pages["gate"].to_pandas(), dtype=object)
    lin = np.stack(
        [
            np.bincount(page_shard[page_gate == GATE_FETCH], minlength=n_seen),
            np.bincount(page_shard[status == STATUS_FETCHED], minlength=n_seen),
            np.bincount(
                df_shard[(gate == GATE_DEFER) | (gate == GATE_SKIPPED)],
                minlength=n_seen,
            ),
            np.bincount(page_shard[page_gate == GATE_ROBOTS], minlength=n_seen),
            np.bincount(page_shard[status == STATUS_ERROR], minlength=n_seen),
        ]
    ).astype(np.int64)
    lin_ref = cutoff_handles[task_key % len(cutoff_handles)].report_lineage.remote(
        round_no, task_key, lin, len(df)
    )

    # 6. combined output ----------------------------------------------------
    out_names = list(pages.schema.names) + ["row_kind"]
    pages = pages.append_column(
        "row_kind", pa.array(np.full(len(pages), ROW_PAGE, dtype=object), type=pa.string())
    )
    parts = [pages]
    if len(carry):
        ct = pa.Table.from_pandas(carry, preserve_index=False)
        ct = ct.set_column(
            ct.schema.get_field_index("attempts"), "attempts",
            ct["attempts"].cast(pa.int32()),
        ).set_column(
            ct.schema.get_field_index("skip_until_round"), "skip_until_round",
            ct["skip_until_round"].cast(pa.int32()),
        )
        ct = ct.append_column(
            "row_kind",
            pa.array(np.full(len(ct), ROW_CARRY, dtype=object), type=pa.string()),
        )
        parts.append(_null_fill_to(ct, out_names, parts[0]))
    if len(disc):
        dt = disc.append_column(
            "row_kind",
            pa.array(np.full(len(disc), ROW_DISC, dtype=object), type=pa.string()),
        )
        parts.append(_null_fill_to(dt, out_names, parts[0]))
    parts[0] = _null_fill_to(parts[0], out_names, parts[0])
    out = pa.concat_tables(parts)
    import ray as _ray

    _ray.get(lin_ref)  # the report must land before the round barrier
    _mark()  # output-build
    if _timing:
        import json as _json
        import sys as _sys

        names = ["gate", "fetch_lookup", "extract_enrich", "carry",
                 "explode_seen", "offers", "output"]
        durs = [round(_marks[i + 1] - _marks[i], 4) for i in range(len(_marks) - 1)]
        print("ERDC_TIMING " + _json.dumps(dict(zip(names, durs))), file=_sys.stderr)
    return out
