"""Simulated fetch + extract stage (SURVEY.md S1/S3 + M2).

The reference fetches one block per RPC call with 3 retries and
reconnect-on-error (``ethereum_service.go:142-185``), then its
transactions (``:256-315``). The sandbox has no network, so "fetching" a
URL is a lookup against the pages corpus, via one of two modes:

* **store mode** (default): scatter-gather point lookups against the
  long-lived :class:`..state.store.PageStoreShard` actor pool — the
  honest shape of a distributed content store; per-batch cost is
  O(batch), the corpus is loaded once per run, never per round.
* **parquet mode**: probe the hash-bucketed fetch index directly with an
  ``url ∈ {...}`` predicate pushed into the Parquet read — no resident
  state, pays read amplification per round; kept as the no-memory path.

Both modes share error injection (deterministic transient failures — the
analog of RPC errors driving the retry path,
``scheduler_service.go:324-357``) and the extraction step
(strict→lenient→raw fallback chain, :mod:`..functions.extract`).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..functions.extract import extract_batch
from ..functions.hashing import hash_strings
from ..state.politeness import GATE_FETCH

STATUS_FETCHED = "fetched"
STATUS_ERROR = "error"
_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def build_fetch_index(pages_path: str, index_dir: str, n_buckets: int) -> str:
    """One-time hash-partition of the pages table into bucket dirs.

    Expressed as a Ray Data pipeline (read → map_batches → partitioned
    write) so it scales with the corpus; at 100 TB this is the one
    all-to-all pass the crawl pays up front instead of per round."""
    import ray.data as rd

    marker = os.path.join(index_dir, "_COMPLETE")
    if os.path.exists(marker):
        return index_dir

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hash_strings(t["url"])
        bucket = (h % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(bucket, type=pa.int64()))

    (
        rd.read_parquet(pages_path)
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=8192)
        .write_parquet(index_dir, partition_cols=["bucket"])
    )
    with open(marker, "w") as f:
        f.write("ok")
    return index_dir


ERR_TIMEOUT = "timeout"
ERR_RATE_LIMIT = "rate_limit"


def transient_fail_mask(hashes: np.ndarray, attempts: np.ndarray, permille: int) -> np.ndarray:
    """Deterministic transient error injection (first attempt only)."""
    if permille <= 0:
        return np.zeros(len(hashes), dtype=bool)
    with np.errstate(over="ignore"):
        z = (hashes.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) & _M64
    transient = ((z >> np.uint64(40)) % np.uint64(1000)) < np.uint64(permille)
    return transient & (attempts == 0)


def transient_error_class(hashes: np.ndarray) -> np.ndarray:
    """Deterministic error class for injected transient failures — the
    analog of the reference distinguishing 429-rate-limit from timeout
    errors (``ethereum_service.go:594-624``): a pure function of the url
    hash (NOT the attempt), so golden and engine always agree. ~Half the
    injected errors are rate-limit (quadratic backoff signal), half
    timeout (linear)."""
    with np.errstate(over="ignore"):
        z = (hashes.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) & _M64
    rl = ((z >> np.uint64(20)) & np.uint64(1)).astype(bool)
    return np.where(rl, ERR_RATE_LIMIT, ERR_TIMEOUT).astype(object)


def _assemble(df: pd.DataFrame, payloads: list, fetch_ix: np.ndarray,
              fail_now: np.ndarray, enrich: bool = False) -> pa.Table:
    """Common output builder: frontier batch + per-url payload lookups
    (None = miss) → the round-table Arrow batch (extraction inline)."""
    n = len(df)
    status = np.full(n, None, dtype=object)
    err_class = np.full(n, None, dtype=object)
    page_ts = np.zeros(n, dtype=np.int64)
    has_page = np.zeros(n, dtype=bool)
    lang = np.full(n, None, dtype=object)
    text = np.full(n, None, dtype=object)
    n_bytes = np.zeros(n, dtype=np.int64)
    outlinks: list = [[] for _ in range(n)]

    # injected transient failures carry a url-derived class (rate_limit /
    # timeout); store misses behave as timeouts — both deterministic
    inj_class = transient_error_class(
        df["url_hash"].to_numpy().astype(np.uint64)[fetch_ix]
        if len(fetch_ix)
        else np.zeros(0, dtype=np.uint64)
    )
    htmls, html_rows = [], []
    for k, row in enumerate(fetch_ix):
        p = payloads[k]
        if fail_now[k] or p is None:
            status[row] = STATUS_ERROR
            err_class[row] = inj_class[k] if fail_now[k] else ERR_TIMEOUT
        else:
            status[row] = STATUS_FETCHED
            htmls.append(p[1])
            html_rows.append((row, p))
    texts, links = extract_batch(htmls)
    for pos, (row, p) in enumerate(html_rows):
        ts, raw, lg = p
        page_ts[row] = ts
        has_page[row] = True
        lang[row] = lg
        text[row] = texts[pos]
        n_bytes[row] = len(raw)
        outlinks[row] = links[pos]

    # explicit types for the pass-through columns: empty batches must NOT
    # infer `null` type (blocks with mismatched schemas break the write)
    _TYPES = {
        "url": pa.string(), "host": pa.string(), "gate": pa.string(),
        "pkey": pa.string(), "priority": pa.int32(), "depth": pa.int32(),
        "attempts": pa.int32(), "skip_until_round": pa.int32(),
    }
    cols = {}
    for name in df.columns:
        if name in _TYPES:
            cols[name] = pa.array(df[name].tolist(), type=_TYPES[name])
        else:
            cols[name] = pa.Array.from_pandas(df[name])
    cols["warc_ts"] = pa.array(
        df["warc_ts"].to_numpy(dtype="datetime64[us]").astype(np.int64),
        type=pa.int64(),
    ).cast(pa.timestamp("us"))
    cols["url_hash"] = pa.array(
        df["url_hash"].to_numpy().astype(np.uint64), type=pa.uint64()
    )
    cols.update(
        {
            "status": pa.array(status, type=pa.string()),
            "error_class": pa.array(err_class, type=pa.string()),
            "page_ts": pa.array(page_ts, type=pa.int64(), mask=~has_page).cast(
                pa.timestamp("us")
            ),
            "lang": pa.array(lang, type=pa.string()),
            "text": pa.array(text, type=pa.large_string()),
            "n_bytes": pa.array(n_bytes, type=pa.int64()),
            "n_outlinks": pa.array(
                np.array([len(x) for x in outlinks], dtype=np.int32)
            ),
            "outlinks": pa.array(outlinks, type=pa.list_(pa.string())),
        }
    )
    if enrich:
        # in-flight page analytics (the training-data-crawl work a real
        # ingest pipeline does per page): language ID, quality score,
        # BPE-ish token count, SimHash, FNV-1a content fingerprint and
        # MinHash-LSH band keys — computed where the text already is,
        # avoiding a second pass over the corpus (this is the per-URL
        # compute the throughput benchmark measures). Batched: one
        # tokenization + one hash_array call per batch, not per page.
        from ..functions.textstats import enrich_batch

        lg = np.full(n, None, dtype=object)
        qual = np.zeros(n, dtype=np.float64)
        ntok = np.zeros(n, dtype=np.int64)
        sh = np.zeros(n, dtype=np.uint64)
        fp = np.zeros(n, dtype=np.uint64)
        bands = np.zeros((n, 4), dtype=np.uint64)
        rows = np.flatnonzero(has_page)
        if rows.size:
            res = enrich_batch([text[r] for r in rows], n_bands=4)
            lg[rows] = res["lang_guess"]
            qual[rows] = res["quality"]
            ntok[rows] = res["n_tokens_bpe"]
            sh[rows] = res["simhash"]
            fp[rows] = res["fingerprint"]
            bands[rows] = res["minhash_bands"]
        cols["lang_guess"] = pa.array(lg, type=pa.string())
        cols["quality"] = pa.array(qual, type=pa.float64())
        cols["n_tokens_bpe"] = pa.array(ntok, type=pa.int64())
        cols["simhash"] = pa.array(sh, type=pa.uint64())
        cols["fingerprint"] = pa.array(fp, type=pa.uint64())
        for b in range(4):
            cols[f"minhash_band{b}"] = pa.array(bands[:, b], type=pa.uint64())
    return pa.table(cols)


def fetch_via_store(
    df: pd.DataFrame, *, store_handles: list, error_permille: int = 0,
    enrich: bool = False,
) -> pa.Table:
    """Store-mode fetch: stateless task, scatter-gather to the page-store
    shard actors (closure-serialized handles), extract inline."""
    from ..state.store import fetch_scatter

    fetch_mask = (df["gate"] == GATE_FETCH).to_numpy()
    fetch_ix = np.flatnonzero(fetch_mask)
    urls = df["url"].to_numpy()[fetch_mask]
    hashes = df["url_hash"].to_numpy().astype(np.uint64)[fetch_mask]
    attempts = df["attempts"].to_numpy()[fetch_mask]
    fail_now = transient_fail_mask(hashes, attempts, error_permille)
    payloads: list = [None] * len(urls)
    if (~fail_now).any():
        got = fetch_scatter(store_handles, urls[~fail_now], hashes[~fail_now])
        for k, i in enumerate(np.flatnonzero(~fail_now)):
            payloads[i] = got[k]
    return _assemble(df, payloads, fetch_ix, fail_now, enrich=enrich)


_BUCKET_FILE_CACHE: dict = {}


def bucket_files_of(index_dir: str, n_buckets: int, version: int = 0) -> dict:
    """bucket → fragment paths, cached per worker process. ``version``
    (the count of watch-mode ingest batches) busts the cache when new
    index files appear mid-run."""
    key = (index_dir, n_buckets, version)
    if key not in _BUCKET_FILE_CACHE:
        _BUCKET_FILE_CACHE[key] = {
            j: sorted(glob.glob(os.path.join(index_dir, f"bucket={j}", "*.parquet")))
            for j in range(n_buckets)
        }
    return _BUCKET_FILE_CACHE[key]


def parquet_probe(index_dir: str, n_buckets: int, urls: np.ndarray,
                  hashes: np.ndarray, version: int = 0) -> list:
    """Store-less fetch: read only the owning buckets with an isin filter
    pushed into the Parquet scan. Returns per-url payloads (None = miss),
    aligned to input order."""
    bucket_files = bucket_files_of(index_dir, n_buckets, version)
    buckets = (hashes.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
    by_url: dict = {}
    for j in np.unique(buckets):
        sub = urls[buckets == j]
        files = bucket_files.get(int(j), [])
        if not files:
            continue
        dset = pads.dataset(files, format="parquet")
        t = dset.to_table(
            columns=["url", "warc_ts", "html", "lang"],
            filter=pc.field("url").isin(pa.array(sub, type=pa.string())),
        )
        for u, ts, h, lg in zip(
            t["url"].to_pylist(),
            t["warc_ts"].cast(pa.int64()).to_pylist(),
            t["html"].to_pylist(),
            t["lang"].to_pylist(),
        ):
            by_url[u] = (ts, h, lg)
    return [by_url.get(u) for u in urls]


class FetchSim:
    """Parquet-probe fetch mode: map_batches actor holding the bucket →
    fragment-paths map (resolved once per actor in __init__)."""

    def __init__(self, index_dir: str, n_buckets: int, error_permille: int = 0,
                 enrich: bool = False):
        self.n_buckets = n_buckets
        self.error_permille = error_permille
        self.enrich = enrich
        self.bucket_files: dict[int, list[str]] = {}
        for j in range(n_buckets):
            files = sorted(glob.glob(os.path.join(index_dir, f"bucket={j}", "*.parquet")))
            self.bucket_files[j] = files

    def _lookup(self, urls: np.ndarray, hashes: np.ndarray) -> dict:
        """url → (warc_ts_us, html, lang) for urls present, read only from
        the owning buckets with an isin filter pushed into the scan."""
        buckets = (hashes % np.uint64(self.n_buckets)).astype(np.int64)
        out: dict = {}
        for j in np.unique(buckets):
            sub = urls[buckets == j]
            files = self.bucket_files.get(int(j), [])
            if not files:
                continue
            dset = pads.dataset(files, format="parquet")
            t = dset.to_table(
                columns=["url", "warc_ts", "html", "lang"],
                filter=pc.field("url").isin(pa.array(sub, type=pa.string())),
            )
            for u, ts, h, lg in zip(
                t["url"].to_pylist(),
                t["warc_ts"].cast(pa.int64()).to_pylist(),
                t["html"].to_pylist(),
                t["lang"].to_pylist(),
            ):
                out[u] = (ts, h, lg)
        return out

    def __call__(self, df: pd.DataFrame) -> pa.Table:
        fetch_mask = (df["gate"] == GATE_FETCH).to_numpy()
        fetch_ix = np.flatnonzero(fetch_mask)
        urls = df["url"].to_numpy()[fetch_mask]
        hashes = df["url_hash"].to_numpy().astype(np.uint64)[fetch_mask]
        attempts = df["attempts"].to_numpy()[fetch_mask]
        fail_now = transient_fail_mask(hashes, attempts, self.error_permille)
        by_url = self._lookup(urls[~fail_now], hashes[~fail_now])
        payloads = [
            None if fail_now[k] else by_url.get(u) for k, u in enumerate(urls)
        ]
        return _assemble(df, payloads, fetch_ix, fail_now, enrich=self.enrich)
