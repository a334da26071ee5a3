"""Simulated fetch + extract stage (SURVEY.md S1/S3 + M2).

The reference fetches one block per RPC call with 3 retries and
reconnect-on-error (``ethereum_service.go:142-185``), then its
transactions (``:256-315``). The sandbox has no network, so "fetching" a
URL means looking its payload up in a **hash-bucketed fetch index** built
once from the input pages table: pages are partitioned by
``url_hash % n_buckets`` into per-bucket Parquet files, and each fetch
actor reads only the bucket files its batch's URLs map to, with an
``url ∈ {...}`` predicate pushed into the Parquet read. That is the
honest scale shape of a KV/content-store lookup: per-batch I/O is
O(batch), never O(corpus).

The stage is an actor pool (callable class): the bucket → fragment-paths
map is resolved once in ``__init__``; per batch it fetches, extracts
(strict→lenient→raw fallback chain, :mod:`..functions.extract`), and
stamps ``status`` — ``fetched`` or ``error`` (missing URL or injected
deterministic transient failure, the analog of RPC errors driving the
retry path, ``scheduler_service.go:324-357``).
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


class FetchSim:
    """map_batches actor: simulated fetch + extraction.

    Rows with gate != 'fetch' pass through untouched (payload columns
    null). ``error_permille`` injects deterministic transient failures:
    a URL fails on its first attempt iff mix(url_hash) lands under the
    rate, and succeeds on retry — exercising the reference's
    retry-then-skip path (scheduler_service.go:84-93) without randomness.
    """

    def __init__(self, index_dir: str, n_buckets: int, error_permille: int = 0):
        self.n_buckets = n_buckets
        self.error_permille = error_permille
        self.bucket_files: dict[int, list[str]] = {}
        for j in range(n_buckets):
            files = sorted(glob.glob(os.path.join(index_dir, f"bucket={j}", "*.parquet")))
            self.bucket_files[j] = files

    def _lookup(self, urls: np.ndarray, hashes: np.ndarray) -> dict:
        """url → (warc_ts_us:int, html:bytes, lang:str) for urls present in
        the store, read only from the owning buckets with an isin filter
        pushed into the Parquet scan."""
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
        n = len(df)
        status = np.full(n, None, dtype=object)
        page_ts = np.zeros(n, dtype=np.int64)
        has_page = np.zeros(n, dtype=bool)
        lang = np.full(n, None, dtype=object)
        text = np.full(n, None, dtype=object)
        n_bytes = np.zeros(n, dtype=np.int64)
        outlinks: list = [[] for _ in range(n)]

        fetch_mask = (df["gate"] == GATE_FETCH).to_numpy()
        if fetch_mask.any():
            urls = df["url"].to_numpy()[fetch_mask]
            hashes = df["url_hash"].to_numpy().astype(np.uint64)[fetch_mask]
            attempts = df["attempts"].to_numpy()[fetch_mask]

            # deterministic transient error injection (first attempt only)
            if self.error_permille > 0:
                with np.errstate(over="ignore"):
                    z = (hashes * np.uint64(0x9E3779B97F4A7C15)) & _M64
                transient = ((z >> np.uint64(40)) % np.uint64(1000)) < np.uint64(
                    self.error_permille
                )
                fail_now = transient & (attempts == 0)
            else:
                fail_now = np.zeros(len(urls), dtype=bool)

            by_url = self._lookup(urls[~fail_now], hashes[~fail_now])

            fetch_ix = np.flatnonzero(fetch_mask)
            htmls, html_rows = [], []
            for k, u in enumerate(urls):
                row = fetch_ix[k]
                if fail_now[k] or u not in by_url:
                    status[row] = STATUS_ERROR
                else:
                    status[row] = STATUS_FETCHED
                    htmls.append(by_url[u][1])
                    html_rows.append((row, u))

            texts, links = extract_batch(htmls)
            for pos, (row, u) in enumerate(html_rows):
                ts, raw, lg = by_url[u]
                page_ts[row] = ts
                has_page[row] = True
                lang[row] = lg
                text[row] = texts[pos]
                n_bytes[row] = len(raw)
                outlinks[row] = links[pos]

        cols = {name: pa.Array.from_pandas(df[name]) for name in df.columns}
        cols["warc_ts"] = pa.Array.from_pandas(df["warc_ts"]).cast(pa.timestamp("us"))
        cols["url_hash"] = pa.array(
            df["url_hash"].to_numpy().astype(np.uint64), type=pa.uint64()
        )
        cols.update(
            {
                "status": pa.array(status, type=pa.string()),
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
        return pa.table(cols)
