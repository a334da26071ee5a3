"""Multi-format table sources — the connector surface (SURVEY.md §2.1).

The reference ingests from exactly one live source (JSON-RPC /
WebSocket, `ethereum_service.go`); a standalone engine gets its pages,
seeds and robots tables handed to it as FILES, and those arrive in
whatever format the upstream dump produced.  This module normalizes
format at the edge so the rest of the engine only ever sees Parquet:

- :func:`read_table`  — extension-dispatched Ray Data reader
  (``.parquet`` / ``.csv`` / ``.json``/``.jsonl``) with column pruning
  (pushed into the read for parquet, a projection stage otherwise).
- :func:`read_pages`  — ``read_table`` + cast to the canonical pages
  schema (``url, warc_ts[us], html:binary, text, lang``).
- :func:`ensure_parquet` — identity for parquet inputs; one streaming
  Ray conversion (read → write_parquet) into a staging dir otherwise,
  keyed by content identity (path+mtime+size) so same-named inputs
  can't collide and edits re-convert.  This lets the CLI accept CSV/JSONL
  seeds or pages without the hot path (footer-metadata span packing,
  hive-partition reads) growing format branches.

Scale note: conversion is a single streaming pass — blocks flow from
the reader to the parquet writer with backpressure; nothing
materializes on the driver.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

PAGES_FIELDS = [
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
]


def _fmt(path: str) -> str:
    if os.path.isdir(path):
        return "parquet"  # directory datasets (hive layouts) are parquet
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext in ("parquet", "pq"):
        return "parquet"
    if ext == "csv":
        return "csv"
    if ext in ("json", "jsonl", "ndjson"):
        return "json"
    raise ValueError(f"unsupported table format {ext!r} for {path!r}")


def read_table(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read one table file/dir into a Dataset, dispatched on extension.
    For parquet the column list prunes at the read (only those columns
    leave storage); CSV/JSON readers don't support pushdown, so the
    projection runs as the first stage instead."""
    fmt = _fmt(path)
    if fmt == "parquet":
        return rd.read_parquet(path, columns=columns)
    ds = rd.read_csv(path) if fmt == "csv" else rd.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def _canonicalize_pages(t: pa.Table, want: list[str] | None = None) -> pa.Table:
    """Cast whatever canonical pages columns are present to their
    canonical types (timestamps arrive as strings from JSON/CSV, html
    as string) — THE one pages-schema cast, shared by read_pages and
    the CLI staging conversion so the two paths can't drift."""
    types = dict(PAGES_FIELDS)
    cols = {}
    for name in (want or [n for n, _ in PAGES_FIELDS]):
        if name not in t.schema.names:
            continue
        col = t[name]
        target = types[name]
        if col.type != target:
            col = col.cast(target)  # arrow casts string→timestamp/binary directly
        cols[name] = col
    return pa.table(cols)


def read_pages(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """``read_table`` + cast to the canonical pages schema.  JSON/CSV
    carry timestamps and binary as strings — cast what is present;
    absent optional columns stay absent."""
    want = [n for n, _ in PAGES_FIELDS if columns is None or n in columns]
    ds = read_table(path, columns=want if _fmt(path) == "parquet" else None)
    return ds.map_batches(
        _canonicalize_pages, batch_format="pyarrow", fn_kwargs={"want": want}
    )


def ensure_parquet(path: str, staging_dir: str, *, pages: bool = False) -> str:
    """Return a parquet path for ``path``: identity when it already is
    parquet, else ONE streaming Ray conversion into ``staging_dir``.
    The staging name is keyed by (abspath, mtime, size), so two inputs
    sharing a basename can't collide and an edited source re-converts
    instead of silently reusing a stale file.  ``pages=True`` applies
    the full canonical pages cast (url/warc_ts/html/text/lang types —
    html MUST be binary before it reaches the packed-buffer fetch
    protocol); otherwise only a string warc_ts is canonicalized."""
    if _fmt(path) == "parquet":
        return path
    import hashlib
    import shutil

    st = os.stat(path)
    tag = hashlib.blake2b(
        f"{os.path.abspath(path)}|{st.st_mtime_ns}|{st.st_size}".encode(),
        digest_size=6,
    ).hexdigest()
    base = os.path.splitext(os.path.basename(path))[0]
    out = os.path.join(staging_dir, f"{base}-{tag}.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(staging_dir, exist_ok=True)
    ds = read_table(path)

    def fix(t: pa.Table) -> pa.Table:
        if pages:
            return _canonicalize_pages(t)
        if "warc_ts" in t.schema.names and pa.types.is_string(t["warc_ts"].type):
            i = t.schema.get_field_index("warc_ts")
            t = t.set_column(i, "warc_ts", t["warc_ts"].cast(pa.timestamp("us")))
        return t

    # PER-RUN unique tmp dir: two concurrent runs converting the same
    # input must never share a staging scratch dir — with a shared
    # `out + ".tmp"` the loser's initial rmtree deletes the winner's
    # in-flight part files and the committed dir can end up holding a
    # MIX of both runs' parts (cached forever by the (path,mtime,size)
    # key).  mkdtemp isolates each writer; the rename is then a clean
    # first-writer-wins race (same key ⇒ identical content).
    import tempfile

    tmp = tempfile.mkdtemp(prefix=f".{base}-{tag}-", dir=staging_dir)
    try:
        ds.map_batches(fix, batch_format="pyarrow").write_parquet(tmp)
        os.rename(tmp, out)
    except OSError:
        if not os.path.exists(out):
            raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)  # loser's (or crashed) scratch
    return out
