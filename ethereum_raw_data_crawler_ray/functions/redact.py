"""PII / pattern redaction — a standard pre-training privacy stage
(emails, phone numbers, IP addresses → placeholder tokens), expressed
as vectorized pyarrow RE2 kernels (``count_substring_regex`` +
``replace_substring_regex``) with ZERO per-row Python.  RE2 is the
same regex engine DuckDB uses, so the q78 oracle's ``regexp_replace
(..., 'g')`` / ``regexp_extract_all`` are bit-identical counterparts
(the q74 parity precedent).

Patterns apply SEQUENTIALLY: each one counts matches on the text as
redacted so far, then rewrites — so a pattern can never re-match text
an earlier pattern already replaced (no double counting).  The
operator is a shuffle-free ``map_batches`` stage; at 100 TB it
pipelines block-by-block with nothing materialized.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# (name, RE2 pattern, replacement) — names become n_<name>s count columns.
# RE2-only syntax (no lookaround); \b is supported by RE2 and DuckDB alike.
DEFAULT_PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+\d{1,2} \d{3}-\d{3}-\d{4}", "[PHONE]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def redact_batch(t: pa.Table, *, text_col: str, id_col: str,
                 patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PII_PATTERNS,
                 ) -> pa.Table:
    """One batch: (id, n_<name>s … per pattern, redacted)."""
    cur = pc.cast(t[text_col].combine_chunks(), pa.string())
    cols: dict = {id_col: t[id_col]}
    for name, pat, repl in patterns:
        cols[f"n_{name}s"] = pc.cast(
            pc.count_substring_regex(cur, pat), pa.int64()
        )
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=repl)
    cols["redacted"] = cur
    return pa.table(cols)


def redact_pii(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id",
               patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PII_PATTERNS,
               ) -> rd.Dataset:
    """Redact PII patterns from ``text_col``; returns
    (id, n_emails, n_phones, n_ips, redacted) with the default set."""
    return ds.map_batches(
        redact_batch, batch_format="pyarrow",
        fn_kwargs=dict(text_col=text_col, id_col=id_col, patterns=patterns),
    )
