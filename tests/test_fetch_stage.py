"""Edge-case tests for the fetch/round-step assembly: empty and tiny
batches must produce fully-typed Arrow tables (a 0-row object column
must not infer `null` type — that broke multi-block writes)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from ethereum_raw_data_crawler_ray.stages.fetch import _assemble


def _frontier_df(n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "url": [f"https://h/x{i}" for i in range(n)],
            "url_hash": np.arange(n, dtype=np.uint64),
            "host": ["h"] * n,
            "priority": np.zeros(n, dtype=np.int32),
            "depth": np.zeros(n, dtype=np.int32),
            "warc_ts": pd.Series(np.zeros(n, dtype="datetime64[us]")),
            "attempts": np.zeros(n, dtype=np.int32),
            "skip_until_round": np.full(n, -1, dtype=np.int32),
            "gate": ["fetch"] * n,
        }
    )


def test_assemble_empty_batch_is_typed():
    t = _assemble(_frontier_df(0), [], np.zeros(0, dtype=np.int64), np.zeros(0, dtype=bool))
    assert t.num_rows == 0
    assert t.schema.field("url").type == pa.string()
    assert t.schema.field("warc_ts").type == pa.timestamp("us")
    assert t.schema.field("url_hash").type == pa.uint64()
    assert not any(f.type == pa.null() for f in t.schema)


def test_assemble_single_row_miss():
    df = _frontier_df(1)
    t = _assemble(df, [None], np.array([0]), np.array([False]))
    assert t.num_rows == 1
    assert t["status"].to_pylist() == ["error"]


def test_assemble_single_row_hit():
    from ethereum_raw_data_crawler_ray.functions.extract import render_html

    df = _frontier_df(1)
    html = render_html("hello world", "t", ["https://h/other"])
    t = _assemble(df, [(123456, html, "en")], np.array([0]), np.array([False]), enrich=True)
    assert t["status"].to_pylist() == ["fetched"]
    assert t["text"].to_pylist() == ["hello world"]
    assert t["n_outlinks"].to_pylist() == [1]
    assert t["simhash"].to_pylist()[0] != 0
