"""Multi-format source readers (sources/tables.py): extension dispatch,
canonical-schema casts, the one-time parquet staging conversion, and the
CLI accepting a JSONL seed list end-to-end."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ethereum_raw_data_crawler_ray.sources import ensure_parquet, read_pages, read_table


@pytest.fixture(scope="module")
def events_df(sf_dir):
    return pd.read_parquet(os.path.join(sf_dir, "events.parquet"))


def test_read_table_csv_and_jsonl_match_parquet(tmp_path, events_df, ray_session):
    sub = events_df.drop(columns=["props"]).head(500)
    csv = tmp_path / "ev.csv"
    jsonl = tmp_path / "ev.jsonl"
    sub.to_csv(csv, index=False)
    sub.assign(ts=sub["ts"].astype(str)).to_json(jsonl, orient="records", lines=True)
    for path in (str(csv), str(jsonl)):
        got = read_table(path, columns=["event_id", "user_id", "value"]).to_pandas()
        got = got.sort_values("event_id").reset_index(drop=True)
        ref = sub[["event_id", "user_id", "value"]].sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"event_id": "int64", "user_id": "int64"}), ref, check_like=True
        )
    with pytest.raises(ValueError):
        read_table("/tmp/whatever.xml")


def test_read_pages_casts_to_canonical_schema(tmp_path, ray_session):
    rows = [
        {"url": "https://a.com/1", "warc_ts": "2024-01-01T00:00:00",
         "html": "<p>x</p>", "text": "x", "lang": "en"},
        {"url": "https://a.com/2", "warc_ts": "2024-01-02T03:04:05",
         "html": "<p>y</p>", "text": "y", "lang": "de"},
    ]
    p = tmp_path / "pages.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    out = read_pages(str(p))
    tbl = pa.Table.from_pandas(out.to_pandas())
    got = {f: str(tbl.schema.field(f).type) for f in ("url", "warc_ts", "html", "text", "lang")}
    assert got["warc_ts"].startswith("timestamp")
    assert got["html"] == "binary"
    assert out.count() == 2


def test_ensure_parquet_identity_and_conversion(tmp_path, events_df, ray_session):
    import pyarrow.parquet as pq

    pq_in = tmp_path / "ev.parquet"
    events_df.head(100).to_parquet(pq_in)
    assert ensure_parquet(str(pq_in), str(tmp_path / "stage")) == str(pq_in)

    jsonl = tmp_path / "seeds.jsonl"
    seeds = pd.DataFrame(
        {"url": [f"https://h.com/{i}" for i in range(20)],
         "priority": np.arange(20) % 3, "depth": 0}
    )
    seeds.to_json(jsonl, orient="records", lines=True)
    out = ensure_parquet(str(jsonl), str(tmp_path / "stage"))
    back = pq.read_table(out).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(back) == 20 and set(back.columns) == {"url", "priority", "depth"}
    # cached: second call returns the same staging path without rework
    assert ensure_parquet(str(jsonl), str(tmp_path / "stage")) == out


def test_cli_accepts_jsonl_seeds(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from ethereum_raw_data_crawler_ray.run import main
    from ethereum_raw_data_crawler_ray.testdata import ensure_corpus

    corpus = ensure_corpus(300, n_hosts=6, n_seeds=4, base_dir="/tmp/test_corpus")
    seeds = pq.read_table(corpus + "/seeds.parquet").to_pandas()
    jsonl = tmp_path / "seeds.jsonl"
    seeds.to_json(jsonl, orient="records", lines=True)
    out = tmp_path / "out"
    rc = main([
        "--pages", corpus + "/pages.parquet",
        "--seeds", str(jsonl),
        "--robots", corpus + "/robots.parquet",
        "--out", str(out), "--index", str(tmp_path / "idx"),
        "--seen-shards", "2", "--fetch-buckets", "4",
    ])
    assert rc == 0
    # same crawl as with parquet seeds (the conversion is lossless)
    out2 = tmp_path / "out2"
    rc2 = main([
        "--pages", corpus + "/pages.parquet",
        "--seeds", corpus + "/seeds.parquet",
        "--robots", corpus + "/robots.parquet",
        "--out", str(out2), "--index", str(tmp_path / "idx"),
        "--seen-shards", "2", "--fetch-buckets", "4",
    ])
    assert rc2 == 0
    import pyarrow.dataset as pads

    a = pads.dataset(str(out / "rounds"), partitioning="hive").to_table().to_pandas()
    b = pads.dataset(str(out2 / "rounds"), partitioning="hive").to_table().to_pandas()
    cols = [c for c in a.columns if c != "wall_s"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values("url").reset_index(drop=True),
        b[cols].sort_values("url").reset_index(drop=True),
    )


def test_ensure_parquet_same_basename_no_collision(tmp_path, ray_session):
    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    a_dir.mkdir(); b_dir.mkdir()
    pd.DataFrame({"x": [1, 2]}).to_json(a_dir / "data.jsonl", orient="records", lines=True)
    pd.DataFrame({"y": [9]}).to_json(b_dir / "data.jsonl", orient="records", lines=True)
    import pyarrow.parquet as pq

    pa_ = ensure_parquet(str(a_dir / "data.jsonl"), str(tmp_path / "stage"))
    pb_ = ensure_parquet(str(b_dir / "data.jsonl"), str(tmp_path / "stage"))
    assert pa_ != pb_
    assert set(pq.read_table(pa_).column_names) == {"x"}
    assert set(pq.read_table(pb_).column_names) == {"y"}


def test_cli_accepts_jsonl_pages(tmp_path, ray_session):
    """Pages arriving as JSONL (html as utf-8 string) crawl identically
    to the parquet original — the canonical cast restores html:binary
    before the packed-buffer fetch protocol sees it."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ethereum_raw_data_crawler_ray.run import main
    from ethereum_raw_data_crawler_ray.testdata import ensure_corpus

    corpus = ensure_corpus(300, n_hosts=6, n_seeds=4, base_dir="/tmp/test_corpus")
    pages = pq.read_table(corpus + "/pages.parquet").to_pandas()
    pages["html"] = pages["html"].apply(lambda b: b.decode("utf-8"))
    pages["warc_ts"] = pages["warc_ts"].astype(str)
    jsonl = tmp_path / "pages.jsonl"
    pages.to_json(jsonl, orient="records", lines=True)
    out, out2 = tmp_path / "o1", tmp_path / "o2"
    common = ["--seeds", corpus + "/seeds.parquet", "--robots", corpus + "/robots.parquet",
              "--seen-shards", "2", "--fetch-buckets", "4"]
    assert main(["--pages", str(jsonl), "--out", str(out),
                 "--index", str(tmp_path / "idx1"), *common]) == 0
    assert main(["--pages", corpus + "/pages.parquet", "--out", str(out2),
                 "--index", str(tmp_path / "idx2"), *common]) == 0
    a = pads.dataset(str(out / "rounds"), partitioning="hive").to_table().to_pandas()
    b = pads.dataset(str(out2 / "rounds"), partitioning="hive").to_table().to_pandas()
    cols = [c for c in a.columns if c != "wall_s"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values("url").reset_index(drop=True),
        b[cols].sort_values("url").reset_index(drop=True),
    )
