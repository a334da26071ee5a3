"""Page-store shard tests: packed-buffer fetch protocol correctness
(hits, misses, empties) against the plain protocol."""

import numpy as np
import pytest

from ethereum_raw_data_crawler_ray.functions.hashing import hash_strings


@pytest.fixture(scope="module")
def store(corpus_dir, ray_session):
    from ethereum_raw_data_crawler_ray.stages.fetch import build_fetch_index
    from ethereum_raw_data_crawler_ray.state.store import ActorPageStore

    build_fetch_index(corpus_dir + "/pages.parquet", "/tmp/crawl_test_idx", 8)
    s = ActorPageStore("/tmp/crawl_test_idx", 8, 4)
    assert s.wait_ready() == 1500
    yield s
    s.kill()


def test_fetch_scatter_hits_and_misses(store, corpus_dir):
    import pyarrow.parquet as pq

    from ethereum_raw_data_crawler_ray.state.store import fetch_scatter

    t = pq.read_table(corpus_dir + "/pages.parquet", columns=["url", "html"])
    urls = np.array(t["url"].to_pylist()[:50] + ["https://nope.example/missing"], dtype=object)
    hashes = hash_strings(urls)
    got = fetch_scatter(store.handles, urls, hashes)
    assert got[-1] is None  # miss
    htmls = dict(zip(t["url"].to_pylist(), t["html"].to_pylist()))
    for u, payload in zip(urls[:-1], got[:-1]):
        ts, html, lang = payload
        assert bytes(html) == htmls[u]  # byte-exact through the packed buffer
        assert isinstance(ts, int) and lang


def test_fetch_scatter_empty(store):
    from ethereum_raw_data_crawler_ray.state.store import fetch_scatter

    assert fetch_scatter(store.handles, np.array([], dtype=object),
                         np.array([], dtype=np.uint64)) == []


def test_n_buckets_must_divide(ray_session):
    from ethereum_raw_data_crawler_ray.state.store import ActorPageStore

    with pytest.raises(ValueError):
        ActorPageStore("/tmp/crawl_test_idx", 8, 3)
