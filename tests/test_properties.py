"""Property-based tests (hypothesis) for the engine's pure functions —
the reference has no property tests (SURVEY.md §5); these pin the
invariants the distributed paths rely on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ethereum_raw_data_crawler_ray.functions.extract import (
    extract_outlinks_one,
    extract_text_one,
    render_html,
)
from ethereum_raw_data_crawler_ray.functions.hashing import hash_strings
from ethereum_raw_data_crawler_ray.functions.urlnorm import normalize_url
from ethereum_raw_data_crawler_ray.state.cuckoo import CuckooFilter
from ethereum_raw_data_crawler_ray.state.politeness import salt_budget

# text without the sequences the strict parser uses as delimiters
_text = st.text(
    st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=400
).filter(lambda s: "</p></article>" not in s)


@given(_text, st.lists(st.text(st.characters(min_codepoint=33, max_codepoint=126), max_size=50), max_size=5))
@settings(max_examples=200, deadline=None)
def test_render_extract_roundtrip(text, links):
    html = render_html(text, "t", links)
    out, parser = extract_text_one(html)
    assert parser == "strict"
    assert out == text  # byte-identical for ANY text
    assert extract_outlinks_one(html) == links


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent(url):
    n = normalize_url(url)
    if n is not None:
        assert normalize_url(n) == n  # normalization is a projection
        assert n.startswith(("http://", "https://"))


@given(st.lists(st.text(min_size=1, max_size=60), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_hashing_deterministic_and_order_free(strings):
    a = hash_strings(strings)
    b = hash_strings(list(strings))
    assert (a == b).all()
    # per-element: hash of each string independent of its neighbors
    for i, s in enumerate(strings):
        assert hash_strings([s])[0] == a[i]


@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=500)
)
@settings(max_examples=100, deadline=None)
def test_cuckoo_no_false_negatives(hashes):
    f = CuckooFilter(4096)
    arr = np.array(hashes, dtype=np.uint64)
    f.check_and_insert_many(arr)
    assert f.contains_many(arr).all()  # inserted ⇒ contained, always
    # count ≤ distinct inputs (two hashes sharing (fingerprint, bucket)
    # are indistinguishable — the documented false-positive direction;
    # count can never exceed the distinct inputs)
    assert f.count <= len(set(hashes))


@given(st.integers(min_value=1, max_value=100_000), st.integers(min_value=1, max_value=16))
@settings(max_examples=200, deadline=None)
def test_salt_budget_partitions_exactly(budget, n_salt):
    parts = [salt_budget(budget, n_salt, i) for i in range(n_salt)]
    assert sum(parts) == budget
    assert all(p >= 0 for p in parts)


_host = st.text(
    st.characters(min_codepoint=45, max_codepoint=122, blacklist_characters="#"),
    min_size=1, max_size=30,
)


@given(
    st.lists(_host, min_size=1, max_size=20),
    st.integers(min_value=1, max_value=8),
    st.dictionaries(_host, st.integers(min_value=2, max_value=64), max_size=4),
)
@settings(max_examples=150, deadline=None)
def test_pkey_roundtrip_and_budget_consistency(hosts, base, hot):
    import numpy as np

    from ethereum_raw_data_crawler_ray.state.politeness import parse_pkey, pkey_of

    harr = np.array(hosts, dtype=object)
    uh = np.arange(len(hosts), dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    pks = pkey_of(harr, uh, base, hot)
    for host, h, pk in zip(hosts, uh, pks):
        ph, salt, n = parse_pkey(pk)
        assert ph == host
        expected_n = max(base, hot.get(host, base))
        if expected_n <= 1:
            assert (salt, n) == (0, 1)
        else:
            assert n == expected_n
            assert salt == int(h % np.uint64(n))
    # every host's salted budgets still partition the host budget exactly
    for host in set(hosts):
        n = max(base, hot.get(host, base))
        assert sum(salt_budget(1000, n, s) for s in range(n)) == 1000
