"""Unit tests for the cuckoo filter, seen-set sharding and politeness
budgets (SURVEY.md §5 target strategy: cuckoo insert/contains/FP bound,
token-bucket budgets, priority ordering)."""

import numpy as np
import pandas as pd
import pytest

from ethereum_raw_data_crawler_ray.state.cuckoo import CuckooFilter
from ethereum_raw_data_crawler_ray.state.politeness import (
    ORDER_COLS,
    budget_for,
    path_of,
    robots_denied,
    salt_budget,
)
from ethereum_raw_data_crawler_ray.state.seen import LocalSeenSet


def _hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


class TestCuckoo:
    def test_insert_contains(self):
        f = CuckooFilter(10_000)
        h = _hashes(5_000)
        novel = f.check_and_insert_many(h)
        assert novel.all()
        assert f.count == 5_000
        assert f.contains_many(h).all()

    def test_duplicates_within_batch(self):
        f = CuckooFilter(1_000)
        h = np.array([7, 7, 8, 7, 8], dtype=np.uint64)
        novel = f.check_and_insert_many(h)
        assert list(novel) == [True, False, True, False, False]
        assert f.count == 2

    def test_false_positive_bound(self):
        f = CuckooFilter(100_000)
        f.check_and_insert_many(_hashes(80_000, seed=1))
        probe = _hashes(100_000, seed=2)
        fp = f.contains_many(probe).mean()
        # 16-bit fingerprints, 2 buckets x 4 slots: expect ~0.012%, allow 0.1%
        assert fp < 1e-3

    def test_digest_insert_order_independent(self):
        h = _hashes(2_000, seed=3)
        a, b = CuckooFilter(100_000), CuckooFilter(100_000)
        a.check_and_insert_many(h)
        b.check_and_insert_many(h[::-1].copy())
        assert a.digest() == b.digest()

    def test_high_load_with_fixed_low_bits(self):
        # regression (ADVICE r01): shard routing consumes the raw hash's
        # low bits (h % n_shards), so within a shard the low bits are
        # CONSTANT — the filter must still reach high load. Simulate a
        # 256-shard routing pattern at 90% of stated capacity.
        cap = 40_000
        f = CuckooFilter(cap)
        n = int(cap * 0.9)
        rng = np.random.default_rng(11)
        h = rng.integers(0, 2**56, size=n, dtype=np.uint64) * np.uint64(256) + np.uint64(3)
        assert (h % np.uint64(256) == 3).all()
        novel = f.check_and_insert_many(h)  # must not raise "shard full"
        assert f.count == int(novel.sum())
        assert f.contains_many(h).all()

    def test_count_consistent_across_batches(self):
        f = CuckooFilter(10_000)
        a, b = _hashes(500, seed=8), _hashes(700, seed=9)
        f.check_and_insert_many(a)
        f.check_and_insert_many(np.concatenate([a, b]))
        assert f.count == len(np.unique(np.concatenate([a, b])))

    def test_dump_restore(self):
        f = CuckooFilter(10_000)
        h = _hashes(1_000, seed=4)
        f.check_and_insert_many(h)
        g = CuckooFilter.restore(f.dump())
        assert g.digest() == f.digest()
        assert g.contains_many(h).all()
        assert not g.check_and_insert_many(h).any()


class TestSeenSet:
    def test_sharded_membership(self):
        s = LocalSeenSet(4, 10_000)
        h = _hashes(3_000, seed=5)
        assert s.check_and_insert(h).all()
        assert not s.check_and_insert(h).any()
        assert s.contains(h).all()
        assert sum(s.counts()) == 3_000

    def test_shard_routing_stable(self):
        s1, s2 = LocalSeenSet(4, 10_000), LocalSeenSet(4, 10_000)
        h = _hashes(1_000, seed=6)
        s1.check_and_insert(h)
        s2.check_and_insert(h[::-1].copy())
        assert s1.digests() == s2.digests()


class TestClaimReplay:
    def test_retry_replays_own_claims(self):
        from ethereum_raw_data_crawler_ray.state.cuckoo import CuckooFilter
        from ethereum_raw_data_crawler_ray.state.seen import _replay_claims, claim_token

        f, claims = CuckooFilter(10_000), {}
        h = _hashes(100, seed=20)
        tok = claim_token(h)
        first = _replay_claims(f, claims, h, 3, tok)
        assert first.all()
        # task retry: same content, same token → claims replay
        again = _replay_claims(f, claims, h, 3, tok)
        assert again.all()
        # a DIFFERENT task offering the same urls is a true duplicate
        other = _replay_claims(f, claims, h, 3, claim_token(h[::-1].copy()))
        assert not other.any()

    def test_replay_preserves_within_batch_dedup(self):
        from ethereum_raw_data_crawler_ray.state.cuckoo import CuckooFilter
        from ethereum_raw_data_crawler_ray.state.seen import _replay_claims, claim_token

        f, claims = CuckooFilter(1_000), {}
        h = np.array([5, 5, 9], dtype=np.uint64)
        tok = claim_token(h)
        assert list(_replay_claims(f, claims, h, 0, tok)) == [True, False, True]
        assert list(_replay_claims(f, claims, h, 0, tok)) == [True, False, True]

    def test_end_round_drops_log(self):
        from ethereum_raw_data_crawler_ray.state.cuckoo import CuckooFilter
        from ethereum_raw_data_crawler_ray.state.seen import _replay_claims, claim_token

        f, claims = CuckooFilter(1_000), {}
        h = _hashes(10, seed=21)
        tok = claim_token(h)
        _replay_claims(f, claims, h, 0, tok)
        claims.pop(0, None)  # what end_round does
        assert not _replay_claims(f, claims, h, 1, tok).any()


class TestPoliteness:
    ROBOTS = {"slow.com": (1000, ("/private/",)), "fast.com": (0, ())}

    def test_budget(self):
        # analog of ETHEREUM_RATE_LIMIT: 60s round / 1000ms delay = 60 slots
        assert budget_for("slow.com", self.ROBOTS, 60_000, 100, 1000) == 60
        assert budget_for("fast.com", self.ROBOTS, 60_000, 100, 1000) == 1000
        # unknown host → default delay
        assert budget_for("x.com", self.ROBOTS, 60_000, 100, 1000) == 600
        assert budget_for("slow.com", self.ROBOTS, 60_000, 100, 10) == 10

    def test_salt_budget_sums_exactly(self):
        for b in (1, 7, 10, 999):
            for s in (1, 2, 4):
                assert sum(salt_budget(b, s, i) for i in range(s)) == b

    def test_robots_denied(self):
        assert robots_denied("https://slow.com/private/x", "slow.com", self.ROBOTS)
        assert not robots_denied("https://slow.com/page/x", "slow.com", self.ROBOTS)
        assert not robots_denied("https://fast.com/private/x", "fast.com", self.ROBOTS)
        assert path_of("https://a.com") == "/"

    def test_salt_count_for(self):
        from ethereum_raw_data_crawler_ray.state.politeness import salt_count_for

        assert salt_count_for(100, 1000, 1) == 1        # below threshold
        assert salt_count_for(2500, 1000, 1) == 3       # ceil(2500/1000)
        assert salt_count_for(2500, 1000, 4) == 4       # base wins
        assert salt_count_for(10**9, 1000, 1) == 64     # capped
        assert salt_count_for(2500, 0, 1) == 1          # disabled

    def test_backoff_budget(self):
        # class-aware rule (ethereum_service.go:594-624 analog): linear
        # in timeout errors, QUADRATIC in rate-limit errors
        from ethereum_raw_data_crawler_ray.state.politeness import backoff_budget

        assert backoff_budget(100, 0) == 100
        assert backoff_budget(100, 1) == 50    # 1 timeout → delay 2x
        assert backoff_budget(100, 3) == 25    # 3 timeouts → delay 4x
        assert backoff_budget(100, 1000) == 1  # never below 1
        assert backoff_budget(1, 5) == 1
        assert backoff_budget(100, 0, 1) == 25   # 1 rate-limit → (1+1)² = 4x
        assert backoff_budget(100, 0, 2) == 100 // 9  # quadratic
        assert backoff_budget(100, 1, 1) == 100 // 8  # composed
        assert backoff_budget(100, 0, 1000) == 1

    def test_transient_error_class_deterministic_and_split(self):
        import numpy as np

        from ethereum_raw_data_crawler_ray.stages.fetch import (
            ERR_RATE_LIMIT,
            ERR_TIMEOUT,
            transient_error_class,
        )

        h = np.arange(10_000, dtype=np.uint64) * np.uint64(2654435761)
        c1 = transient_error_class(h)
        c2 = transient_error_class(h)
        assert (c1 == c2).all()  # pure function of the hash
        frac_rl = (c1 == ERR_RATE_LIMIT).mean()
        assert 0.4 < frac_rl < 0.6  # ~half rate-limit, half timeout
        assert set(np.unique(c1)) <= {ERR_RATE_LIMIT, ERR_TIMEOUT}

    def test_parse_pkey(self):
        from ethereum_raw_data_crawler_ray.state.politeness import parse_pkey, pkey_of

        assert parse_pkey("a.com") == ("a.com", 0, 1)
        assert parse_pkey("a.com#3#8") == ("a.com", 3, 8)
        hosts = np.array(["a.com", "b.com", "a.com"], dtype=object)
        h = np.array([10, 11, 13], dtype=np.uint64)
        pk = pkey_of(hosts, h, 1, hot={"a.com": 4})
        assert pk[1] == "b.com"
        assert pk[0] == f"a.com#{10 % 4}#4" and pk[2] == f"a.com#{13 % 4}#4"

    def test_ordering_comparator(self):
        # priority ties broken by depth, then warc_ts, then url_hash —
        # the frontier-order analog of strict block-number order
        df = pd.DataFrame(
            {
                "priority": [1, 0, 0, 0],
                "depth": [0, 2, 1, 1],
                "warc_ts": [0, 0, 5, 5],
                "url_hash": np.array([40, 30, 20, 10], dtype=np.uint64),
                "url": ["d", "c", "b", "a"],
            }
        )
        got = df.sort_values(ORDER_COLS)["url"].tolist()
        assert got == ["a", "b", "c", "d"]
