"""Durable at-least-once events consumer (consumer.py) — the NATS
durable-pull analog (reference examples/nats_consumer.go:85-101:
durable name, pull, MaxDeliver=3, AckWait)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ethereum_raw_data_crawler_ray.consumer import EventsConsumer


def _publish(out_dir, rounds):
    for r in rounds:
        d = os.path.join(out_dir, "events", f"round_{r:05d}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table({"url": [f"u{r}"], "round": pa.array([r], pa.int32())}),
            os.path.join(d, "part-0.parquet"),
        )


def test_fetch_ack_order_and_durability(tmp_path):
    out = str(tmp_path)
    _publish(out, [0, 1, 2])
    c = EventsConsumer(out, name="c1")
    got = [(r, t["round"][0].as_py()) for r, t in c.fetch(batch=2)]
    assert got == [(0, 0), (1, 1)]
    c.ack(0)
    c.ack(1)
    # a NEW instance (restart) resumes from the durable cursor
    c2 = EventsConsumer(out, name="c1")
    assert [r for r, _ in c2.fetch(batch=5)] == [2]
    c2.ack(2)
    assert c2.pending() == []
    # late-published round becomes visible without any cursor surgery
    _publish(out, [3])
    assert c2.pending() == [3]


def test_unacked_rounds_redeliver(tmp_path):
    out = str(tmp_path)
    _publish(out, [0])
    c = EventsConsumer(out, name="c1")
    assert [r for r, _ in c.fetch()] == [0]  # delivered, not acked
    assert [r for r, _ in c.fetch()] == [0]  # redelivered (AckWait analog)
    c.ack(0)
    assert [r for r, _ in c.fetch()] == []


def test_max_deliver_dead_letters(tmp_path):
    out = str(tmp_path)
    _publish(out, [0, 1])
    c = EventsConsumer(out, name="c1", max_deliver=3)
    for _ in range(3):  # three deliveries of the poison round, no ack
        assert [r for r, _ in c.fetch(batch=1)] == [0]
    # 4th pull: round 0 exceeds MaxDeliver → dead-lettered, skipped;
    # the consumer moves on to round 1 instead of wedging
    assert [r for r, _ in c.fetch(batch=1)] == [1]
    assert c.dead_letters() == [0]
    # dead-letter state is durable too
    c2 = EventsConsumer(out, name="c1")
    assert c2.dead_letters() == [0]
    assert c2.pending() == [1]


def test_independent_durable_names(tmp_path):
    out = str(tmp_path)
    _publish(out, [0])
    a = EventsConsumer(out, name="a")
    b = EventsConsumer(out, name="b")
    a_got = [r for r, _ in a.fetch()]
    a.ack(0)
    assert a_got == [0] and a.pending() == []
    assert [r for r, _ in b.fetch()] == [0]  # b has its own cursor


def test_vanished_round_burns_no_delivery(tmp_path):
    # a resumed crawl republishes replayed rounds via rmtree+rename; a
    # read that hits that window must not count toward MaxDeliver
    import shutil

    out = str(tmp_path)
    _publish(out, [0])
    c = EventsConsumer(out, name="c1", max_deliver=2)
    shutil.rmtree(os.path.join(out, "events", "round_00000"))
    for _ in range(5):  # many collisions with the republish window
        assert list(c.fetch()) == []
    _publish(out, [0])  # republished
    got = [r for r, _ in c.fetch()]
    assert got == [0]
    assert c.dead_letters() == []
    c.ack(0)
    assert c.pending() == []


def test_permanently_unreadable_round_dead_letters(tmp_path):
    # ADVICE r04: a round that stays unreadable forever (corrupt payload
    # under retention churn) must not be re-probed indefinitely — a
    # probe counts only when the publish high-water mark ADVANCED since
    # the last one (so a transient republish race burns at most one
    # probe per epoch), and max_deliver counted probes dead-letter
    out = str(tmp_path)
    _publish(out, [0, 1])
    bad = os.path.join(out, "events", "round_00000", "part-0.parquet")
    with open(bad, "wb") as f:
        f.write(b"not a parquet file")
    c = EventsConsumer(out, name="c1", max_deliver=2)
    got = [r for r, _ in c.fetch(batch=5)]
    assert got == [1]  # probe 1 of round 0 fails, round 1 delivers
    assert c.dead_letters() == []
    c.ack(1)
    # same publish epoch: repeated pulls burn NO additional probes
    for _ in range(4):
        assert list(c.fetch(batch=5)) == []
    assert c.dead_letters() == []
    # the crawl moves on (new round published) while 0 stays unreadable
    _publish(out, [2])
    got = [r for r, _ in c.fetch(batch=5)]
    assert got == [2]
    assert c.dead_letters() == [0]  # probe 2 (hwm advanced) hit the limit
    c.ack(2)
    assert c.pending() == []
    # the dead-letter is durable across restart
    c2 = EventsConsumer(out, name="c1", max_deliver=2)
    assert c2.dead_letters() == [0]
    assert list(c2.fetch(batch=5)) == []


def test_newest_round_unreadable_stays_in_grace_window(tmp_path):
    # the NEWEST round is exactly what a resumed crawl republishes via
    # rmtree+rename — unreadable probes there must never dead-letter
    out = str(tmp_path)
    _publish(out, [0])
    bad = os.path.join(out, "events", "round_00000", "part-0.parquet")
    with open(bad, "wb") as f:
        f.write(b"junk")
    c = EventsConsumer(out, name="c1", max_deliver=2)
    for _ in range(5):
        assert list(c.fetch()) == []
    assert c.dead_letters() == []
    _publish(out, [0])  # republished with a readable payload
    assert [r for r, _ in c.fetch()] == [0]


def test_probe_state_migrates_from_int_format(tmp_path):
    # a durable cursor written by the int-count probe format must not
    # crash a consumer running the [count, hwm] format (review r05)
    import json

    out = str(tmp_path)
    _publish(out, [0, 1])
    bad = os.path.join(out, "events", "round_00000", "part-0.parquet")
    with open(bad, "wb") as f:
        f.write(b"junk")
    state_dir = os.path.join(out, "consumers", "c1")
    os.makedirs(state_dir, exist_ok=True)
    with open(os.path.join(state_dir, "cursor.json"), "w") as f:
        json.dump({"acked": [], "deliveries": {}, "dead": [],
                   "probes": {"0": 1}}, f)
    c = EventsConsumer(out, name="c1", max_deliver=2)
    got = [r for r, _ in c.fetch(batch=5)]  # must not raise
    assert got == [1]
    assert c.dead_letters() == [0]  # migrated probe 1 + this epoch's = 2
