"""Durable at-least-once events consumer — the Ray-native analog of the
reference's NATS durable pull consumer (``examples/nats_consumer.go:85-101``:
durable name, pull subscription, ``MaxDeliver=3``, ``AckWait``).

The crawl publishes events per ROUND, gated on store success (the
rounds-dir rename commits before the events dir appears —
pipelines/crawl.py), so a round directory's existence is the publish
signal and the round is the natural delivery unit:

- **durable**: a named cursor persists under ``<out>/consumers/<name>/``
  (atomic tmp+rename JSON), so a restarted consumer resumes exactly
  where it acked — the NATS durable-subscription analog.
- **pull**: :meth:`fetch` returns the next unacked complete rounds'
  event tables, in round order (the ``sub.Fetch(batch)`` analog).
- **at-least-once / AckWait**: a fetched round stays pending until
  :meth:`ack`; an unacked round is REDELIVERED by the next fetch (the
  ack-wait-expiry analog — pull consumers re-see unacked messages).
- **MaxDeliver / dead-letter**: each delivery bumps a persisted
  per-round counter; a round fetched ``max_deliver`` times without an
  ack is dead-lettered — recorded in the cursor state and skipped — so
  a poison round can't wedge the consumer (``MaxDeliver(3)`` analog).

State mutations persist BEFORE data is handed to the caller, so a
consumer crash mid-processing re-delivers (at-least-once, never
at-most-once).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pyarrow as pa
import pyarrow.dataset as pads


class EventsConsumer:
    def __init__(self, out_dir: str, name: str = "default",
                 max_deliver: int = 3):
        if max_deliver < 1:
            raise ValueError("max_deliver must be >= 1")
        self.events_dir = os.path.join(out_dir, "events")
        self.state_dir = os.path.join(out_dir, "consumers", name)
        self.state_path = os.path.join(self.state_dir, "cursor.json")
        self.max_deliver = max_deliver
        os.makedirs(self.state_dir, exist_ok=True)
        if os.path.exists(self.state_path):
            with open(self.state_path) as f:
                self._state = json.load(f)
        else:
            self._state = {"acked": [], "deliveries": {}, "dead": []}

    # -- durable cursor ----------------------------------------------------
    def _persist(self) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._state, f)
        os.replace(tmp, self.state_path)

    def _published_rounds(self) -> list[int]:
        if not os.path.isdir(self.events_dir):
            return []
        out = []
        for d in os.listdir(self.events_dir):
            if d.startswith("round_") and not d.endswith(".tmp"):
                out.append(int(d.split("_")[1]))
        return sorted(out)

    # -- pull --------------------------------------------------------------
    def pending(self) -> list[int]:
        """Published rounds neither acked nor dead-lettered, in order."""
        done = set(self._state["acked"]) | set(self._state["dead"])
        return [r for r in self._published_rounds() if r not in done]

    def fetch(self, batch: int = 1) -> Iterator[tuple[int, pa.Table]]:
        """Yield up to ``batch`` (round, events table) pairs.  The
        delivery counter persists after a SUCCESSFUL read but BEFORE the
        table is yielded: a crash while processing leaves the round
        unacked so it redelivers, while a read that fails transiently —
        a resumed crawl REPUBLISHES replayed rounds via rmtree+rename,
        so a round dir can vanish for an instant — burns no delivery
        (only real processing attempts count toward MaxDeliver)."""
        n = 0
        for r in self.pending():
            if n >= batch:
                break
            key = str(r)
            count = self._state["deliveries"].get(key, 0) + 1
            if count > self.max_deliver:
                self._state["dead"].append(r)
                self._persist()
                continue
            d = os.path.join(self.events_dir, f"round_{r:05d}")
            try:
                t = pads.dataset(d, format="parquet").to_table()
            except (FileNotFoundError, OSError, pa.ArrowInvalid):
                # republish window — normally visible again next pull.
                # But a round that stays unreadable PERMANENTLY (corrupt
                # payload, or vanished under retention cleanup) would
                # re-probe forever: probes burn no delivery and the
                # round can never be acked.  A probe counts only when a
                # higher round is published AND the publish high-water
                # mark ADVANCED since this round's previous probe — a
                # transient rmtree+rename race during a resume replay
                # can thus burn at most ONE probe per publish epoch,
                # while a round still unreadable after max_deliver NEW
                # rounds were published is dead-lettered (ADVICE r04).
                published = self._published_rounds()
                hwm = max(published) if published else -1
                if hwm > r:
                    probes = self._state.setdefault("probes", {})
                    count_hwm = probes.get(key, [0, -1])
                    if isinstance(count_hwm, int):
                        # cursor written by the int-count format: treat
                        # the old count as one pre-migration epoch
                        count_hwm = [count_hwm, -1]
                    if hwm > count_hwm[1]:
                        count_hwm = [count_hwm[0] + 1, hwm]
                        probes[key] = count_hwm
                        if count_hwm[0] >= self.max_deliver:
                            self._state["dead"].append(r)
                            probes.pop(key, None)
                        self._persist()
                continue
            self._state["deliveries"][key] = count
            self._state.setdefault("probes", {}).pop(key, None)
            self._persist()
            yield r, t
            n += 1

    # -- ack ---------------------------------------------------------------
    def ack(self, round_no: int) -> None:
        if round_no not in self._state["acked"]:
            self._state["acked"].append(round_no)
            self._state["deliveries"].pop(str(round_no), None)
            self._persist()

    def dead_letters(self) -> list[int]:
        return list(self._state["dead"])
