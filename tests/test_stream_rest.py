"""Streaming REST ingest leg (streaming/rest.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula1_data_pipeline_spark.sources.openf1 import RecordedClient
from formula1_data_pipeline_spark.streaming import (
    RateLimitedClient,
    batch_rest_ingest,
    stream_rest_ingest,
)


class _FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def clock(self):
        return self.t

    def sleep(self, s):
        self.sleeps.append(s)
        self.t += s


def test_rate_limited_client_paces_fetches():
    """Consecutive fetches are spaced >= min_interval apart, enforced
    by sleeping exactly the deficit; instantaneous fetches never
    accumulate burst credit."""
    fc = _FakeClock()
    client = RateLimitedClient(
        RecordedClient({"laps": [{"a": 1}]}),
        min_interval_sec=2.0, clock=fc.clock, sleep=fc.sleep,
    )
    client.fetch("laps")          # t=0, no wait
    client.fetch("laps")          # must sleep 2.0
    fc.t += 0.5                   # half a second passes naturally
    client.fetch("laps")          # must sleep the remaining 1.5
    assert fc.sleeps == [2.0, 1.5]


def test_rate_limited_client_no_pacing_when_zero():
    fc = _FakeClock()
    client = RateLimitedClient(
        RecordedClient({"laps": []}), min_interval_sec=0.0,
        clock=fc.clock, sleep=fc.sleep,
    )
    for _ in range(5):
        client.fetch("laps")
    assert fc.sleeps == []


def _recordings(skey: int, n_polls: int) -> dict:
    recs = {}
    for p in range(n_polls):
        recs[f"laps?poll={p}&session_key={skey}"] = [
            {"driver_number": j, "v": f"{j}@{p}"}
            for j in range(1, 9)
            if (j + p) % 3 != 0
        ]
    return recs


def test_stream_converges_to_batch_state(spark):
    """The streaming poller's landed table equals the batch
    fetch-all-then-merge state — micro-batching and per-poll commits
    must not change the converged result (the reference's idempotent
    delete+reload contract)."""
    skey = 7
    client = RecordedClient(_recordings(skey, 3))

    def canon(df):
        return sorted(
            (r["driver_number"], r["poll"], r["v"])
            for r in df.select("driver_number", "poll", "v").collect()
        )

    streamed = stream_rest_ingest(
        spark, RateLimitedClient(client), endpoint="laps",
        session_key=skey, n_polls=3, keys=["driver_number"],
    )
    batch = batch_rest_ingest(
        spark, client, endpoint="laps", session_key=skey,
        polls=range(3), keys=["driver_number"],
    )
    assert canon(streamed) == canon(batch)
    # and the landed value per key is genuinely the LAST poll's
    got = {r["driver_number"]: r["v"]
           for r in streamed.select("driver_number", "v").collect()}
    for j in range(1, 9):
        last = max(p for p in range(3) if (j + p) % 3 != 0)
        assert got[str(j)] == f"{j}@{last}"


def test_empty_polls_are_skipped(spark):
    """A poll returning no records takes the S3 empty short-circuit —
    no landing write, no crash; other polls still land."""
    skey = 7
    recs = {f"laps?poll=1&session_key={skey}": [
        {"driver_number": 1, "v": "x"}]}
    landed = stream_rest_ingest(
        spark, RecordedClient(recs), endpoint="laps",
        session_key=skey, n_polls=3, keys=["driver_number"],
    )
    rows = landed.collect()
    assert len(rows) == 1 and rows[0]["poll"] == "1"


def test_rate_limited_client_thread_safe_shared_budget():
    """Concurrent callers each reserve a distinct slot — the shared
    budget never grants two fetches the same interval (the pacing
    state is mutated under a lock; pre-fix both threads could observe
    the same free slot and burst)."""
    import threading

    sleeps: list[float] = []
    client = RateLimitedClient(
        RecordedClient({"laps": [{"a": 1}]}),
        min_interval_sec=1.0,
        clock=lambda: 0.0,          # frozen clock: slots, not wall time
        sleep=sleeps.append,
    )
    threads = [threading.Thread(target=client.fetch, args=("laps",))
               for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # 4 fetches from t=0: slots 0,1,2,3 -> three sleepers, distinct
    assert sorted(sleeps) == [1.0, 2.0, 3.0]
    assert client._next_allowed == 4.0
