"""Executable object-store contract (round-13 verdict item #5).

``sources/stores.py`` documents how every local-FS atomicity
primitive maps onto conditional writes of small objects; this suite
EXECUTES that mapping on the in-memory generation store —
``ObjectStoreLease``/``ObjectStoreMarker`` over
``GenerationConditionalStore`` — replaying the exact scenarios the
local-FS lease suite pins (tests/test_aggmart.py: contended acquire,
release-after-steal no-op, heartbeat-prevents-steal) plus the racing
two-stealer case the local protocol only bounds probabilistically.
No network, no bucket: the point is proving the documented mapping is
implementable semantics-for-semantics, so a production adapter is a
transcription job, not a design job.
"""

from __future__ import annotations

import json
import threading

from formula1_data_pipeline_spark.sources.stores import (
    GenerationConditionalStore,
    ObjectStoreLease,
    ObjectStoreMarker,
)


class _Clock:
    """Manual clock so leases expire without sleeping."""

    def __init__(self) -> None:
        self.now = 1000.0

    def __call__(self) -> float:
        return self.now


def _lease(lease_sec=60.0):
    clock = _Clock()
    store = GenerationConditionalStore(clock=clock)
    return ObjectStoreLease(store, "bucket/mart/_compact_lease",
                            lease_sec=lease_sec), store, clock


def test_acquire_then_contended_acquire_returns_none():
    lease, _, _ = _lease()
    tok = lease.acquire()
    assert tok is not None
    assert lease.acquire() is None  # fresh holder -> contended


def test_release_frees_the_lease_for_the_next_acquirer():
    lease, store, _ = _lease()
    tok = lease.acquire()
    assert lease.release(tok)
    assert store.get(lease.key) is None
    assert lease.acquire() is not None


def test_stale_lease_is_stolen_and_evicted_release_noops():
    """The round-12 verdict scenario: a crashed (expired) holder's
    lease is stolen; the evicted holder's late release must NOT free
    the stealer's lease — the generation check replays the local
    nonce-file verification."""
    lease, store, clock = _lease(lease_sec=60.0)
    crashed = lease.acquire()
    clock.now += 61.0  # TTL passes, no heartbeat (holder "crashed")
    stealer = lease.acquire()
    assert stealer is not None
    assert stealer["nonce"] != crashed["nonce"]
    # the evicted holder wakes up and releases: generation mismatch
    assert not lease.release(crashed)
    live = store.get_with_generation(lease.key)
    assert live is not None and live[1] == stealer["generation"]
    # and its heartbeat is equally dead
    assert not lease.heartbeat(crashed)


def test_heartbeat_refreshes_ttl_and_prevents_steal():
    """A LIVE holder beating the TTL is never stolen however long it
    holds — the mtime-heartbeat mapping."""
    lease, _, clock = _lease(lease_sec=60.0)
    tok = lease.acquire()
    for _ in range(5):
        clock.now += 50.0       # inside the TTL each time
        assert lease.heartbeat(tok)
        assert lease.acquire() is None  # always contended
    # heartbeat stops (process died); TTL passes; steal succeeds
    clock.now += 61.0
    assert lease.acquire() is not None


def test_racing_stealers_exactly_one_wins():
    """Two stealers observe the same expired lease; the generation-
    matched delete admits exactly one — the window the local mkdir
    protocol only bounds probabilistically closes outright here."""
    lease, _, clock = _lease(lease_sec=60.0)
    lease.acquire()
    clock.now += 61.0
    results = []
    barrier = threading.Barrier(8)

    def steal():
        barrier.wait()
        results.append(lease.acquire())

    threads = [threading.Thread(target=steal) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [r for r in results if r is not None]
    assert len(winners) == 1


def test_heartbeat_advances_generation_so_release_tracks_it():
    lease, store, clock = _lease()
    tok = lease.acquire()
    g0 = tok["generation"]
    clock.now += 1.0
    assert lease.heartbeat(tok)
    assert tok["generation"] > g0
    assert lease.release(tok)  # releases via the REFRESHED generation
    assert store.get(lease.key) is None


def test_marker_write_read_clear_roundtrip():
    """Contract primitive #3: the pending-late marker as plain
    PUT/GET/DELETE of one small object — body never torn (whole-
    object swap), clear idempotent."""
    store = GenerationConditionalStore()
    marker = ObjectStoreMarker(store, "bucket/mart/_pending_late.json")
    assert marker.read() is None
    payload = {"superseded_version": 7, "known_attempts": ["a", "b"]}
    marker.write(payload)
    assert marker.read() == payload
    # single-writer overwrite (lease-serialized in the protocol)
    marker.write({"superseded_version": 8, "known_attempts": []})
    assert marker.read()["superseded_version"] == 8
    marker.clear()
    assert marker.read() is None
    marker.clear()  # idempotent


def test_generation_store_put_if_absent_is_the_manifest_primitive():
    """The same emulated store backs contract primitive #1: its
    ConditionalPutStore face gives first-writer-wins manifest
    publishes, so ONE store implementation covers the whole
    contract."""
    store = GenerationConditionalStore()
    assert store.put_if_absent(None, "b/t/_txn/v1.json", b'{"v":1}')
    assert not store.put_if_absent(None, "b/t/_txn/v1.json", b"{}")
    assert store.get("b/t/_txn/v1.json") == b'{"v":1}'
    body = json.loads(store.get("b/t/_txn/v1.json"))
    assert body == {"v": 1}
