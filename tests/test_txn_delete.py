"""Targeted delete (sources/txn.py::txn_delete_keys): stats-pruned
segment rewrite — only intersecting segments rewritten, the rest
carried by reference; correctness vs the plain anti-join; time
travel preserved; fail-open without stats."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.scratch import scratch_dir
from formula1_data_pipeline_spark.sources import txn


def _mk_table(spark, with_stats=True):
    path = str(scratch_dir(prefix="txn_del_")) + "/t"
    rows = spark.createDataFrame(
        [(i, f"v{i}", i % 7) for i in range(300)],
        "k long, payload string, grp int",
    )
    sc = ["k"] if with_stats else None
    txn.txn_append(spark, rows.filter(F.col("k") < 100), path,
                   stats_cols=sc, compact_threshold=None)
    txn.txn_append(spark, rows.filter((F.col("k") >= 100)
                                      & (F.col("k") < 200)), path,
                   compact_threshold=None)
    txn.txn_append(spark, rows.filter(F.col("k") >= 200), path,
                   compact_threshold=None)
    return path, rows


def _dirs(spark, path, version=None):
    v = version if version is not None else txn.current_version(
        spark, path)
    return [s["dir"] for s in
            txn._read_manifest(spark, path, v)["segments"]]


def test_delete_rewrites_only_intersecting_segments(spark):
    path, rows = _mk_table(spark)
    before = _dirs(spark, path)
    keys = spark.createDataFrame([(k,) for k in (110, 150, 199)],
                                 "k long")
    v = txn.txn_delete_keys(spark, keys, path, "k")
    after = _dirs(spark, path, v)
    # segments 1 and 3 carried BY REFERENCE (same data dirs)
    assert before[0] in after and before[2] in after
    assert before[1] not in after
    got = {r["k"] for r in txn.read_table(spark, path).collect()}
    assert got == set(range(300)) - {110, 150, 199}
    # time travel: the pre-delete version still shows every row
    old = txn.read_table(spark, path, version=v - 1)
    assert old.count() == 300


def test_noop_delete_publishes_and_carries_everything(spark):
    path, _ = _mk_table(spark)
    before = _dirs(spark, path)
    v0 = txn.current_version(spark, path)
    keys = spark.createDataFrame([(10_000,), (20_000,)], "k long")
    v = txn.txn_delete_keys(spark, keys, path, "k")
    assert v == v0 + 1
    assert _dirs(spark, path, v) == before
    assert txn.read_table(spark, path).count() == 300


def test_fail_open_without_stats_still_exact(spark):
    path, _ = _mk_table(spark, with_stats=False)
    keys = spark.createDataFrame([(5,), (250,)], "k long")
    v = txn.txn_delete_keys(spark, keys, path, "k")
    got = {r["k"] for r in txn.read_table(spark, path).collect()}
    assert got == set(range(300)) - {5, 250}
    # without stats every segment is conservatively rewritten: no old
    # data dir may survive into the new manifest (the earlier `< 4`
    # form was vacuously true — review finding)
    before = set(_dirs(spark, path, v - 1))
    after = set(_dirs(spark, path, v))
    assert after.isdisjoint(before), (before, after)


def test_plain_table_raises(spark):
    path = str(scratch_dir(prefix="txn_del_plain_")) + "/t"
    spark.createDataFrame([(1,)], "k long").write.parquet(path)
    keys = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="manifest"):
        txn.txn_delete_keys(spark, keys, path, "k")


def test_keys_frame_validation(spark):
    path, _ = _mk_table(spark)
    bad = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="single-column"):
        txn.txn_delete_keys(spark, bad, path, "k")
    # a multi-column frame containing key_col works
    ok = spark.createDataFrame([(7, "x")], "k long, extra string")
    txn.txn_delete_keys(spark, ok, path, "k")
    assert txn.read_table(spark, path).filter(
        F.col("k") == 7).count() == 0


def test_delete_on_keyed_partitioned_table(spark):
    path = str(scratch_dir(prefix="txn_del_keyed_")) + "/t"
    rows = spark.createDataFrame(
        [(i, f"g{i % 3}", f"v{i}") for i in range(90)],
        "k long, grp string, payload string",
    )
    txn.txn_append(spark, rows.filter(F.col("k") < 45), path,
                   key="grp", stats_cols=["k"],
                   compact_threshold=None)
    txn.txn_append(spark, rows.filter(F.col("k") >= 45), path,
                   key="grp", compact_threshold=None)
    keys = spark.createDataFrame([(1,), (50,)], "k long")
    txn.txn_delete_keys(spark, keys, path, "k")
    out = txn.read_table(spark, path)
    assert {r["k"] for r in out.collect()} == set(range(90)) - {1, 50}
    # partition column survives the rewrite
    assert out.filter(F.col("grp") == "g0").count() > 0


def test_full_delete_of_keyed_table_stays_readable(spark):
    """Review regression: emptying a keyed table used to publish a
    zero-segment manifest every reader crashes on; it must publish an
    unkeyed zero-row snapshot with the schema intact."""
    path = str(scratch_dir(prefix="txn_del_all_")) + "/t"
    rows = spark.createDataFrame(
        [(i, f"g{i % 2}", f"v{i}") for i in range(20)],
        "k long, grp string, payload string",
    )
    txn.txn_append(spark, rows, path, key="grp", stats_cols=["k"],
                   compact_threshold=None)
    keys = rows.select("k")
    v = txn.txn_delete_keys(spark, keys, path, "k")
    out = txn.read_table(spark, path)
    assert out.count() == 0
    assert {"k", "grp", "payload"} <= set(out.columns)
    # and the pre-delete version still time-travels
    assert txn.read_table(spark, path, version=v - 1).count() == 20


def test_null_keys_neither_rewrite_nor_delete(spark):
    """Review regression: a NULL row in the opt-out frame used to
    fail-open against every segment range (full-table rewrite) while
    the anti-join deleted nothing for it — NULL keys are dropped at
    the edge, so segment triage stays local."""
    path, _ = _mk_table(spark)
    before = _dirs(spark, path)
    keys = spark.createDataFrame([(110,), (None,)], "k long")
    v = txn.txn_delete_keys(spark, keys, path, "k")
    after = _dirs(spark, path, v)
    # only the middle segment (containing 110) rewrites
    assert before[0] in after and before[2] in after
    assert before[1] not in after
    got = {r["k"] for r in txn.read_table(spark, path).collect()}
    assert got == set(range(300)) - {110}
