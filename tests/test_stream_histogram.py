"""Streaming quantile histogram (streaming/histogram.py): exact
convergence to the one-shot build for any micro-batch split
(distributive aggregate, bit-for-bit), running quantiles off the
landed state, replay idempotence, bounded state."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators import quality as Q
from formula1_data_pipeline_spark.scratch import scratch_dir
from formula1_data_pipeline_spark.streaming.histogram import (
    read_histogram_state,
    stream_quantile_histogram,
)


@pytest.fixture(scope="module")
def table_path(spark):
    rows = [(f"g{i % 3}", float((i * i) % 997) - 200.0)
            for i in range(3000)]
    path = str(scratch_dir(prefix="hist_corpus_")) + "/t"
    spark.createDataFrame(rows, "grp string, value double") \
        .write.parquet(path)
    return path


def _d(df):
    return {(r["grp"], r["cls"], r["msb"], r["sub"]): r["cnt"]
            for r in df.collect()}


def test_stream_equals_oneshot_any_split(spark, table_path):
    oneshot = _d(Q.quantile_histogram(
        spark.read.parquet(table_path), "value", ["grp"]))
    for n_files in (1, 4):
        got = _d(stream_quantile_histogram(
            spark, table_path, "value", ["grp"],
            n_source_files=n_files))
        assert got == oneshot, f"split {n_files} diverged"


def test_running_quantiles_match_batch(spark, table_path):
    state = stream_quantile_histogram(
        spark, table_path, "value", ["grp"], n_source_files=3)
    got = {r["grp"]: (r["p50_approx"], r["p95_approx"])
           for r in Q.histogram_quantiles(
               state, ["grp"], [0.5, 0.95]).collect()}
    exp = {r["grp"]: (r["p50_approx"], r["p95_approx"])
           for r in Q.histogram_quantiles(
               Q.quantile_histogram(
                   spark.read.parquet(table_path), "value", ["grp"]),
               ["grp"], [0.5, 0.95]).collect()}
    assert got == exp and len(got) == 3


def test_replay_idempotent_and_bounded(spark, table_path):
    import shutil

    work = str(scratch_dir(prefix="hist_replay_"))
    first = _d(stream_quantile_histogram(
        spark, table_path, "value", ["grp"], n_source_files=2,
        work_dir=work))
    shutil.rmtree(work + "/ckpt")  # crash case: full re-delivery
    replay = _d(stream_quantile_histogram(
        spark, table_path, "value", ["grp"], n_source_files=2,
        work_dir=work))
    assert replay == first
    assert replay == _d(read_histogram_state(
        spark, work + "/hist", ["grp"]))
    # bounded: 3 groups x (2 * 63 * 8 + 1) worst case
    assert len(first) <= 3 * (2 * 63 * 8 + 1)


def test_changed_table_raises(spark, table_path):
    work = str(scratch_dir(prefix="hist_grow_"))
    stream_quantile_histogram(spark, table_path, "value", ["grp"],
                              n_source_files=2, work_dir=work)
    grown = str(scratch_dir(prefix="hist_grown_")) + "/t"
    t = spark.read.parquet(table_path)
    t.unionByName(t.limit(10)).write.parquet(grown)
    with pytest.raises(ValueError, match="FIXED snapshot"):
        stream_quantile_histogram(spark, grown, "value", ["grp"],
                                  n_source_files=2, work_dir=work)


def test_same_cardinality_drift_raises(spark, table_path):
    """Round-10 ADVICE regression: same row count, different values
    must raise — the count-only guard silently replayed old state."""
    work = str(scratch_dir(prefix="hist_drift_"))
    stream_quantile_histogram(spark, table_path, "value", ["grp"],
                              n_source_files=2, work_dir=work)
    drifted = str(scratch_dir(prefix="hist_drifted_")) + "/t"
    t = spark.read.parquet(table_path)
    t.withColumn("value", F.col("value") + 1).write.parquet(drifted)
    with pytest.raises(ValueError, match="FIXED snapshot"):
        stream_quantile_histogram(spark, drifted, "value", ["grp"],
                                  n_source_files=2, work_dir=work)
