"""Bucketed-join layout: asserts the co-located join plans WITHOUT a
shuffle — the physical evidence for SCALE.md's storage-layout claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula1_data_pipeline_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark):
    laps = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("session_key"),
        F.col("id").alias("lap_id"),
        (F.col("id") * 1.5).alias("lap_time"),
    )
    pos = spark.range(0, 2000).select(
        (F.col("id") % 50).alias("session_key"),
        (F.col("id") % 20).alias("race_position"),
    )
    write_bucketed(laps, "b_laps", ["session_key"], n_buckets=8)
    write_bucketed(pos, "b_pos", ["session_key"], n_buckets=8)

    # disable broadcast so the co-located sort-merge path is what's
    # being tested, not a broadcast fallback
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_laps", "b_pos", ["session_key"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result is actually correct
        expected = laps.join(pos, "session_key").count()
        assert joined.count() == expected > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_laps")
        spark.sql("DROP TABLE IF EXISTS b_pos")
