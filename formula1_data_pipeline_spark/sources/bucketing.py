"""Bucketed table layout — co-located joins without shuffles.

At 100 TB the dominant cost of the session-grain joins (laps ⋈
positions, detail ⋈ summary) is the hash-partition shuffle of both
sides. Bucketing pre-shuffles ONCE at write time: both tables stored
bucketed+sorted by the join key join with zero Exchange — the physical
plan reads buckets pairwise (verified by ``tests/test_bucketing.py``,
which asserts the joined plan contains no Exchange node).

This is the Spark-native equivalent of the clustering keys the
reference never declared on Snowflake (SURVEY §4 "Partitioning /
clustering: none — our choice").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.

    ``n_buckets`` sizes for the cluster: pick so each bucket holds
    ~128-512 MB at the target scale; all co-joining tables must share
    the bucket count and columns.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables — shuffle-free when both were
    written by ``write_bucketed`` with the same bucket spec on the
    join keys."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
