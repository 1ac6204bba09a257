"""Scoped shuffle-partition override for bounded streaming replays.

A stateful streaming stage creates one state-store instance (and one
Arrow/Python worker exchange, one commit file per micro-batch) per
shuffle partition — fixed per-partition overhead that dominates a
bounded AvailableNow replay on small backlogs: q35 measured 7.7 s at
32 partitions vs 2.9 s at 8 on sf0.1. On a real cluster the right
number scales with key cardinality and executor count (state must
shard wide enough to spread across the fleet), so the override is a
parameter, defaulting to a small value only for these local bounded
replays. The previous session value is always restored — the conf is
read at stream *planning* time, so restoring after awaitTermination
can't affect the finished query.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int | None):
    if n is None:
        yield
        return
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
