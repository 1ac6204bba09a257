"""Priority dedup — keep one row per key, best-first ordering.

The reference's universal dedup idiom: ``row_number() over (partition
by <grain> order by <priority desc, recency desc>) ... where rn = 1``
(reference ``dbt/models/intermediate/int_openf1_laps_all.sql:55-63``,
``stg_openf1_laps_realtime.sql:5-25``).

Scale notes (100 TB): row_number-over-window shuffles once on the
partition keys and sorts within partitions — the same single shuffle a
groupBy would need, but preserving whole rows without an expensive
struct max_by. AQE splits skewed key groups. When the grain equals a
previous shuffle's keys, Catalyst reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_by_priority(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
) -> DataFrame:
    """Keep the first row per ``keys`` under ``order`` (e.g. realtime
    beats historical, then newest wins)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
