"""Window helpers Spark lacks natively.

W7 in the reference: ``count(distinct driver_number) over (partition by
meeting_key, session_key)`` (``dbt/models/intermediate/
int_driver_lap_features.sql:59-62``). Spark rejects
``countDistinct().over(w)``; the deliberate rewrite is
``size(collect_set(col).over(w))`` — exact, and memory-bounded by the
number of distinct values per partition (~20 drivers here, safe).

For unbounded-cardinality columns at 100 TB, use the pre-aggregate +
join form instead (``count_distinct_via_join``): groupBy the partition
keys with countDistinct, then broadcast-join back — two shuffles but no
per-row set state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, WindowSpec
from pyspark.sql import functions as F


def count_distinct_over(col: str | Column, w: WindowSpec) -> Column:
    """COUNT(DISTINCT col) OVER w — exact; per-partition set must fit
    in memory (fine for low-cardinality columns like driver numbers)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.collect_set(c).over(w))


def count_distinct_via_join(
    df: DataFrame, partition_keys: list[str], col: str, alias: str
) -> DataFrame:
    """Scale-safe twin: pre-aggregate + broadcast join back."""
    agg = (
        df.groupBy(*partition_keys)
        .agg(F.countDistinct(col).alias(alias))
    )
    return df.join(F.broadcast(agg), partition_keys, "left")
