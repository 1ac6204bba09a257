"""Top-k / argmax selection.

O1/O2 in the reference: pick the single latest completed Race (Race
beats Qualifying, then latest end time) — pandas sort + iloc[0]
(``dags/open_f1_realtime.py:208-217``). Spark-first: orderBy + limit,
which Catalyst executes as TakeOrderedAndProject — a per-partition
top-k then a k-row driver merge, no global sort. Scales to any input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def top1_by_priority(df: DataFrame, order: list[Column]) -> DataFrame:
    """Global argmax under a composite ordering (deterministic if the
    ordering is total — include a unique tiebreak column)."""
    return df.orderBy(*order).limit(1)
