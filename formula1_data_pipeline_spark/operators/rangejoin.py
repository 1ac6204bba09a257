"""Range join — points matched to covering time intervals, bin-bucketed.

Spark turns a join whose condition is only inequalities-plus-equi-keys
into a sort-merge/broadcast join on the equi keys with the range
predicate as a post-join filter: every point pairs with every interval
of its key before filtering — quadratic per key, the classic range-join
blowup (same failure mode as the naive as-of join, SURVEY.md §4.2).

The scale idiom is **bin bucketing** (what Databricks' range-join hint
and KDB's window joins do under the hood): quantize time into
fixed-width bins, explode each interval to the bins it overlaps, map
each point to its single bin, equi-join on (keys..., bin), then apply
the exact range predicate. Each qualifying pair meets in exactly one
bin — the point's — so no post-join dedup is needed. Join fan-out is
bounded by interval_width/bin_width per interval instead of
points×intervals per key.

Bin width tuning: ~the typical interval length. Too small => interval
replication explodes; too large => each bin degenerates toward the
naive per-key join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__rj_bin"


def _bin_of(ts: Column, bin_seconds: int) -> Column:
    return F.floor(F.unix_micros(ts) / F.lit(bin_seconds * 1_000_000))


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start: str,
    end: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner join: every (point, interval) pair with matching ``on``
    keys and ``start <= point_ts <= end`` (inclusive bounds). Output
    carries all columns of both inputs; rows with NULL timestamps or
    bounds drop out (the range predicate is NULL for them)."""
    p = points.withColumn(_BIN, _bin_of(F.col(point_ts), bin_seconds))
    iv = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                _bin_of(F.col(start), bin_seconds),
                _bin_of(F.col(end), bin_seconds),
            )
        ),
    )
    return (
        p.join(iv, [*on, _BIN])
        .filter(
            (F.col(point_ts) >= F.col(start))
            & (F.col(point_ts) <= F.col(end))
        )
        .drop(_BIN)
    )
