"""Event-time normalization for the ``events`` table.

The driver-generated ``events.parquet`` has shipped with two different
physical encodings for ``ts`` across testdata generations:

- ``TIMESTAMP(NANOS)`` — Spark's parquet reader rejects it outright;
  with ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as a
  ``bigint`` of epoch nanoseconds.
- ``TIMESTAMP(MICROS, isAdjustedToUTC=false)`` — arrives as
  ``timestamp_ntz``, which Spark's event-time machinery (watermarks,
  ``F.window``) refuses (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).

Either way the oracle side sees a µs-precision naive timestamp
(DuckDB ``CAST(ts AS TIMESTAMP)``), and the session timezone is pinned
to UTC (session.py), so converting to a plain ``timestamp`` (LTZ) is
value-exact in both cases. Every consumer — batch ``queries.load`` and
all Structured Streaming legs — funnels through this one helper so a
future encoding change is a one-line fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce ``col`` to µs-precision TIMESTAMP (LTZ, session tz = UTC)
    from whichever physical type the parquet footer produced.

    The NTZ→LTZ cast is only value-exact under a UTC session timezone,
    so pin it here rather than trusting every caller's session config.
    """
    spark = df.sparkSession
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":  # TIMESTAMP(NANOS) via nanosAsLong: floor to µs
        # floor (not DIV) so pre-epoch nanos truncate the same way the
        # oracle's ns→µs conversion does; column API avoids SQL-name
        # interpolation for columns that would need backticks.
        return df.withColumn(
            col, F.timestamp_micros(F.floor(F.col(col) / F.lit(1000)).cast("long"))
        )
    if dt == "timestamp_ntz":  # µs NTZ footer; UTC session tz => exact
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
