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
    from whichever physical type the parquet footer produced."""
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":  # TIMESTAMP(NANOS) via nanosAsLong: truncate to µs
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if dt == "timestamp_ntz":  # µs NTZ footer; UTC session tz => exact
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
