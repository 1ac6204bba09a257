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

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_parquet_maybe_nanos(spark, path: str) -> DataFrame:
    """Batch-read parquet whose timestamp footer may be
    TIMESTAMP(NANOS) (older testdata generations) — Spark's reader
    rejects those unless ``spark.sql.legacy.parquet.nanosAsLong`` is
    set. ``session.get_spark`` sets that conf at session BUILD; for an
    externally-supplied session (the driver's) the fallback here sets
    it once, loudly, only after the plain read actually failed on a
    nanos footer — a library must not silently mutate session-global
    conf on every read (round-8 verdict item; same pattern as
    ``normalize_event_ts``'s warned UTC pin below). µs-footer
    generations (the current one) read directly and never touch conf.
    """
    try:
        return spark.read.parquet(path)
    except Exception as e:  # AnalysisException: Illegal Parquet type
        # match the specific rejection ("Illegal Parquet type: INT64
        # (TIMESTAMP(NANOS,...))"), not any message that happens to
        # contain "nanos" (e.g. a path in a not-found error) — a loose
        # match would mutate session conf on unrelated failures
        if "timestamp(nanos" not in str(e).lower():
            raise
        warnings.warn(
            f"{path}: TIMESTAMP(NANOS) footer; setting "
            "spark.sql.legacy.parquet.nanosAsLong=true on the supplied "
            "session (persists for the session's lifetime; "
            "session.get_spark sets it at build time)",
            stacklevel=3,
        )
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


def footer_has_nanos(path: str) -> bool:
    """True when the parquet footer carries a TIMESTAMP(NANOS) column
    — read via pyarrow (no Spark job, no session conf dependence).
    Used by the streaming scaffold to decide, per FILE rather than per
    session, whether a supplied session needs the nanosAsLong conf:
    a session-state probe would go stale across sessions sharing the
    process-global schema cache."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return any(
            pa.types.is_timestamp(f.type) and f.type.unit == "ns"
            for f in schema
        )
    except Exception:
        return False  # unreadable/odd footer: let Spark's reader decide


def ensure_nanos_conf(spark) -> None:
    """Idempotently set nanosAsLong on ``spark`` for a known
    TIMESTAMP(NANOS) input, with the same loud warning as the read
    fallback (only when actually changing the session)."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    if spark.conf.get(key, None) != "true":
        warnings.warn(
            "TIMESTAMP(NANOS) parquet footer; setting "
            f"{key}=true on the supplied session (persists for the "
            "session's lifetime; session.get_spark sets it at build "
            "time)",
            stacklevel=3,
        )
        spark.conf.set(key, "true")


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce ``col`` to µs-precision TIMESTAMP (LTZ, session tz = UTC)
    from whichever physical type the parquet footer produced.

    The NTZ→LTZ cast is only value-exact under a UTC session timezone,
    so pin it here rather than trusting every caller's session config.
    """
    spark = df.sparkSession
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        # The NTZ→LTZ cast below is only value-exact under UTC, and the
        # cast executes lazily (long after this function returns), so a
        # scoped save/restore would silently un-pin it before execution.
        # Mutate, but loudly: callers who care about their session tz
        # should pin it themselves (session.py does).
        warnings.warn(
            "normalize_event_ts: pinning spark.sql.session.timeZone=UTC "
            "on the supplied session (required for value-exact NTZ->LTZ "
            "event-time casts); this persists for the session's lifetime.",
            stacklevel=2,
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":  # TIMESTAMP(NANOS) via nanosAsLong: floor to µs
        # Floor-division in *integer* math: 2024-epoch nanos (~1.7e18)
        # exceed double's 2^53 exact range, so F.floor(col / 1000) (which
        # promotes to double) mis-rounds ~12% of non-µs-aligned values.
        # `x - pmod(x, 1000)` is floor-aligned for negatives too
        # (pmod(-1, 1000) = 999), matching the oracle's ns→µs floor.
        return df.withColumn(
            col,
            F.timestamp_micros(
                F.expr(f"(`{col}` - pmod(`{col}`, 1000)) DIV 1000")
            ),
        )
    if dt == "timestamp_ntz":  # µs NTZ footer; UTC session tz => exact
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
