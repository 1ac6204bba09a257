"""normalize_event_ts precision tests.

The nanosAsLong branch must floor epoch-ns to epoch-µs in *integer*
math: 2024-epoch nanos (~1.7e18) exceed double's 2^53 exact range, so
any double-promoting expression (e.g. F.floor(col / 1000)) mis-rounds
non-µs-aligned values. Regression for the round-3 ADVICE finding.
"""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from formula1_data_pipeline_spark.functions.timestamps import (
    normalize_event_ts,
)

UTC = dt.timezone.utc


def _ns_df(spark, values):
    return spark.createDataFrame(
        [(v,) for v in values], T.StructType([T.StructField("ts", T.LongType())])
    )


def test_ns_floor_is_exact_beyond_double_range(spark):
    # 1723500000000000999 ns -> double math yields ...001 µs; integer
    # floor must yield exactly ...000 µs.
    ns = 1_723_500_000_000_000_999
    out = normalize_event_ts(_ns_df(spark, [ns])).first()["ts"]
    assert out == dt.datetime.fromtimestamp(1_723_500_000.0, UTC).replace(
        tzinfo=None
    )
    # Check the exact µs integer via unix_micros to avoid tz ambiguity.
    micros = (
        normalize_event_ts(_ns_df(spark, [ns]))
        .select(F.unix_micros("ts").alias("us"))
        .first()["us"]
    )
    assert micros == 1_723_500_000_000_000


def test_ns_floor_sweep_matches_python_floordiv(spark):
    base = 1_723_500_000_000_000_000
    vals = [base + d for d in (-1, 0, 1, 499, 500, 501, 999, 1000, 1001)]
    vals += [-1, -999, -1000, -1001, 0, 999]
    rows = (
        normalize_event_ts(_ns_df(spark, vals))
        .select(F.unix_micros("ts").alias("us"))
        .collect()
    )
    got = [r["us"] for r in rows]
    assert got == [v // 1000 for v in vals]


def test_backticked_column_name(spark):
    # Column names needing backticks must not break the SQL expression.
    df = spark.createDataFrame(
        [(1_723_500_000_000_000_999,)],
        T.StructType([T.StructField("event ts", T.LongType())]),
    )
    out = normalize_event_ts(df, col="event ts")
    assert (
        out.select(F.unix_micros(F.col("`event ts`")).alias("us")).first()["us"]
        == 1_723_500_000_000_000
    )


def test_read_parquet_maybe_nanos_fallback(spark, tmp_path):
    """Round-9 conf-hygiene fix: a µs footer reads without touching
    session conf; a TIMESTAMP(NANOS) footer triggers the loud one-time
    nanosAsLong fallback and then reads as epoch-ns longs that
    normalize_event_ts floors to µs."""
    import warnings

    import pyarrow as pa
    import pyarrow.parquet as pq

    from formula1_data_pipeline_spark.functions.timestamps import (
        read_parquet_maybe_nanos,
    )

    key = "spark.sql.legacy.parquet.nanosAsLong"
    old = spark.conf.get(key, None)
    ns_val = 1_723_500_000_000_000_999
    try:
        # µs footer: plain read, conf untouched even when unset
        spark.conf.unset(key)
        us = tmp_path / "us.parquet"
        pq.write_table(pa.table({
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([ns_val // 1000], pa.timestamp("us")),
        }), us)
        df = read_parquet_maybe_nanos(spark, str(us))
        assert dict(df.dtypes)["ts"] in ("timestamp_ntz", "timestamp")
        assert df.count() == 1
        assert spark.conf.get(key, None) in (None, "false")

        # NANOS footer: plain read fails -> warned fallback sets the
        # conf once and the column arrives as epoch-ns bigint
        nsp = tmp_path / "ns.parquet"
        pq.write_table(pa.table({
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([ns_val], pa.timestamp("ns")),
        }), nsp)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            df2 = read_parquet_maybe_nanos(spark, str(nsp))
            rows = df2.collect()
        assert dict(df2.dtypes)["ts"] == "bigint"
        assert rows[0]["ts"] == ns_val
        assert spark.conf.get(key) == "true"
        assert any("nanosAsLong" in str(x.message) for x in w)

        # ... and normalize_event_ts floors it to exact µs
        from pyspark.sql import functions as F

        from formula1_data_pipeline_spark.functions.timestamps import (
            normalize_event_ts,
        )

        got = (normalize_event_ts(read_parquet_maybe_nanos(spark, str(nsp)))
               .select(F.unix_micros("ts").alias("us")).first()["us"])
        assert got == ns_val // 1000
    finally:
        if old is None:
            spark.conf.set(key, "true")  # restore session default
        else:
            spark.conf.set(key, old)
