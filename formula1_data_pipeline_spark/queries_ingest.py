"""q14 — the ingest write path (S4-S8) under the oracle gate.

Round 1 proved the sink functions by pytest only; this entry puts the
*observable landed state* under the driver's value-hash gate. It runs
the real sinks (``sources.sinks``) against a per-invocation temp
directory, reads the landed parquet back, and emits one probe row per
landed record; the oracle replays the same upsert sequence in ANSI SQL
over the source tables.

Sequence (mirrors reference ``dags/open_f1_historical.py:111-152`` and
``dags/open_f1_realtime.py:108-170``):

1. **S4/S5 append_raw** — two disjoint customer batches land
   append-only, all-string (F12 stringify).
2. **S6 replace_by_key** — full customer load partitioned by
   c_mktsegment, then a reload of the BUILDING segment with adjusted
   balances; dynamic partition overwrite must replace exactly that
   segment and leave the rest untouched.
3. **S6-alt/S7 merge_upsert** — supplier last-write-wins merge where
   the incoming batch carries a new column (schema drift): old rows
   keep NULL in the drifted column (F16-style tolerance), updated rows
   win by batch priority.
4. **S8 skip_loaded** — candidate keys anti-joined against the step-1
   landed keys.

Determinism: doubles are emitted by casting the landed *string* back to
double — double→string formatting differs across engines (Java vs Ryu
shortest-repr) but the round-trip is exact, so both sides compare the
original double values. Temp dirs live for the session (the returned
DataFrame reads them lazily).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.queries import load, register


def _probe(df: DataFrame, step: str, key: str, val: str,
           tag: Column) -> DataFrame:
    return df.select(
        F.lit(step).alias("step"),
        F.col(key).cast("long").alias("key"),
        F.col(val).cast("double").alias("val"),
        tag.cast("string").alias("tag"),
    )


@register(
    "q14_ingest_write_path",
    """
    WITH appended AS (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_custkey % 3 IN (0, 1)
    ), replaced AS (
        SELECT c_custkey,
               CASE WHEN c_mktsegment = 'BUILDING'
                    THEN c_acctbal + 1000.0 ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer
    ), merged AS (
        SELECT s_suppkey,
               CASE WHEN s_suppkey % 5 = 0
                    THEN s_acctbal + 500.0 ELSE s_acctbal END AS s_acctbal,
               CASE WHEN s_suppkey % 5 = 0 THEN 'rt' END AS source_tag
        FROM supplier
    ), skipped AS (
        SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 = 2
    )
    SELECT 'append' AS step, c_custkey AS key, c_acctbal AS val,
           CAST(NULL AS VARCHAR) AS tag
    FROM appended
    UNION ALL
    SELECT 'replace', c_custkey, c_acctbal, c_mktsegment FROM replaced
    UNION ALL
    SELECT 'merge', s_suppkey, s_acctbal, source_tag FROM merged
    UNION ALL
    SELECT 'skip', c_custkey, c_acctbal, CAST(NULL AS VARCHAR) FROM skipped
    """,
    doc="Ingest write path under the gate (S4-S8): append_raw x2 -> "
        "replace_by_key full-load + segment reload (dynamic partition "
        "overwrite) -> merge_upsert with schema drift -> skip_loaded "
        "anti-join; landed parquet read back and probed row-by-row, "
        "oracle replays the sequence in SQL",
)
def q14_ingest_write_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.sources.sinks import (
        append_raw,
        merge_upsert,
        replace_by_key,
        skip_loaded,
    )

    t = load(spark, sf_dir, "customer", "supplier")
    cust, supp = t["customer"], t["supplier"]
    base = tempfile.mkdtemp(prefix="q14_ingest_")

    # 1. S4/S5: two disjoint append-only batches into the landing table
    hist = f"{base}/raw_customer"
    append_raw(cust.filter(F.col("c_custkey") % 3 == 0), hist)
    append_raw(cust.filter(F.col("c_custkey") % 3 == 1), hist)
    appended = spark.read.parquet(hist)

    # 2. S6: full load partitioned by segment, then reload one segment
    seg = f"{base}/customer_by_segment"
    replace_by_key(cust, seg, key="c_mktsegment")
    reload_df = cust.filter(F.col("c_mktsegment") == "BUILDING").withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000.0
    )
    replace_by_key(reload_df, seg, key="c_mktsegment")
    replaced = spark.read.parquet(seg)

    # 3. S6-alt/S7: last-write-wins merge; incoming batch drifts schema
    mrg = f"{base}/supplier_merged"
    merge_upsert(
        spark, supp.withColumn("batch", F.lit("1")), mrg,
        keys=["s_suppkey"], order=[F.col("batch").desc()],
    )
    incoming = (
        supp.filter(F.col("s_suppkey") % 5 == 0)
        .withColumn("s_acctbal", F.col("s_acctbal") + 500.0)
        .withColumn("batch", F.lit("2"))
        .withColumn("source_tag", F.lit("rt"))
    )
    merge_upsert(
        spark, incoming, mrg,
        keys=["s_suppkey"], order=[F.col("batch").desc()],
    )
    merged = spark.read.parquet(mrg)

    # 4. S8: drop candidates whose key already landed in step 1
    candidates = cust.select(
        F.col("c_custkey").cast("string").alias("c_custkey"), "c_acctbal"
    )
    skipped = skip_loaded(candidates, appended, key="c_custkey")

    return (
        _probe(appended, "append", "c_custkey", "c_acctbal", F.lit(None))
        .unionByName(_probe(replaced, "replace", "c_custkey", "c_acctbal",
                            F.col("c_mktsegment")))
        .unionByName(_probe(merged, "merge", "s_suppkey", "s_acctbal",
                            F.col("source_tag")))
        .unionByName(_probe(skipped, "skip", "c_custkey", "c_acctbal",
                            F.lit(None)))
    )


@register(
    "q15_csv_jsonl_roundtrip",
    """
    WITH agg AS (
        SELECT l_returnflag,
               count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_price,
               min(l_shipdate) AS min_ship,
               max(l_shipdate) AS max_ship
        FROM lineitem
        GROUP BY 1
    )
    SELECT 'csv' AS fmt, * FROM agg
    UNION ALL
    SELECT 'jsonl', * FROM agg
    """,
    doc="CSV + JSON-lines source/sink faithfulness: lineitem written "
        "to each format and read back with an explicit schema "
        "(microsecond timestampFormat, shortest-round-trip doubles), "
        "then aggregated; the oracle aggregates the original table — "
        "any value lost or altered by either format breaks the hash",
)
def q15_csv_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.sources.files import (
        read_csv,
        read_jsonl,
        write_csv,
        write_jsonl,
    )

    li = load(spark, sf_dir, "lineitem")["lineitem"]
    base = tempfile.mkdtemp(prefix="q15_roundtrip_")
    write_csv(li, f"{base}/csv")
    write_jsonl(li, f"{base}/jsonl")

    def agg(df: DataFrame, fmt: str) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double").alias("sum_price"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
        ).select(F.lit(fmt).alias("fmt"), "*")

    back_csv = read_csv(spark, f"{base}/csv", li.schema)
    back_jsonl = read_jsonl(spark, f"{base}/jsonl", li.schema)
    return agg(back_csv, "csv").unionByName(agg(back_jsonl, "jsonl"))
