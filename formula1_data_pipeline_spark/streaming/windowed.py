"""Structured Streaming leg — the idiomatic upgrade of the reference's
micro-batch "realtime" path (SURVEY.md §2.10).

The reference polls an API daily and delete+reloads one session's rows
(``dags/open_f1_realtime.py:221-246``); it has no watermarks or
windows. At 100 TB-stream scale the Spark-native shape is
``readStream -> withWatermark -> window agg -> sink``, which this
module provides over the ``events`` table:

- event-time tumbling windows (`F.window`),
- watermark-based late-data handling (append mode emits a window only
  once the watermark — max event time minus delay — passes its end),
- `Trigger.AvailableNow` so the same pipeline runs batch-style over a
  bounded backlog (exactly how the reference's poller would replay).

State scale: one row of state per (window, event_type) — bounded by
watermark eviction, safe at any volume.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_windowed_agg(
    spark: SparkSession,
    events_path: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
    timeout_sec: int = 300,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the windowed count/sum aggregation over ``events`` as a real
    Structured Streaming query (AvailableNow → memory sink) and return
    the finalized result.

    Append mode + watermark means only windows whose end <= max event
    time - delay are emitted — late-arriving data inside the delay
    would still be merged, the semantic the reference approximates with
    its delete+reload (S6).
    """
    # schema must be known up front for a file stream; take it from a
    # batch read. events.parquet carries TIMESTAMP(NANOS), which the
    # reader rejects unless nanosAsLong is set — a runtime conf, set
    # here so externally-supplied sessions (not built by get_spark)
    # work too, matching queries.load.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(events_path).schema
    # FileStreamSource only accepts directories — stage the file(s)
    # behind a symlink dir (zero-copy)
    import os
    import pathlib

    src_dir = tempfile.mkdtemp(prefix="stream_src_")
    p = pathlib.Path(events_path)
    os.symlink(p, pathlib.Path(src_dir) / p.name)
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .load(src_dir)
    )
    from formula1_data_pipeline_spark.functions.timestamps import (
        normalize_event_ts,
    )

    stream = normalize_event_ts(stream)

    agg = (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )

    from formula1_data_pipeline_spark.streaming.confs import (
        scoped_shuffle_partitions,
    )

    qname = f"windowed_{uuid.uuid4().hex[:8]}"
    # window-agg state shards one store per shuffle partition (confs.py)
    with scoped_shuffle_partitions(spark, state_partitions):
        query = (
            agg.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_sec)
    return spark.table(qname)
