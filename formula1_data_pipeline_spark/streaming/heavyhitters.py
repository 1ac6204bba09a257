"""Streaming corpus heavy-hitters — Count-Min counters maintained
online, heavy n-grams enumerated from the landed state.

The streaming composition of ``operators/sketch.py``: documents
arrive as a file stream; each micro-batch derives ITS OWN n-gram
occurrences, builds a batch counter table (bounded at d * 2^w_bits
rows), and txn-appends it as one delta segment — the BM25 delta-log
discipline (``retrieval.bm25_index_append``): readers SUM segments,
compaction folds them, and because the Count-Min sketch is a
DISTRIBUTIVE aggregate the summed state is bit-for-bit the table a
one-shot build over the whole corpus would produce, independent of
how the source was split into micro-batches — the same convergence
contract as ``stream_neardup_dedup``, here with exact equality
rather than verdict convergence.

Re-delivery safety: each segment carries its batch id; a
crash-replayed micro-batch (checkpoint loss, manual restart against
the same state dir) is skipped by one bid lookup over the tiny
counter table instead of double-counting — the q87/BM25 idempotence
contract at sketch scale.

Scale shape per micro-batch: one gram-derivation pass over the batch
only (the corpus is never rescanned), one bounded counter aggregate,
one manifest commit. State is CAPPED at d * 2^w_bits counter rows
per segment regardless of corpus size; heavy-hitter enumeration at
read time is the batch operator's CMS-prefilter -> exact-count pass
consuming the landed state.
"""

from __future__ import annotations

import pathlib
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.scratch import scratch_dir


def read_cms_state(spark: SparkSession, counters_path: str) -> DataFrame:
    """(row, bucket, cnt) — the landed counter table, delta segments
    summed (the reader-side fold; ``cms_merge`` semantics over landed
    state)."""
    from formula1_data_pipeline_spark.sources.txn import read_table

    return (
        read_table(spark, counters_path)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def stream_cms_counters(
    spark: SparkSession,
    documents_path: str,
    n: int = 2,
    d: int = 4,
    w_bits: int = 14,
    n_source_files: int = 3,
    timeout_sec: int = 300,
    state_partitions: int | None = 8,
    work_dir: str | None = None,
) -> DataFrame:
    """Replay ``documents`` as a file stream of ``n_source_files``
    micro-batches, maintaining the Count-Min counter state; return
    the merged (row, bucket, cnt) table — exactly equal to the
    one-shot ``cms_counters`` over the full corpus, for ANY split.

    ``work_dir``: where the counter segments and checkpoint live — a
    deployment passes durable storage; ``None`` uses a
    process-lifetime scratch dir (gates/tests)."""
    from formula1_data_pipeline_spark.operators.sketch import (
        cms_counters,
        gram_occurrences,
    )
    from formula1_data_pipeline_spark.sources.txn import (
        current_version,
        read_table,
        txn_append,
    )
    from formula1_data_pipeline_spark.streaming.confs import (
        scoped_shuffle_partitions,
    )

    docs = spark.read.parquet(documents_path).select("doc_id", "text")
    base = pathlib.Path(work_dir if work_dir is not None
                        else scratch_dir(prefix="stream_cms_"))
    src_dir = str(base / "src")
    counters_path = str(base / "counters")
    # arbitrary (hash) split into files: the convergence contract is
    # exactly that the merged state doesn't depend on this split.
    # Overwrite so a re-run against the same work_dir (crash replay,
    # lost checkpoint) restages and the bid skip proves idempotence.
    docs.repartition(n_source_files).write.mode("overwrite") \
        .parquet(src_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )

    def land(batch_df: DataFrame, batch_id: int) -> None:
        bspark = batch_df.sparkSession
        if current_version(bspark, counters_path) is not None:
            landed_bids = {
                r["bid"] for r in read_table(bspark, counters_path)
                .select("bid").distinct().collect()
            }
            if batch_id in landed_bids:
                return  # re-delivered micro-batch: already counted
        seg = cms_counters(
            gram_occurrences(batch_df, n, "text", "doc_id"),
            "gram", d, w_bits,
        ).withColumn("bid", F.lit(batch_id))
        txn_append(bspark, seg, counters_path)

    with scoped_shuffle_partitions(spark, state_partitions):
        query = (
            stream.writeStream.foreachBatch(land)
            .option("checkpointLocation",
                    str(base / f"ckpt_{uuid.uuid4().hex[:8]}"))
            .trigger(availableNow=True)
            .start()
        )
        if not query.awaitTermination(timeout_sec):
            query.stop()
            raise TimeoutError(
                f"stream_cms_counters did not finish within "
                f"{timeout_sec}s"
            )
    return read_cms_state(spark, counters_path)


def stream_heavy_ngrams(
    spark: SparkSession,
    documents_path: str,
    n: int = 2,
    threshold: int = 10,
    d: int = 4,
    w_bits: int = 14,
    **stream_kwargs,
) -> DataFrame:
    """End-to-end streaming heavy hitters: maintain the counter state
    over the stream, then enumerate (gram, n_occurrences, est_count,
    is_heavy) with the batch operator's CMS-prefilter -> exact-count
    pass consuming the LANDED state — row-identical to
    ``corpus_heavy_ngrams`` over the same corpus (asserted in
    tests), since the merged counters are bit-for-bit the one-shot
    table."""
    from formula1_data_pipeline_spark.operators.sketch import (
        gram_occurrences,
        heavy_hitters,
    )

    counters = stream_cms_counters(
        spark, documents_path, n, d, w_bits, **stream_kwargs)
    docs = spark.read.parquet(documents_path).select("doc_id", "text")
    return heavy_hitters(
        gram_occurrences(docs, n, "text", "doc_id"),
        "gram", threshold, d, w_bits, counters=counters,
    )
