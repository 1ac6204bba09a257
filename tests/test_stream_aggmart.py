"""Streaming aggregate-mart maintenance (streaming/aggmart.py):
exact convergence to the one-shot groupBy for any micro-batch split
(every carried aggregate is distributive — bit-for-bit equality),
full-replay idempotence via the mart's own batch-id probe, and the
changed-corpus stage-once guard."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.scratch import scratch_dir
from formula1_data_pipeline_spark.streaming.aggmart import (
    stream_agg_mart,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_path():
    return f"{SF}/documents.parquet"


def _one_shot(spark, docs_path):
    docs = spark.read.parquet(docs_path)
    v = F.col("n_chars").cast("long")
    return {
        r["source"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in docs.filter(v.isNotNull()).groupBy("source").agg(
            F.count(v).alias("n"), F.sum(v).alias("s"),
            F.min(v).alias("mn"), F.max(v).alias("mx"),
        ).collect()
    }


def _stats_map(df):
    return {
        r["source"]: (r["n_rows"], int(r["sum_value"]),
                      r["min_value"], r["max_value"])
        for r in df.collect()
    }


@pytest.mark.parametrize("n_files", [2, 5])
def test_stream_equals_one_shot_for_any_split(spark, docs_path,
                                              n_files):
    got = stream_agg_mart(
        spark, docs_path, ["source"], "n_chars",
        n_source_files=n_files,
        work_dir=scratch_dir(prefix=f"sam_{n_files}_"),
    )
    assert _stats_map(got) == _one_shot(spark, docs_path)


def test_full_replay_is_idempotent(spark, docs_path):
    wd = scratch_dir(prefix="sam_replay_")
    first = _stats_map(stream_agg_mart(
        spark, docs_path, ["source"], "n_chars", work_dir=wd))
    # second run over the same work_dir: availableNow re-plans from
    # the kept checkpoint; any re-delivered bid no-ops in the mart
    second = _stats_map(stream_agg_mart(
        spark, docs_path, ["source"], "n_chars", work_dir=wd))
    assert first == second == _one_shot(spark, docs_path)


def test_changed_corpus_raises(spark, docs_path, tmp_path):
    wd = str(tmp_path / "wd")
    stream_agg_mart(spark, docs_path, ["source"], "n_chars",
                    work_dir=wd)
    changed = str(tmp_path / "changed.parquet")
    # same cardinality, different content — the count-only trap the
    # round-11 fingerprint guard closes
    (spark.read.parquet(docs_path)
     .withColumn("n_chars", F.col("n_chars") + 1)
     .write.parquet(changed))
    with pytest.raises(ValueError, match="different corpus"):
        stream_agg_mart(spark, changed, ["source"], "n_chars",
                        work_dir=wd)
