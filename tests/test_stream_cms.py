"""Streaming Count-Min heavy-hitters (streaming/heavyhitters.py):
exact convergence to the one-shot build for any micro-batch split
(the CMS is a distributive aggregate — bit-for-bit equality, stronger
than the neardup verdict-convergence contract), row-identity of the
streaming heavy-hitter enumeration with the batch operator, and
full-replay idempotence via the bid skip."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators import sketch as S
from formula1_data_pipeline_spark.scratch import scratch_dir
from formula1_data_pipeline_spark.streaming.heavyhitters import (
    read_cms_state,
    stream_cms_counters,
    stream_heavy_ngrams,
)

D, W_BITS = 3, 6


@pytest.fixture(scope="module")
def corpus_path(spark):
    rows = [
        (i,
         " ".join(
             ["the quick brown fox"] * (1 + i % 3)
             + [f"unique token {i}", "lorem ipsum dolor"]
         ))
        for i in range(40)
    ]
    path = str(scratch_dir(prefix="cms_corpus_")) + "/docs"
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(path)
    return path


def _counters_dict(df):
    return {(r["row"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_stream_equals_oneshot_any_split(spark, corpus_path):
    docs = spark.read.parquet(corpus_path)
    oneshot = _counters_dict(S.cms_counters(
        S.gram_occurrences(docs, 2), "gram", D, W_BITS))
    for n_files in (1, 4):
        got = _counters_dict(stream_cms_counters(
            spark, corpus_path, n=2, d=D, w_bits=W_BITS,
            n_source_files=n_files,
        ))
        assert got == oneshot, f"split {n_files} diverged"


def test_stream_heavy_equals_batch_operator(spark, corpus_path):
    got = {
        r["gram"]: (r["n_occurrences"], r["est_count"], r["is_heavy"])
        for r in stream_heavy_ngrams(
            spark, corpus_path, n=2, threshold=10, d=D,
            w_bits=W_BITS, n_source_files=3).collect()
    }
    docs = spark.read.parquet(corpus_path)
    exp = {
        r["gram"]: (r["n_occurrences"], r["est_count"], r["is_heavy"])
        for r in S.corpus_heavy_ngrams(
            docs, n=2, threshold=10, d=D, w_bits=W_BITS).collect()
    }
    assert got == exp
    assert any(hv for (_, _, hv) in got.values())


def test_full_replay_is_idempotent(spark, corpus_path):
    """A full re-run against the same state dir (checkpoint lost)
    re-delivers every micro-batch; the bid skip must leave the state
    unchanged instead of double-counting."""
    import shutil

    work = str(scratch_dir(prefix="cms_replay_"))
    first = _counters_dict(stream_cms_counters(
        spark, corpus_path, n=2, d=D, w_bits=W_BITS,
        n_source_files=2, work_dir=work))
    # re-run with the kept checkpoint: zero new batches, state intact
    kept = _counters_dict(stream_cms_counters(
        spark, corpus_path, n=2, d=D, w_bits=W_BITS,
        n_source_files=2, work_dir=work))
    assert kept == first
    # checkpoint LOST (the crash-replay case): every micro-batch
    # re-delivers under bids 0..n-1 over the UNCHANGED staging — the
    # bid skip must leave the state unchanged, not double-count
    shutil.rmtree(work + "/ckpt")
    replay = _counters_dict(stream_cms_counters(
        spark, corpus_path, n=2, d=D, w_bits=W_BITS,
        n_source_files=2, work_dir=work))
    assert replay == first
    assert replay == _counters_dict(
        read_cms_state(spark, work + "/counters"))


def test_changed_corpus_against_old_state_raises(spark, corpus_path):
    """Review regression: recycled batch ids over a RESTAGED source
    silently skipped new documents; a grown corpus against an
    existing work_dir must raise instead."""
    work = str(scratch_dir(prefix="cms_grow_"))
    stream_cms_counters(spark, corpus_path, n=2, d=D, w_bits=W_BITS,
                        n_source_files=2, work_dir=work)
    grown = str(scratch_dir(prefix="cms_grown_")) + "/docs"
    docs = spark.read.parquet(corpus_path)
    docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 10_000)
    ).write.parquet(grown)
    with pytest.raises(ValueError, match="FIXED snapshot"):
        stream_cms_counters(spark, grown, n=2, d=D, w_bits=W_BITS,
                            n_source_files=2, work_dir=work)


def test_same_cardinality_drift_raises(spark, corpus_path):
    """Round-10 ADVICE regression: the guard compared only row
    counts, so a CHANGED corpus with the same cardinality silently
    replayed the old staging and returned counter state for the
    wrong data. The content fingerprint must catch it."""
    work = str(scratch_dir(prefix="cms_drift_"))
    stream_cms_counters(spark, corpus_path, n=2, d=D, w_bits=W_BITS,
                        n_source_files=2, work_dir=work)
    drifted = str(scratch_dir(prefix="cms_drifted_")) + "/docs"
    docs = spark.read.parquet(corpus_path)
    docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(" drifted"))
    ).write.parquet(drifted)  # same row count, different content
    with pytest.raises(ValueError, match="FIXED snapshot"):
        stream_cms_counters(spark, drifted, n=2, d=D, w_bits=W_BITS,
                            n_source_files=2, work_dir=work)


def test_state_is_bounded(spark, corpus_path):
    got = stream_cms_counters(
        spark, corpus_path, n=2, d=D, w_bits=W_BITS,
        n_source_files=3)
    assert got.count() <= D * (1 << W_BITS)
