"""Streaming BM25-index maintenance (streaming/bm25.py, round 13 —
pre-staged for q39's r14 re-gate as kind='bm25_stream').

The convergence contract: the landed index state is query-equivalent
to the one-shot build for ANY split of the corpus, because the
append's replay guard is the landed-DOC anti-join (each doc indexes
exactly once whichever micro-batch carries it first) and df/stats
are additive deltas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.retrieval import (
    bm25_index_append,
    bm25_index_topk,
    bm25_topk,
)
from formula1_data_pipeline_spark.streaming.bm25 import (
    stream_bm25_index,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text").persist()
    )


@pytest.fixture(scope="module")
def queries_df(spark):
    return spark.createDataFrame(
        [("q1", "the data pipeline"), ("q2", "race lap time")],
        ["query_id", "query_text"],
    )


def _topk_rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["n_terms_matched"],
         r["score"], r["rank"])
        for r in df.collect()
    )


def test_streamed_index_equals_live_scan_and_batch_index(
        spark, docs, queries_df, tmp_path):
    """Row-identity across all three paths: live-scan bm25_topk,
    a one-shot batch index, and the 3-micro-batch streamed index —
    the q39 bm25_idx contract composed with the stream."""
    live = _topk_rows(
        bm25_topk(docs, queries_df, k=10)
        .select("query_id", "doc_id", "n_terms_matched",
                "score", "rank"))

    batch_idx = str(tmp_path / "batch_idx")
    bm25_index_append(spark, docs, batch_idx)
    batch = _topk_rows(bm25_index_topk(spark, batch_idx, queries_df,
                                       k=10))

    idx = stream_bm25_index(
        spark, f"{SF}/documents.parquet", n_source_files=3,
        work_dir=str(tmp_path / "w"))
    streamed = _topk_rows(bm25_index_topk(spark, idx, queries_df,
                                          k=10))
    assert streamed == batch == live
    assert len(streamed) > 0


def test_rerun_same_workdir_is_idempotent(spark, docs, queries_df,
                                          tmp_path):
    """A full re-run over the SAME work_dir replays staged files
    under the stable checkpoint; every doc is already landed, so the
    re-run indexes nothing new and results are unchanged."""
    w = str(tmp_path / "w")
    idx = stream_bm25_index(spark, f"{SF}/documents.parquet",
                            n_source_files=2, work_dir=w)
    first = _topk_rows(bm25_index_topk(spark, idx, queries_df, k=10))
    idx2 = stream_bm25_index(spark, f"{SF}/documents.parquet",
                             n_source_files=2, work_dir=w)
    assert idx2 == idx
    assert _topk_rows(bm25_index_topk(spark, idx2, queries_df,
                                      k=10)) == first


def test_changed_corpus_same_workdir_refuses(spark, docs, tmp_path):
    """The content-fingerprint guard (shared with the other streaming
    maintainers): re-calling with a DIFFERENT corpus against the same
    work_dir must raise loudly, never silently replay old staging."""
    w = str(tmp_path / "w")
    stream_bm25_index(spark, f"{SF}/documents.parquet",
                      n_source_files=2, work_dir=w)
    other = str(tmp_path / "other.parquet")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(other)
    with pytest.raises(ValueError, match="different corpus"):
        stream_bm25_index(spark, other, n_source_files=2, work_dir=w)


def test_split_invariance(spark, queries_df, tmp_path):
    """1-file and 4-file streams land query-identical indexes —
    the convergence contract under the split the caller cannot
    control in production."""
    tops = []
    for n in (1, 4):
        idx = stream_bm25_index(
            spark, f"{SF}/documents.parquet", n_source_files=n,
            work_dir=str(tmp_path / f"w{n}"))
        tops.append(_topk_rows(
            bm25_index_topk(spark, idx, queries_df, k=10)))
    assert tops[0] == tops[1]
