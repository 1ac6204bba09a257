"""Streaming priority sampling (streaming/sample.py, round 13 —
pre-staged for q80's r14 re-gate as kind='priority_stream'). The
contract: bit-for-bit the batch priority_sample over the full corpus
for ANY micro-batch split (bottom-k selection merges; race keys are
md5-derived, so the state is a pure function of the document SET)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.sampling import (
    priority_sample,
)
from formula1_data_pipeline_spark.streaming.sample import (
    stream_priority_sample,
)

SF = "/root/testdata/sf0.001"
K = 50


def _rows(df):
    return sorted(
        (r["doc_id"], r["w"], r["prio_rank"], r["tau"], r["ht_weight"])
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def batch_sample(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "n_chars")
    return _rows(
        priority_sample(docs, F.col("n_chars").cast("double"), K)
        .select("doc_id", "w", "prio_rank", "tau", "ht_weight"))


def test_streamed_sample_equals_batch_exactly(spark, batch_sample,
                                              tmp_path):
    got = _rows(stream_priority_sample(
        spark, f"{SF}/documents.parquet", "n_chars", K,
        n_source_files=3, work_dir=str(tmp_path / "w")))
    assert got == batch_sample
    assert len(got) == K


def test_split_invariance(spark, batch_sample, tmp_path):
    for n in (1, 5):
        got = _rows(stream_priority_sample(
            spark, f"{SF}/documents.parquet", "n_chars", K,
            n_source_files=n, work_dir=str(tmp_path / f"w{n}")))
        assert got == batch_sample


def test_rerun_same_workdir_is_idempotent(spark, batch_sample,
                                          tmp_path):
    """A full replay over the same work_dir min-folds already-present
    racers — the state and the sample are unchanged (value-level
    idempotence, the HLL discipline)."""
    w = str(tmp_path / "w")
    first = _rows(stream_priority_sample(
        spark, f"{SF}/documents.parquet", "n_chars", K,
        n_source_files=2, work_dir=w))
    again = _rows(stream_priority_sample(
        spark, f"{SF}/documents.parquet", "n_chars", K,
        n_source_files=2, work_dir=w))
    assert first == again == batch_sample


def test_changed_corpus_same_workdir_refuses(spark, tmp_path):
    w = str(tmp_path / "w")
    stream_priority_sample(spark, f"{SF}/documents.parquet",
                           "n_chars", K, n_source_files=2,
                           work_dir=w)
    other = str(tmp_path / "other.parquet")
    spark.read.parquet(f"{SF}/documents.parquet") \
        .filter(F.col("doc_id") % 2 == 0).write.parquet(other)
    with pytest.raises(ValueError, match="different corpus"):
        stream_priority_sample(spark, other, "n_chars", K,
                               n_source_files=2, work_dir=w)


def test_redelivered_batch_folds_to_identical_state(spark, tmp_path):
    """Crash-replay of a micro-batch AFTER its fold landed (the
    foreachBatch at-least-once case): folding the same batch twice
    leaves the state bit-identical — without the id-dedup on the
    state/batch union, duplicate racer rows could both land in
    limit(k+1) and evict a genuine distinct racer (round-13 ADVICE,
    the high item)."""
    from formula1_data_pipeline_spark.sources.txn import read_table
    from formula1_data_pipeline_spark.streaming.sample import (
        _fold_batch,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "n_chars")
    k = 10
    # split so a duplicate CAN matter: the second batch's racers
    # overlap the state's bottom-(k+1) after batch 1 + batch 2 land
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    tbl = str(tmp_path / "racers")
    _fold_batch(b1, tbl, "n_chars", k, "doc_id", "priosample-v1")
    _fold_batch(b2, tbl, "n_chars", k, "doc_id", "priosample-v1")
    before = sorted(map(tuple, read_table(spark, tbl).collect()))
    assert len({t[0] for t in before}) == len(before)  # distinct ids
    # re-deliver batch 2 (its rows are already in the state)
    _fold_batch(b2, tbl, "n_chars", k, "doc_id", "priosample-v1")
    after = sorted(map(tuple, read_table(spark, tbl).collect()))
    assert after == before
    assert len(after) == k + 1
    assert len({t[0] for t in after}) == k + 1  # still all-distinct


def test_degenerate_small_population(spark, tmp_path):
    """<= k positive-weight rows: the whole population returns with
    tau = 0 and ht_weight = w — the DLT degenerate case, matching
    the batch operator."""
    small = str(tmp_path / "small.parquet")
    spark.read.parquet(f"{SF}/documents.parquet") \
        .filter(F.col("doc_id") < 20).write.parquet(small)
    got = stream_priority_sample(
        spark, small, "n_chars", 100, n_source_files=2,
        work_dir=str(tmp_path / "w")).collect()
    assert 0 < len(got) <= 100
    assert all(r["tau"] == 0.0 and r["ht_weight"] == r["w"]
               for r in got)
