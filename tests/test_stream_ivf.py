"""Streaming IVF-index maintenance (streaming/ivf.py): streamed
state == one-shot build for any split, replay/overlap idempotence,
query equivalence, changed-corpus guard, partial-index refusal."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.similarity import (
    _hash_sample_coefs,
    _as_double,
    norm,
)
from formula1_data_pipeline_spark.operators.vecindex import (
    ivf_index_build,
    ivf_index_topk,
)
from formula1_data_pipeline_spark.scratch import scratch_dir
from formula1_data_pipeline_spark.streaming.ivf import stream_ivf_append

SF = "/root/testdata/sf0.001"


def _coefs(spark, emb):
    base = emb.select(
        F.col("vec_id").alias("id"),
        _as_double(F.col("embedding")).alias("vec"),
    ).withColumn("nrm", norm(F.col("vec")))
    return _hash_sample_coefs(base, 8)


def _lists(spark, idx):
    from formula1_data_pipeline_spark.sources.txn import read_table

    return sorted(
        (r["cluster"], r["id"])
        for r in read_table(spark, f"{idx}/lists")
        .select("cluster", "id").collect()
    )


@pytest.mark.parametrize("n_files", [2, 4])
def test_streamed_index_equals_one_shot_any_split(spark, tmp_path,
                                                  n_files):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    mx = emb.agg(F.max("vec_id")).collect()[0][0]
    head = emb.filter(F.col("vec_id") <= mx // 4)
    tail = emb.filter(F.col("vec_id") > mx // 4)
    coefs = _coefs(spark, emb)

    streamed = str(tmp_path / f"streamed{n_files}")
    ivf_index_build(spark, head, streamed, centroid_coefs=coefs,
                    n_assign=2)
    tail_path = str(tmp_path / f"tail{n_files}.parquet")
    tail.write.parquet(tail_path)
    stream_ivf_append(spark, tail_path, streamed,
                      n_source_files=n_files, n_assign=2)

    oneshot = str(tmp_path / f"oneshot{n_files}")
    ivf_index_build(spark, emb, oneshot, centroid_coefs=coefs,
                    n_assign=2)
    assert _lists(spark, streamed) == _lists(spark, oneshot)

    q = emb.filter(F.col("vec_id") < 5)
    got = sorted(tuple(r) for r in ivf_index_topk(
        spark, streamed, q, k=3, n_probe=2).collect())
    want = sorted(tuple(r) for r in ivf_index_topk(
        spark, oneshot, q, k=3, n_probe=2).collect())
    assert got == want and len(got) == 15


def test_replay_and_overlap_idempotent(spark, tmp_path):
    """A second full replay through a FRESH checkpoint re-delivers
    every batch; the landed-id skip must keep the index unchanged."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    coefs = _coefs(spark, emb)
    idx = str(tmp_path / "idx")
    mx = emb.agg(F.max("vec_id")).collect()[0][0]
    ivf_index_build(spark, emb.filter(F.col("vec_id") <= mx // 2),
                    idx, centroid_coefs=coefs)
    # the streamed corpus OVERLAPS the built half (re-delivery + new)
    all_path = str(tmp_path / "all.parquet")
    emb.write.parquet(all_path)
    stream_ivf_append(spark, all_path, idx, n_source_files=3,
                      work_dir=str(tmp_path / "w1"))
    first = _lists(spark, idx)
    stream_ivf_append(spark, all_path, idx, n_source_files=3,
                      work_dir=str(tmp_path / "w2"))
    assert _lists(spark, idx) == first
    assert len(first) == emb.count()


def test_changed_corpus_guard(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    ivf_index_build(spark, emb, idx, centroid_coefs=_coefs(spark, emb))
    p1 = str(tmp_path / "c1.parquet")
    emb.write.parquet(p1)
    w = str(tmp_path / "w")
    stream_ivf_append(spark, p1, idx, work_dir=w)
    p2 = str(tmp_path / "c2.parquet")
    emb.filter(F.col("vec_id") % 2 == 0).write.parquet(p2)
    with pytest.raises(ValueError, match="different corpus"):
        stream_ivf_append(spark, p2, idx, work_dir=w)


def test_refuses_missing_index(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = str(tmp_path / "c.parquet")
    emb.write.parquet(p)
    with pytest.raises(RuntimeError, match="build marker"):
        stream_ivf_append(spark, p, str(tmp_path / "nonexistent"))
