"""Product quantization + ADC search (operators/pq.py, round 13 —
pre-staged for q92's r15 re-gate as kind='pq'). Trained codebooks are
float means -> recall gates on BOUNDS (the q92 rule); the encode step
GIVEN codebooks is deterministic, so code assignment pins exactly
against a numpy replay."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)

DIM, M, K = 16, 4, 8


@pytest.fixture(scope="module")
def emb(spark):
    from formula1_data_pipeline_spark.evalsets import (
        clustered_embeddings,
    )

    return clustered_embeddings(spark, n=800, dim=DIM, n_clusters=10,
                                std=0.5, seed=11).persist()


@pytest.fixture(scope="module")
def books(emb):
    return train_pq_codebooks(emb, dim=DIM, m=M, k=K, n_iter=3)


def test_codebook_geometry(books):
    assert len(books) == M
    assert all(len(b) == K for b in books)
    assert all(len(c) == DIM // M for b in books for c in b)


def test_encode_matches_numpy_argmin(spark, emb, books):
    got = {
        r["vec_id"]: list(r["pq"])
        for r in pq_encode(emb, "embedding", books).collect()
    }
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    sub = DIM // M
    for vid, v in vecs.items():
        want = []
        for j in range(M):
            sv = v[j * sub:(j + 1) * sub]
            d = [float(np.sum((sv - np.array(c)) ** 2))
                 for c in books[j]]
            # the SQL argmax of 2x.c - |c|^2 breaks exact ties at the
            # FIRST max; numpy argmin matches on this float data
            want.append(int(np.argmin(d)))
        assert got[vid] == want, vid


def test_encode_is_deterministic(emb, books):
    a = pq_encode(emb, "embedding", books).orderBy("vec_id") \
        .select("pq").collect()
    b = pq_encode(emb, "embedding", books).orderBy("vec_id") \
        .select("pq").collect()
    assert a == b


def test_adc_recall_on_clustered_data(spark, emb, books):
    """The binding quality gate (the q92 discipline): ADC top-5 with
    exact re-rank over a 10% candidate window must recover >= 0.9 of
    the exact top-5 on the clustered fixture (measured 1.0) — a
    broken codebook, LUT, or a dropped unit-vector reduction
    measures 0.6-0.8 and fails."""
    from formula1_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    q = emb.filter(F.col("vec_id") < 15)
    exact = {(r["q_id"], r["n_id"])
             for r in cosine_topk(emb, q, k=5, id_col="vec_id",
                                  vec_col="embedding").collect()}
    approx = {(r["q_id"], r["n_id"])
              for r in pq_adc_topk(emb, q, books, dim=DIM, k=5,
                                   n_candidates=80).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_full_candidate_window_equals_exact(spark, emb, books):
    """With n_candidates = corpus size the exact re-rank sees every
    vector, so the output must equal cosine_topk row-for-row — the
    two-stage machinery proves itself lossless (the rp_topk
    contract)."""
    from formula1_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    q = emb.filter(F.col("vec_id") < 5)
    n = emb.count()
    exact = sorted(
        tuple(r) for r in cosine_topk(
            emb, q, k=5, id_col="vec_id", vec_col="embedding",
        ).select("q_id", "n_id", "cos_sim", "rank").collect()
    )
    full = sorted(
        tuple(r) for r in pq_adc_topk(
            emb, q, books, dim=DIM, k=5, n_candidates=n,
        ).select("q_id", "n_id", "cos_sim",
                 F.col("rank").cast("int")).collect()
    )
    assert full == exact


def test_bad_geometry_raises():
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(None, dim=10, m=4)  # type: ignore[arg-type]


def test_precoded_corpus_matches_inline_encode(spark, emb, books):
    """The production path (codes persisted at ingest, searches scan
    codes only) must return exactly the inline-encode results."""
    from formula1_data_pipeline_spark.operators.pq import _unit

    q = emb.filter(F.col("vec_id") < 5)
    inline = sorted(
        tuple(r) for r in pq_adc_topk(
            emb, q, books, dim=DIM, k=5, n_candidates=60).collect())
    pre = (
        emb.select("vec_id", "embedding",
                   _unit(F.transform(
                       "embedding",
                       lambda x: x.cast("double"))).alias("u"))
        .transform(lambda d: pq_encode(d, "u", books, out_col="pq"))
        .drop("u")
    )
    precoded = sorted(
        tuple(r) for r in pq_adc_topk(
            pre, q, books, dim=DIM, k=5, n_candidates=60,
            code_col="pq").collect())
    assert precoded == inline


def test_string_ids_supported(spark, emb, books):
    """Round-13 ADVICE (low): the driver-built LUT frame hardcoded
    `q_id bigint`, crashing createDataFrame for string id columns
    (the bm25_index_topk qid-type lesson). The q_id schema now
    follows the caller's id dtype."""
    s = emb.select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"),
        "embedding",
    )
    q = s.filter(F.col("vec_id").isin("doc-1", "doc-2"))
    got = pq_adc_topk(s, q, books, dim=DIM, k=3, n_candidates=40)
    rows = got.collect()
    assert {r["q_id"] for r in rows} == {"doc-1", "doc-2"}
    assert all(isinstance(r["n_id"], str) for r in rows)
    assert all(r["q_id"] != r["n_id"] for r in rows)
