"""IVF-PQ composition (vecindex.py + pq.py, round 13): PQ codes
stored in the inverted lists, ADC candidate scoring over probed
cells reading ONLY the code column, exact re-rank of candidates.
The faiss IVFPQ layout on the manifest-txn index — the 100 TB ANN
read path (cell pruning x 32x-smaller candidate scans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.pq import (
    train_pq_codebooks,
)
from formula1_data_pipeline_spark.operators.vecindex import (
    ivf_index_append,
    ivf_index_build,
    ivf_index_pq_topk,
    ivf_index_topk,
)

DIM, M, K = 16, 4, 16


@pytest.fixture(scope="module")
def emb(spark):
    from formula1_data_pipeline_spark.evalsets import (
        clustered_embeddings,
    )

    return clustered_embeddings(spark, n=900, dim=DIM, n_clusters=10,
                                std=0.5, seed=13).persist()


@pytest.fixture(scope="module")
def books(emb):
    return train_pq_codebooks(emb, dim=DIM, m=M, k=K, n_iter=2)


@pytest.fixture(scope="module")
def idx(spark, emb, books, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    ivf_index_build(spark, emb, d, n_centroids=8, n_iter=3,
                    pq_codebooks=books)
    return d


def _pairs(df):
    return {(r["q_id"], r["n_id"]) for r in df.collect()}


def test_pq_topk_recalls_the_ivf_ranking(spark, emb, idx):
    """ADC candidates + exact re-rank over the probed cells must
    recover >= 0.9 of ivf_index_topk's top-5 (same cells, so the
    only loss is the ADC candidate window; measured 1.0 at a
    ~25%-of-probed-population window)."""
    q = emb.filter(F.col("vec_id") < 15)
    ivf = _pairs(ivf_index_topk(spark, idx, q, k=5, n_probe=3))
    pq = _pairs(ivf_index_pq_topk(spark, idx, q, k=5, n_probe=3,
                                  n_candidates=80))
    assert len(ivf & pq) >= 0.9 * len(ivf)


def test_full_candidate_window_equals_ivf_exactly(spark, emb, idx):
    """With the window >= the probed population, the re-rank sees
    every probed vector: rows must equal ivf_index_topk's exactly —
    the lossless-machinery contract (scores, ranks, tiebreaks)."""
    q = emb.filter(F.col("vec_id") < 8)
    n = emb.count()
    ivf = sorted(tuple(r) for r in ivf_index_topk(
        spark, idx, q, k=5, n_probe=3)
        .select("q_id", "n_id", "cos_sim", "rank").collect())
    pq = sorted(tuple(r) for r in ivf_index_pq_topk(
        spark, idx, q, k=5, n_probe=3, n_candidates=n)
        .select("q_id", "n_id", "cos_sim", "rank").collect())
    assert pq == ivf and len(pq) == 8 * 5


def test_candidate_scan_prunes_vector_columns(spark, emb, idx):
    """The 32x-IO claim, asserted on the physical plan: the plan must
    contain a scan of the lists whose ReadSchema carries pq but NOT
    the float vec column (candidate stage), alongside the re-fetch
    scan that does read vec."""
    q = emb.filter(F.col("vec_id") < 3)
    plan = ivf_index_pq_topk(spark, idx, q, k=5, n_probe=2,
                             n_candidates=20) \
        ._jdf.queryExecution().executedPlan().toString()
    scans = [seg for seg in plan.split("FileScan")[1:]
             if "/lists/" in seg.split("\n")[0]]
    assert scans, "no lists scans found in plan"
    pruned = [s for s in scans
              if "pq" in s.split("ReadSchema:")[-1]
              and "vec" not in s.split("ReadSchema:")[-1]
              .split("struct<")[-1].split(">")[0]]
    assert pruned, f"no vec-pruned candidate scan:\n{plan[:2000]}"


def test_append_encodes_against_frozen_landed_books(spark, emb, books,
                                                    tmp_path):
    """Appends to a PQ index must carry codes from the LANDED
    codebooks (frozen-quantizer discipline): after an append the
    full-window query still equals ivf_index_topk over the grown
    index, and a re-delivered batch is skipped."""
    import formula1_data_pipeline_spark.sources.txn as T
    from formula1_data_pipeline_spark.operators.vecindex import (
        _LISTS,
        _tables,
    )

    d = str(tmp_path / "idx")
    head = emb.filter(F.col("vec_id") < 600)
    tail = emb.filter(F.col("vec_id") >= 600)
    ivf_index_build(spark, head, d, n_centroids=8, n_iter=2,
                    pq_codebooks=books)
    n_new = ivf_index_append(spark, tail, d)
    assert n_new == tail.count()
    assert ivf_index_append(spark, tail, d) == 0  # re-delivery
    lists = T.read_table(spark, _tables(d)[_LISTS])
    assert lists.filter(F.col("pq").isNull()).count() == 0
    q = emb.filter(F.col("vec_id") < 5)
    n = emb.count()
    ivf = sorted(tuple(r) for r in ivf_index_topk(
        spark, d, q, k=5, n_probe=3)
        .select("q_id", "n_id", "cos_sim", "rank").collect())
    pq = sorted(tuple(r) for r in ivf_index_pq_topk(
        spark, d, q, k=5, n_probe=3, n_candidates=n)
        .select("q_id", "n_id", "cos_sim", "rank").collect())
    assert pq == ivf


def test_plain_index_refuses_pq_query(spark, emb, tmp_path):
    d = str(tmp_path / "idx")
    ivf_index_build(spark, emb.filter(F.col("vec_id") < 300), d,
                    n_centroids=4, n_iter=1)
    with pytest.raises(ValueError, match="no PQ codes"):
        ivf_index_pq_topk(spark, d, emb.filter(F.col("vec_id") < 3))


def test_null_vector_query_sits_out(spark, emb, idx):
    """Round-13 ADVICE (low): a NULL embedding in the query frame
    used to reach _luts and raise a bare TypeError driver-side;
    NULL-vector queries now sit out, matching pq_adc_topk."""
    q = emb.filter(F.col("vec_id") < 5) \
        .select("vec_id", "embedding").unionByName(
            spark.createDataFrame(
                [(999_999, None)],
                "vec_id long, embedding array<double>"))
    got = ivf_index_pq_topk(spark, idx, q, k=3, n_probe=2,
                            n_candidates=50)
    qids = {r["q_id"] for r in got.select("q_id").distinct().collect()}
    assert 999_999 not in qids
    assert len(qids) == 5
