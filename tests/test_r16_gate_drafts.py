"""Round-14/15-tier gate drafts — operators pre-staged in round 13
whose catalog landings ride CHANGED extensions of queries due in
r14/r15 (file named r16 for the fallback window). The catalog stays
at the 100-entry / 50-row alternation ceiling: zero free rows,
riders only.

  * streaming BM25-index maintenance (``streaming/bm25.py::
    stream_bm25_index`` — foreachBatch -> bm25_index_append, the
    landed-doc anti-join IS the replay guard, final lease-serialized
    compaction). LANDING ROUTE: rides q39's r14 re-gate (q39 owns
    the BM25 surface; r12-gated, due r14) as kind='bm25_stream'
    rows — row-identical to the live-scan and batch-index kinds, so
    the SHARED oracle CTE replays all three (this draft compares
    against q39's registered oracle directly: zero duplication).

  * product quantization + ADC search (``operators/pq.py`` —
    unit-vector reduction, per-subspace Lloyd codebooks, m-lookup
    asymmetric scoring, exact re-rank of the candidate window).
    LANDING ROUTE: rides q92's r15 re-gate (ANN-recall surface;
    r13-gated, due r15) as kind='pq' rows — a recall-floor boolean
    against the exact top-5 on the clustered fixture (trained
    codebooks gate on BOUNDS, the q92 rule).

Each draft runs the full driver-style compare (schema + rows +
order-insensitive canonical values) at sf0.001 and sf0.01 — the
exact acceptance its landing round promotes into __spark_entry__.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark import queries  # noqa: F401
from tests.oracle_compare import canon, run_oracle

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _compare_frames(sdf: pd.DataFrame, odf: pd.DataFrame) -> None:
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    a, b = canon(sdf), canon(odf)
    assert a == b, [(x, y) for x, y in zip(a, b) if x != y][:3]


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_bm25_stream_kind(spark, sf_dir, tmp_path):
    """The q39 rider leg: top-10 per audit query from the
    STREAM-maintained index, shaped as q39's long rows with
    kind='bm25_stream'. Oracle = q39's OWN registered oracle's
    kind='bm25' rows re-labeled — the row-identity contract means
    the shared CTE replays the streamed path too."""
    from formula1_data_pipeline_spark.operators.retrieval import (
        bm25_index_topk,
    )
    from formula1_data_pipeline_spark.queries import CATALOG
    from formula1_data_pipeline_spark.queries_datapipe import (
        BM25_QUERIES,
    )
    from formula1_data_pipeline_spark.streaming.bm25 import (
        stream_bm25_index,
    )

    idx = stream_bm25_index(
        spark, f"{sf_dir}/documents.parquet", n_source_files=3,
        work_dir=str(tmp_path / "w"))
    qdf = spark.createDataFrame(BM25_QUERIES,
                                ["query_id", "query_text"])
    sdf = bm25_index_topk(spark, idx, qdf, k=10).select(
        F.lit("bm25_stream").alias("kind"),
        F.col("query_id").alias("key"),
        "doc_id",
        F.col("n_terms_matched").alias("n"),
        "score",
        "rank",
    ).toPandas()

    oracle_all = run_oracle(
        CATALOG["q39_tfidf_top_terms"].oracle, sf_dir)
    odf = oracle_all[oracle_all["kind"] == "bm25"].copy()
    odf["kind"] = "bm25_stream"
    _compare_frames(sdf, odf)


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_pq_kind(spark, sf_dir):
    """The q92 rider leg: kind='pq' recall-floor row on the shared
    clustered fixture (the q92 evaluation corpus — structure-free
    gaussians cannot distinguish a working quantizer from a broken
    one) + an encode-determinism row. Floor 0.85 at a 10% candidate
    window; a broken codebook/LUT measures 0.6-0.8 (operators/pq.py
    measurement table)."""
    from formula1_data_pipeline_spark.evalsets import (
        clustered_embeddings,
    )
    from formula1_data_pipeline_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )
    from formula1_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    emb = clustered_embeddings(spark, n=2000, dim=16, n_clusters=20,
                               std=0.6, seed=7)
    books = train_pq_codebooks(emb, dim=16, m=4, k=16, n_iter=3)
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r["q_id"], r["n_id"])
             for r in cosine_topk(emb, q, k=5, id_col="vec_id",
                                  vec_col="embedding").collect()}
    approx = {(r["q_id"], r["n_id"])
              for r in pq_adc_topk(emb, q, books, dim=16, k=5,
                                   n_candidates=200).collect()}
    recall = len(exact & approx) / len(exact)
    enc1 = pq_encode(emb, "embedding", books).orderBy("vec_id") \
        .select("pq").collect()
    enc2 = pq_encode(emb, "embedding", books).orderBy("vec_id") \
        .select("pq").collect()
    sdf = spark.createDataFrame(
        [("pq", len(exact), recall >= 0.85),
         ("pq_encode_deterministic", len(enc1), enc1 == enc2)],
        "method string, n_exact long, recall_ok boolean",
    ).toPandas()
    odf = run_oracle(
        f"""
        SELECT 'pq' AS method, CAST({len(exact)} AS BIGINT)
               AS n_exact, true AS recall_ok
        UNION ALL
        SELECT 'pq_encode_deterministic', 2000, true
        """,
        sf_dir,
    )
    _compare_frames(sdf, odf)
