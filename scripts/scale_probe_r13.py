"""Round-13 probe: 10x scale shapes for the round's two pre-staged
operators (the per-operator probe discipline):

  * stream_bm25_index — the per-micro-batch append cost must track
    the BATCH, not the landed index: we land increasingly large
    indexes (1x / 4x / 10x corpora) and measure the SAME fixed-size
    append against each. Flat-ish appends = the landed-doc skip's
    column-pruned anti-join + delta appends are batch-shaped.
  * pq (encode + ADC search) — encode is a shuffle-free projection
    (expect ~linear in rows, flat per row); the ADC candidate stage
    reads only the m-int code column, so scoring cost per row must
    stay flat at 10x corpus; the re-rank is candidate-window-bounded
    (corpus-size-free for a fixed window).

Run: python scripts/scale_probe_r13.py   (quiet host)
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from formula1_data_pipeline_spark import get_spark  # noqa: E402

SF1 = "/root/testdata/sf0.001"


def _t(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 2), out


def blowup_docs(spark, n):
    d = spark.read.parquet(f"{SF1}/documents.parquet") \
        .select("doc_id", "text")
    out = d
    for i in range(1, n):
        out = out.unionByName(
            d.select((F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                     "text"))
    return out


def blowup_emb(spark, n):
    e = spark.read.parquet(f"{SF1}/embeddings.parquet") \
        .select("vec_id", "embedding")
    out = e
    for i in range(1, n):
        out = out.unionByName(
            e.select((F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                     "embedding"))
    return out


def probe_stream_bm25(spark):
    from formula1_data_pipeline_spark.operators.retrieval import (
        bm25_index_append,
    )
    from formula1_data_pipeline_spark.streaming.bm25 import (
        stream_bm25_index,
    )

    print("== stream_bm25_index: append cost vs landed index size ==")
    batch = blowup_docs(spark, 1).select(
        (F.col("doc_id") + 777_000_000).alias("doc_id"), "text")
    for nx in (1, 4, 10):
        with tempfile.TemporaryDirectory() as tmp:
            src = f"{tmp}/src.parquet"
            blowup_docs(spark, nx).write.parquet(src)
            t_build, idx = _t(lambda: stream_bm25_index(
                spark, src, n_source_files=3,
                work_dir=f"{tmp}/w"))
            t_app, n_new = _t(lambda: bm25_index_append(
                spark, batch, idx))
            t_redeliver, n_re = _t(lambda: bm25_index_append(
                spark, batch, idx))
            print(f"  corpus {nx:>2}x: stream-build {t_build:6.2f}s  "
                  f"fixed-batch append {t_app:5.2f}s ({n_new} new)  "
                  f"re-delivery {t_redeliver:5.2f}s ({n_re} new)")


def probe_pq(spark):
    from formula1_data_pipeline_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )

    print("== pq: encode + ADC search vs corpus size ==")
    base = blowup_emb(spark, 1)
    books = train_pq_codebooks(base, dim=64, m=8, k=16, n_iter=2)
    q = base.filter(F.col("vec_id") < 10)
    for nx in (1, 4, 10):
        corpus = blowup_emb(spark, nx)
        n = corpus.count()
        t_enc, _ = _t(lambda: pq_encode(
            corpus, "embedding", books).agg(
            F.sum(F.element_at("pq", 1))).collect())
        t_adc, _ = _t(lambda: pq_adc_topk(
            corpus, q, books, dim=64, k=5,
            n_candidates=50).collect())
        print(f"  corpus {nx:>2}x ({n} vecs): encode {t_enc:5.2f}s  "
              f"adc_topk(window=50) {t_adc:5.2f}s")


if __name__ == "__main__":
    spark = get_spark(app_name="scale_probe_r13")
    probe_stream_bm25(spark)
    probe_pq(spark)
