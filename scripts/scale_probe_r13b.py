"""Round-13 probe B: 10x scale shapes for the late-round operators:

  * ivf_index_pq_topk vs ivf_index_topk — same probed cells, so the
    comparison isolates the candidate-stage representation: ADC over
    the pruned (cluster, id, pq) columns vs exact cosine over the
    float vectors. Expect the PQ path's advantage to GROW with
    corpus size (candidate stage reads 32x fewer bytes and does m
    lookups instead of d-mult dots per row).
  * semantic_contamination — benchmark side fixed (eval sets don't
    grow with the corpus), corpus blown up 1x/4x/10x. Expect
    ~linear wall in corpus rows (one bucketing pass + broadcast
    join), never benchmark-corpus quadratic.

Run: python scripts/scale_probe_r13b.py   (quiet host)
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


def blowup_emb(spark, n):
    e = spark.read.parquet(f"{SF1}/embeddings.parquet") \
        .select("vec_id", "embedding")
    out = e
    for i in range(1, n):
        out = out.unionByName(
            e.select((F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                     "embedding"))
    return out


def probe_ivfpq(spark):
    from formula1_data_pipeline_spark.operators.pq import (
        train_pq_codebooks,
    )
    from formula1_data_pipeline_spark.operators.vecindex import (
        ivf_index_build,
        ivf_index_pq_topk,
        ivf_index_topk,
    )

    print("== ivf_index_pq_topk vs ivf_index_topk (same cells) ==")
    books = train_pq_codebooks(blowup_emb(spark, 1), dim=64, m=8,
                               k=16, n_iter=2)
    for nx in (1, 4, 10):
        corpus = blowup_emb(spark, nx)
        q = corpus.filter(F.col("vec_id") < 10)
        with tempfile.TemporaryDirectory() as tmp:
            idx = f"{tmp}/idx"
            ivf_index_build(spark, corpus, idx, n_centroids=16,
                            n_iter=2, pq_codebooks=books)
            t_ivf, _ = _t(lambda: ivf_index_topk(
                spark, idx, q, k=5, n_probe=4).collect())
            t_pq, _ = _t(lambda: ivf_index_pq_topk(
                spark, idx, q, k=5, n_probe=4,
                n_candidates=50).collect())
            print(f"  corpus {nx:>2}x: ivf_index_topk {t_ivf:6.2f}s  "
                  f"ivf_index_pq_topk {t_pq:6.2f}s")


def probe_semantic(spark):
    from formula1_data_pipeline_spark.operators.similarity import (
        semantic_contamination,
    )

    print("== semantic_contamination: fixed benchmark, growing corpus ==")
    bench = (
        spark.read.parquet(f"{SF1}/embeddings.parquet")
        .filter(F.col("vec_id") % 17 == 0)
        .select((F.col("vec_id") + 9_000_000).alias("bench_id"),
                F.transform("embedding",
                            lambda x: x.cast("double")).alias("embedding"))
    )
    for nx in (1, 4, 10):
        corpus = blowup_emb(spark, nx)
        n = corpus.count()
        t, rows = _t(lambda: semantic_contamination(
            corpus, bench, dim=64, threshold=0.9).count())
        print(f"  corpus {nx:>2}x ({n} vecs): {t:6.2f}s "
              f"({rows} report rows)")


if __name__ == "__main__":
    spark = get_spark(app_name="scale_probe_r13b")
    probe_ivfpq(spark)
    probe_semantic(spark)
