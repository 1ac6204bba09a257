"""Reproducible probes for the third-session late additions —
rp_topk (plan-shape A/B crossover vs the exact scan), the Gram mart
(append flat vs mart size), and dataset_diff (join-shaped, flat at
10x). The SCALE.md addendum tables for this session were produced by
these exact code paths run inline; this script re-runs them.

Method: sf0.1 tables unioned 10x with shifted ids, both sides
cached, warm best-of-2 numbers, local[32], quiet host.

Usage: python scripts/scale_probe_r11e.py
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from formula1_data_pipeline_spark import get_spark
from formula1_data_pipeline_spark.operators import dimred as DR
from formula1_data_pipeline_spark.operators.diff import dataset_diff
from formula1_data_pipeline_spark.operators.similarity import (
    cosine_topk,
)

SF_DIR = "/root/testdata/sf0.1"


def timed(label, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:52s} {best:7.2f}s (warm best of {reps})")
    return best


def x10(df, id_col):
    out = df
    for i in range(1, 10):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000)))
    return out.cache()


def main():
    spark = get_spark()
    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    emb1.count()
    emb10 = x10(emb1, "vec_id")
    print(f"emb 1x={emb1.count()} 10x={emb10.count()}")

    # --- rp_topk crossover vs exact --------------------------------
    for nq in (10, 100, 500):
        q = emb1.filter(F.col("vec_id") < nq)
        timed(f"rp_topk 10x corpus, {nq} queries",
              lambda q=q: DR.rp_topk(emb10, q, d=64, k_proj=16,
                                     n_candidates=30, top_k=5)
              .collect())
        timed(f"exact cosine_topk 10x corpus, {nq} queries",
              lambda q=q: cosine_topk(emb10, q, k=5).collect())

    # --- gram mart: append flat vs mart size -----------------------
    batch = emb1.filter(F.col("vec_id") % 12 == 0).cache()
    batch.count()
    with tempfile.TemporaryDirectory() as td:
        DR.gram_mart_append(spark, emb1.filter(F.col("vec_id") % 12 == 1),
                            f"{td}/small", "embedding", 64, "seed")
        for b in range(12):
            DR.gram_mart_append(
                spark, emb1.filter(F.col("vec_id") % 12 == b),
                f"{td}/big", "embedding", 64, f"s{b}")
        timed("gram_mart_append -> 1-batch mart",
              lambda: DR.gram_mart_append(
                  spark, batch, f"{td}/small", "embedding", 64,
                  f"p{time.time_ns()}"), reps=3)
        timed("gram_mart_append -> 12-batch mart",
              lambda: DR.gram_mart_append(
                  spark, batch, f"{td}/big", "embedding", 64,
                  f"p{time.time_ns()}"), reps=3)
        timed("gram_from_mart, ~15-segment mart",
              lambda: DR.gram_from_mart(spark, f"{td}/big", 64))

    # --- dataset_diff 10x ------------------------------------------
    d1 = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
          .select("doc_id", "source", "text", "n_chars").cache())
    d1.count()
    d10 = x10(d1, "doc_id")
    d10.count()

    def mutate(df):
        return df.filter(F.col("doc_id") % 11 != 0).withColumn(
            "n_chars",
            F.when(F.col("doc_id") % 7 == 0, F.col("n_chars") + 1)
            .otherwise(F.col("n_chars")))

    timed("dataset_diff 1x (5k docs)",
          lambda: dataset_diff(d1, mutate(d1), ["doc_id"]).count())
    timed("dataset_diff 10x (50k docs)",
          lambda: dataset_diff(d10, mutate(d10), ["doc_id"]).count())

    spark.stop()


if __name__ == "__main__":
    main()
