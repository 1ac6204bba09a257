"""10x scale probe for the third-session pre-staged operators
(aggmart, dimred) — the SCALE.md method: sf0.1 tables unioned 10x
with shifted ids, both sides cached, warm-plan second-pass numbers,
local[32].

What each probe must show:
  * agg_mart_append: append cost tracks the BATCH, not the landed
    mart (the bm25/vecindex delta invariant — the append path never
    reads the partials table, only the tiny commits markers).
  * agg_mart_stats: query cost tracks the PARTIALS TABLE (groups x
    segments, bounded back to groups by compaction), never the
    corpus.
  * random_project: one shuffle-free codegen'd corpus scan — 10x
    rows => ~10x wall inside scan constants, zero exchanges.
  * gram_matrix: one corpus pass whose SHUFFLE is corpus-size-free
    (n_tasks x 2080 partial cells); 10x rows => ~linear CPU, flat
    shuffle rows.

Usage: python scripts/scale_probe_r11d.py
Run on a quiet host; record results in SCALE.md.
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
from formula1_data_pipeline_spark.operators.aggmart import (
    agg_mart_append,
    agg_mart_compact,
    agg_mart_stats,
)
from formula1_data_pipeline_spark.operators.dimred import (
    gram_matrix,
    random_project,
)

SF_DIR = "/root/testdata/sf0.1"


def timed(label, fn, reps=2):
    best = None
    for _ in range(reps):  # warm-plan second pass is the number
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:52s} {best:7.2f}s (warm best of {reps})")
    return best


def main():
    spark = get_spark()
    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    n1 = docs1.count()
    docs10 = docs1
    for i in range(1, 10):
        docs10 = docs10.unionByName(
            docs1.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)))
    docs10 = docs10.cache()
    n10 = docs10.count()
    print(f"docs 1x={n1} 10x={n10}")

    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    e1 = emb1.count()
    emb10 = emb1
    for i in range(1, 10):
        emb10 = emb10.unionByName(
            emb1.withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)))
    emb10 = emb10.cache()
    e10 = emb10.count()
    print(f"emb 1x={e1} 10x={e10}")

    # --- aggmart: append flat vs landed-mart size -------------------
    with tempfile.TemporaryDirectory() as td:
        small = f"{td}/small"
        big = f"{td}/big"
        batch = docs1.filter(F.col("doc_id") % 12 == 0).cache()
        batch.count()
        agg_mart_append(spark, docs1.filter(F.col("doc_id") % 12 == 1),
                        small, ["source"], "n_chars", "seed")
        for b in range(12):
            agg_mart_append(
                spark, docs10.filter(F.col("doc_id") % 12 == b),
                big, ["source"], "n_chars", f"seed-{b}")
        timed("agg_mart_append -> 1-batch mart",
              lambda: agg_mart_append(spark, batch, small, ["source"],
                                      "n_chars", f"p{time.time_ns()}"),
              reps=3)
        timed("agg_mart_append -> 12-batch (10x corpus) mart",
              lambda: agg_mart_append(spark, batch, big, ["source"],
                                      "n_chars", f"p{time.time_ns()}"),
              reps=3)
        timed("agg_mart_stats, ~15-segment mart",
              lambda: agg_mart_stats(spark, big, ["source"]).collect(),
              reps=2)
        agg_mart_compact(spark, big)
        timed("agg_mart_stats, post-compaction",
              lambda: agg_mart_stats(spark, big, ["source"]).collect(),
              reps=2)

    # --- dimred ------------------------------------------------------
    timed("random_project k=16, 1x",
          lambda: random_project(emb1, "embedding", d=64, k=16)
          .agg(F.sum(F.element_at("proj", 1))).collect())
    timed("random_project k=16, 10x",
          lambda: random_project(emb10, "embedding", d=64, k=16)
          .agg(F.sum(F.element_at("proj", 1))).collect())
    plan = (random_project(emb10, "embedding", d=64, k=16)
            ._jdf.queryExecution().executedPlan().toString())
    print("random_project 10x plan exchanges:", plan.count("Exchange"))
    timed("gram_matrix d=64, 1x",
          lambda: gram_matrix(emb1, "embedding", 64))
    timed("gram_matrix d=64, 10x",
          lambda: gram_matrix(emb10, "embedding", 64))

    spark.stop()


if __name__ == "__main__":
    main()
