"""10x scale probe for the round-11-session pre-staged operators
(priority_sample, hll sketch table, lexical_diversity_df) — the
SCALE.md method: sf0.1 documents unioned 10x with shifted ids, both
sides cached, warm-plan second-pass numbers, local[32].

What each probe must show:
  * priority_sample: cost tracks the SCAN (one TakeOrderedAndProject
    pass), flat in k for driver-sized k — no global sort appears.
  * hll_sketch_append: append cost tracks the BATCH, not the landed
    index (the bm25/vecindex delta invariant) — appending one batch
    to a 12-batch index costs the same as to a 1-batch index.
  * hll_distinct_estimates: query cost tracks the SKETCH TABLE
    (group-count x appends), not the corpus.
  * lexical_diversity_df: one explode + two partial-agg reductions,
    ~linear in corpus.

Usage: python scripts/scale_probe_r11c.py
Run on a quiet host; record results in SCALE.md.
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from formula1_data_pipeline_spark import get_spark
from formula1_data_pipeline_spark.operators.hll import (
    hll_distinct_estimates,
    hll_sketch_append,
)
from formula1_data_pipeline_spark.operators.sampling import (
    priority_sample,
)
from formula1_data_pipeline_spark.operators.text import (
    lexical_diversity_df,
)

SF_DIR = "/root/testdata/sf0.1"


def timed(label, fn, reps=2):
    best = None
    for _ in range(reps):  # warm-plan second pass is the number
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:48s} {best:7.2f}s (warm best of {reps})")
    return best


def main():
    spark = get_spark()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = docs
    for i in range(1, 10):
        big = big.unionByName(docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)))
    docs = docs.cache()
    big = big.cache()
    n1, n10 = docs.count(), big.count()
    print(f"docs 1x={n1} 10x={n10}")

    for label, d in (("1x", docs), ("10x", big)):
        timed(f"priority_sample k=1000 {label}", lambda d=d: priority_sample(
            d, F.col("n_chars").cast("double"), 1000).count())
    timed("priority_sample k=10000 10x", lambda: priority_sample(
        big, F.col("n_chars").cast("double"), 10000).count())

    for label, d in (("1x", docs), ("10x", big)):
        timed(f"lexical_diversity {label}", lambda d=d:
              lexical_diversity_df(d).count())

    # hll: append-cost flatness in index size
    scratch = tempfile.mkdtemp(prefix="hllprobe-")
    try:
        small = f"{scratch}/small"
        bigidx = f"{scratch}/big"
        batch = docs.withColumn("doc_id", F.col("doc_id") + 999_000_000)
        hll_sketch_append(spark, docs, small, ["source"], "doc_id")
        for i in range(12):
            hll_sketch_append(
                spark,
                docs.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)),
                bigidx, ["source"], "doc_id")
        timed("hll append -> 1-batch index", lambda: hll_sketch_append(
            spark, batch, small, ["source"], "doc_id"))
        timed("hll append -> 12-batch index", lambda: hll_sketch_append(
            spark, batch, bigidx, ["source"], "doc_id"))
        timed("hll estimates (12-batch index)", lambda:
              hll_distinct_estimates(spark, bigidx).count())
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
