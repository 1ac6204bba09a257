"""Round-12 probe C: phase-level timing of the Bloom-sidecar append
under random ids at 1x vs 12x landed index — which phase grows?"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from formula1_data_pipeline_spark import get_spark  # noqa: E402
from formula1_data_pipeline_spark.operators import vecindex as V  # noqa: E402
from formula1_data_pipeline_spark.operators.bloom import (  # noqa: E402
    bloom_contains,
)

DIM = 16
BATCH = 2_000
BASE = 20_000


def scrambled(spark, n, offset=0):
    return spark.range(offset, offset + n).select(
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15),
               16, 10).cast("long").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: (F.pmod(F.xxhash64(F.col("id") * 31 + i), 997)
                       .cast("double") / 997.0),
        ).alias("embedding"),
    )


def build_index(spark, n, root):
    d = f"{root}/idx_{n}"
    V.ivf_index_build(spark, scrambled(spark, n), d, n_centroids=16,
                      n_iter=2, id_col="vec_id", vec_col="embedding")
    for b in range(4):
        V.ivf_index_append(
            spark, scrambled(spark, n // 4,
                             offset=1_000_000 + b * (n // 4)),
            d, id_col="vec_id", vec_col="embedding")
    return d


def phases(spark, idx, offset):
    t = V._tables(idx)
    out = {}
    t0 = time.perf_counter()
    V._check_consistent(spark, idx)
    out["consistent"] = time.perf_counter() - t0

    batch = scrambled(spark, BATCH, offset=offset)
    t0 = time.perf_counter()
    merged, n_bits = V._landed_id_bloom(spark, t["idbloom"])
    merged = merged.persist()
    merged.count()
    out["merge_read"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ids = batch.select("vec_id").distinct().withColumn(
        "h", V._id_hash(F.col("vec_id")))
    nh = bloom_contains(ids, merged, "h", n_bits=n_bits).count()
    out["probe"] = time.perf_counter() - t0
    out["n_hits"] = nh

    t0 = time.perf_counter()
    rows = V._assign_rows(batch, V._read_centroids(spark, idx), 1,
                          "vec_id", "embedding")
    rows.persist().count()
    out["assign"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from formula1_data_pipeline_spark.sources.txn import txn_append
    V._append_id_bloom(spark, rows.select("id").distinct(),
                       t["idbloom"], n_bits)
    out["bloom_append"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    txn_append(spark, rows, t["lists"], key="cluster",
               stats_cols=["id"])
    out["lists_append"] = time.perf_counter() - t0
    merged.unpersist()
    rows.unpersist()
    return out


def main():
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="probe_r12c_")
    try:
        small = build_index(spark, BASE, root)
        big = build_index(spark, 12 * BASE, root)
        for label, idx in (("1x", small), ("12x", big)):
            p = phases(spark, idx, offset=5_000_000)
            print(label, {k: (round(v, 2) if isinstance(v, float)
                              else v) for k, v in p.items()},
                  flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
