"""Round-12 scale probe: ivf_index_append cost vs landed-index size
under RANDOM ingestion ids (the adversarial case for id-range
manifest pruning — verdict item #2).

Builds two indexes with md5-scrambled (effectively random) ids at 1x
and 12x corpus size, then measures a fresh 2k-vector append against
each, twice:

  * bloom    — the landed-id Bloom sidecar path (this round): fresh
               ids miss the broadcast filter and the landed lists are
               never read. Expected FLAT vs index size.
  * legacy   — the sidecar removed (pre-r12 behavior): the skip
               anti-join reads the landed lists pruned only by the
               batch's id RANGE, which under random ids spans the
               whole domain. Expected to GROW with index size.

Run: python scripts/scale_probe_r12.py  (quiet host; local[32])
Numbers land in SCALE.md round-12 section.
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
from formula1_data_pipeline_spark.operators.vecindex import (
    ivf_index_append,
    ivf_index_build,
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
    # default auto-sizing (64x built ids -> fp ~1e-5): a fresh batch
    # expects ~0 hits, so the append reads nothing landed
    ivf_index_build(spark, scrambled(spark, n), d, n_centroids=16,
                    n_iter=2, id_col="vec_id", vec_col="embedding")
    # grow by appends so the landed-id state is multi-segment (the
    # deployment shape the range prune has to contend with)
    for b in range(4):
        ivf_index_append(
            spark, scrambled(spark, n // 4,
                             offset=1_000_000 + b * (n // 4)),
            d, id_col="vec_id", vec_col="embedding")
    return d


def timed_append(spark, idx, offset):
    t0 = time.time()
    n = ivf_index_append(spark, scrambled(spark, BATCH, offset=offset),
                         idx, id_col="vec_id", vec_col="embedding")
    dt = time.time() - t0
    assert n == BATCH, n
    return dt


def main():
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="probe_r12_")
    try:
        small = build_index(spark, BASE, root)
        big = build_index(spark, 12 * BASE, root)
        print(f"index sizes: {2 * BASE} vs {2 * 12 * BASE} landed "
              f"vectors (build + 4 appends each)")
        for label, idx in (("1x", small), ("12x", big)):
            dt = timed_append(spark, idx, offset=5_000_000)
            print(f"bloom  append @{label}: {dt:6.2f}s")
        for label, idx in (("1x", small), ("12x", big)):
            shutil.rmtree(f"{idx}/idbloom")
            dt = timed_append(spark, idx, offset=6_000_000)
            print(f"legacy append @{label}: {dt:6.2f}s")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
