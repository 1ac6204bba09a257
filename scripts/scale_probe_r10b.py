"""10x scale probe for the round-10 second-session operators
(winnowing fingerprints, exact grouped quantiles) — the SCALE.md
method: sf0.1 table unioned 10x with shifted ids, both sides cached,
warm-plan second-pass numbers, local[32].

Usage: python scripts/scale_probe_r10b.py   (quiet host; record in
SCALE.md)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from formula1_data_pipeline_spark import get_spark  # noqa: E402
from scripts._probe_common import blowup_10x, timed  # noqa: E402
from formula1_data_pipeline_spark.operators.quality import (  # noqa: E402
    grouped_quantiles,
)
from formula1_data_pipeline_spark.operators.text import (  # noqa: E402
    winnow_fingerprints_df,
)

SF_DIR = "/root/testdata/sf0.1"


def main():
    spark = get_spark(app_name="scale-probe-r10b")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d1 = docs.cache()
    d10 = blowup_10x(docs).cache()
    d1.count(), d10.count()

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    e1 = ev.cache()
    e10 = ev
    for i in range(9):
        e10 = e10.unionByName(
            ev.withColumn(
                "event_id", F.col("event_id") + F.lit((i + 1) * 10_000_000)
            )
        )
    e10 = e10.cache()
    e1.count(), e10.count()

    probs = [0.25, 0.5, 0.75, 0.95, 0.99]
    pairs = [
        ("winnow_fingerprints 1x",
         lambda: winnow_fingerprints_df(d1).count()),
        ("winnow_fingerprints 10x",
         lambda: winnow_fingerprints_df(d10).count()),
        ("grouped_quantiles 1x",
         lambda: grouped_quantiles(e1, "value", ["event_type"],
                                   probs).count()),
        ("grouped_quantiles 10x",
         lambda: grouped_quantiles(e10, "value", ["event_type"],
                                   probs).count()),
    ]
    times = {}
    for label, fn in pairs:
        times[label] = timed(label, fn)
    for op in ("winnow_fingerprints", "grouped_quantiles"):
        r = times[f"{op} 10x"] / times[f"{op} 1x"]
        print(f"{op}: 10x/1x = {r:.2f} (10.0 = perfectly linear)")


if __name__ == "__main__" and "--bloom" not in sys.argv:
    main()


def bloom_probe():
    """Corpus-10x probe for the Bloom contamination prefilter: the
    corpus side scales linearly (explode k + broadcast join), the
    word-table broadcast stays fixed-size however the benchmark
    grows."""
    from formula1_data_pipeline_spark.operators.bloom import (
        bloom_build, bloom_contamination,
    )
    from formula1_data_pipeline_spark.operators.text import (
        shingle_hashes_df,
    )

    spark = get_spark(app_name="scale-probe-r10b")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d1 = docs.cache()
    d10 = blowup_10x(docs).cache()
    d1.count(), d10.count()
    bench = (
        shingle_hashes_df(d1.filter(F.col("doc_id") % 97 == 0))
        .select("h").distinct().cache()
    )
    bench.count()
    t = {}
    for label, frame in (("1x", d1), ("10x", d10)):
        t[label] = timed(
            f"bloom_contamination corpus {label}",
            lambda frame=frame: bloom_contamination(
                frame.filter(F.col("doc_id") % 97 != 0), bench
            ).count(),
        )
    print(f"bloom corpus: 10x/1x = {t['10x'] / t['1x']:.2f}")
    # benchmark-10x: word table row count is capped regardless
    bench10 = bench
    for i in range(9):
        bench10 = bench10.unionByName(
            bench.select((F.col("h") + F.lit(i + 1)).alias("h"))
        )
    w1 = bloom_build(bench).count()
    w10 = bloom_build(bench10).count()
    print(f"bloom word-table rows: bench-1x {w1}, bench-10x {w10} "
          f"(cap {(1 << 20) // 63 + 1})")


if __name__ == "__main__" and "--bloom" in sys.argv:
    bloom_probe()
