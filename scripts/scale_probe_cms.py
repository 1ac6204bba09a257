"""10x scale probe for the Count-Min heavy-hitter tier
(operators/sketch.py) — the SCALE.md method: sf0.1 documents unioned
10x with shifted ids, both sides cached, warm-plan best-of-2,
local[32].

The scale INVARIANT to measure directly (the Bloom word-table
analogue): the counter table stays bounded at d * 2^w_bits rows as
the corpus grows, while the exact path's distinct-gram shuffle grows
with the corpus.

Usage: python scripts/scale_probe_cms.py  (quiet host; record in
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
from formula1_data_pipeline_spark.operators import sketch as S  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
W_BITS = 12
D = 4


def main():
    spark = get_spark(app_name="scale-probe-cms")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d1 = docs.cache()
    d10 = blowup_10x(docs).cache()
    print("docs 1x/10x:", d1.count(), d10.count())

    # the bounded-state invariant: counter rows vs corpus size
    for label, d in [("1x", d1), ("10x", d10)]:
        occ = S.gram_occurrences(d, 2)
        n_counter = S.cms_counters(occ, "gram", D, W_BITS).count()
        print(f"counter rows {label}: {n_counter} "
              f"(cap {D * (1 << W_BITS)}); "
              f"occurrences {occ.count()}")

    # end-to-end heavy hitters, threshold scaled with the corpus so
    # the target set is comparable
    a = timed("corpus_heavy_ngrams 1x (T=40)",
              lambda: S.corpus_heavy_ngrams(
                  d1, 2, 40, w_bits=W_BITS).count())
    b = timed("corpus_heavy_ngrams 10x (T=400)",
              lambda: S.corpus_heavy_ngrams(
                  d10, 2, 400, w_bits=W_BITS).count())
    print(f"  10x ratio {b / a:.2f}")


if __name__ == "__main__":
    main()
