"""10x scale probe for the Unigram-LM tokenizer
(operators/unigram.py, pre-staged for q98's r12 rider) — the SCALE.md
method: sf0.1 inputs blown up 10x, both sides cached, warm-plan
best-of-2, local[32].

Two axes, because the operator's documented scale shape is
"cost scales with VOCABULARY, not corpus" (the BPE word_freqs
discipline):

1. corpus 10x, distinct words constant — everything past the
   word-frequency aggregation should be FLAT;
2. distinct words 10x (suffix-derived synthetic words, same length
   distribution) — lattice construction + Viterbi + one EM E-step
   should be LINEAR in the word table.

Usage: python scripts/scale_probe_unigram.py  (quiet host; record in
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
from formula1_data_pipeline_spark.operators import unigram as U  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
VOCAB = 200


def word_table(docs):
    return (
        docs.select(F.explode(
            F.split(F.trim(F.lower("text")), r"\s+")).alias("w"))
        .filter((F.col("w") != "") & (F.length("w") <= U.MAX_WORD_LEN))
        .groupBy("w").agg(F.count("*").alias("freq"))
    )


def main():
    spark = get_spark(app_name="scale-probe-unigram")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d1 = docs.cache()
    d10 = blowup_10x(docs).cache()
    print("docs 1x/10x:", d1.count(), d10.count())

    w1 = word_table(d1).cache()
    w10c = word_table(d10).cache()   # corpus 10x: same distinct words
    # vocab 10x: 10 suffix variants of every word (length +1, still
    # bounded), freq carried — a genuinely larger lattice workload
    w10v = word_table(d1).select(
        F.explode(F.array(*[
            F.concat(F.col("w"), F.lit(str(i))) for i in range(10)
        ])).alias("w"),
        "freq",
    ).cache()
    print("words 1x / corpus10x / vocab10x:",
          w1.count(), w10c.count(), w10v.count())

    def full_pass(wt):
        vocab = U.seed_logprobs(U.seed_pieces(wt, VOCAB))
        U.viterbi_tokenize(wt, vocab).agg(
            F.sum("score"), F.sum(F.size("pieces"))).collect()

    def estep_pass(wt):
        vocab = U.seed_logprobs(U.seed_pieces(wt, VOCAB))
        exp_counts, ll = U._estep(wt, vocab, "w", "freq",
                                  U.MAX_PIECE_LEN)
        exp_counts.agg(F.sum("c")).collect()

    a = timed("seed+viterbi  words 1x", lambda: full_pass(w1))
    b = timed("seed+viterbi  corpus 10x (same words)",
              lambda: full_pass(w10c))
    c = timed("seed+viterbi  vocab 10x", lambda: full_pass(w10v))
    print(f"  corpus-10x ratio {b / a:.2f}  vocab-10x ratio {c / a:.2f}")

    a = timed("EM E-step     words 1x", lambda: estep_pass(w1))
    b = timed("EM E-step     corpus 10x (same words)",
              lambda: estep_pass(w10c))
    c = timed("EM E-step     vocab 10x", lambda: estep_pass(w10v))
    print(f"  corpus-10x ratio {b / a:.2f}  vocab-10x ratio {c / a:.2f}")


if __name__ == "__main__":
    main()
