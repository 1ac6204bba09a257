"""Distributed Bloom filter — the 100 TB scale path for
benchmark-contamination checks.

The exact contamination check (q66, ``shingle_hashes_df`` +
broadcast semi-join) broadcasts the benchmark's DISTINCT shingle-hash
set. That is the right plan while the eval set is small, but the
broadcast grows linearly with the benchmark corpus: a consortium-size
held-out suite (millions of documents) is a multi-GB broadcast every
contamination pass repeats. The Bloom path caps the broadcast at a
fixed ``n_bits/8`` bytes (128 KiB at the 2^20 default) regardless of
benchmark size, at the price of a bounded, DETERMINISTIC
false-positive rate — flagged docs are a strict superset of the truly
contaminated (no false negatives: every true member's bits are set),
so the standard deployment is Bloom-prefilter -> exact re-check on
the tiny flagged stream.

Everything is integer/bit arithmetic on the SAME 60-bit md5 shingle
hashes the exact path uses, so the DuckDB oracle replays the filter
bit-for-bit — false positives included — and the gate is a full value
hash, not a bound. Bit positions come from Kirsch-Mitzenmacher double
hashing (pos_j = (h1 + j*h2) mod m, h2 forced odd-ish nonzero), the
standard trick that gets k independent-enough probes from one hash
without k md5 passes.

Build shape: explode k positions per distinct value, collapse to
(word_idx, bits) via ``bit_or`` — partial-aggregatable map-side, so
the shuffle is at most ``n_bits/63`` rows no matter how large the
benchmark is (63 usable bits per BIGINT word — see ``_WORD_BITS``).
Membership shape: explode k positions per corpus shingle,
broadcast-join the word table, count set bits; a shingle is flagged
iff all k bits are set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 1 << 20     # filter size in bits (~130 KiB of words)
N_HASHES = 4         # probes per value
_WORD_BITS = 63      # usable bits per BIGINT word: DuckDB's BIGINT <<
                     # overflows at shift 63 (sign bit), so both
                     # engines pack 63 bits/word and never touch it


def _positions(h, n_bits: int, n_hashes: int):
    """The k Kirsch-Mitzenmacher bit positions of 60-bit hash ``h``
    as column expressions (python-side loop, JVM-side math)."""
    h1 = h % n_bits
    h2 = (F.shiftright(h, 20) % (n_bits - 1)) + 1
    return [(h1 + F.lit(j) * h2) % n_bits for j in range(n_hashes)]


def bloom_build(values: DataFrame, value_col: str = "h",
                n_bits: int = N_BITS,
                n_hashes: int = N_HASHES) -> DataFrame:
    """(word_idx, bits) sparse Bloom words over the hashes in
    ``values[value_col]`` (60-bit longs, e.g. ``shingle_hashes_df``
    output). Sparse on purpose: absent words are zero, the broadcast
    ships only touched words, and ``bit_or`` partial aggregation
    collapses the build map-side before its single bounded shuffle.
    """
    pos = F.explode(F.array(
        *_positions(F.col(value_col), n_bits, n_hashes)
    )).alias("p")
    return (
        values.select(pos)
        .select(
            (F.col("p") / _WORD_BITS).cast("long").alias("word_idx"),
            # F.shiftleft's wrapper only takes a literal shift; the
            # column-shift needs the SQL form
            F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                   f"CAST(p % {_WORD_BITS} AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_contains(shingles: DataFrame, bloom_words: DataFrame,
                   value_col: str = "h", n_bits: int = N_BITS,
                   n_hashes: int = N_HASHES) -> DataFrame:
    """Filter ``shingles`` (any frame with a 60-bit ``value_col``) to
    the rows the Bloom filter flags (all k bits set). The word table
    broadcasts (bounded at n_bits/64 rows); the big side never
    shuffles — membership is explode(k) + broadcast-join + count.
    """
    probes = shingles.select(
        "*",
        F.posexplode(F.array(
            *_positions(F.col(value_col), n_bits, n_hashes)
        )).alias("_bj", "_bp"),
    ).select(
        "*",
        (F.col("_bp") / _WORD_BITS).cast("long").alias("word_idx"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), "
               f"CAST(_bp % {_WORD_BITS} AS INT))").alias("bit"),
    )
    group_cols = [c for c in shingles.columns]
    hits = (
        probes.join(F.broadcast(bloom_words), "word_idx")
        .filter((F.col("bits").bitwiseAND(F.col("bit"))) == F.col("bit"))
        .groupBy(*group_cols)
        # count DISTINCT probe index, not rows: duplicate input rows
        # collapse into one group with 2k passing rows, and a plain
        # count == k test would DROP a true member (a false negative
        # — the one failure the prefilter contract forbids). Output
        # is therefore one row per distinct flagged input row.
        .agg(F.count_distinct("_bj").alias("_set"))
        .filter(F.col("_set") == n_hashes)
        .drop("_set")
    )
    return hits


def bloom_contamination(docs: DataFrame, bench_hashes: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n_bits: int = N_BITS,
                        n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, n_bloom_hits, bloom_contaminated) per corpus doc: the
    Bloom-prefilter contamination verdicts — a deterministic SUPERSET
    of the exact check's (no false negatives), with the filter built
    from ``bench_hashes`` (a 1-column frame of 60-bit benchmark
    shingle hashes). Docs with no shingles report 0/false."""
    from formula1_data_pipeline_spark.operators.text import (
        shingle_hashes_df,
    )

    bloom = bloom_build(bench_hashes, bench_hashes.columns[0],
                        n_bits, n_hashes)
    corpus = shingle_hashes_df(docs, text_col, id_col)
    flagged = bloom_contains(corpus, bloom, "h", n_bits, n_hashes)
    hits = flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bloom_hits")
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
            (F.coalesce("n_bloom_hits", F.lit(0)) > 0)
            .alias("bloom_contaminated"),
        )
    )
