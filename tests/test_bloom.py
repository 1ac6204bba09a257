"""Distributed Bloom filter (operators/bloom.py): parity with a
bit-for-bit Python reference, the no-false-negative guarantee, and
deterministic false positives under a deliberately small filter."""

from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.bloom import (
    N_BITS,
    N_HASHES,
    bloom_build,
    bloom_contains,
    bloom_contamination,
)


def _positions(h, m, k):
    h1 = h % m
    h2 = (h >> 20) % (m - 1) + 1
    return [(h1 + j * h2) % m for j in range(k)]


def _ref_words(hashes, m, k):
    words = {}
    for h in hashes:
        for p in _positions(h, m, k):
            words[p // 63] = words.get(p // 63, 0) | (1 << (p % 63))
    return words


def _ref_member(h, words, m, k):
    return all(
        words.get(p // 63, 0) & (1 << (p % 63)) for p in _positions(h, m, k)
    )


def test_build_matches_reference_words(spark):
    hashes = [(i * 2654435761) % (1 << 60) for i in range(200)]
    df = spark.createDataFrame([(h,) for h in hashes], "h long")
    got = {r.word_idx: r.bits for r in bloom_build(df).collect()}
    assert got == _ref_words(set(hashes), N_BITS, N_HASHES)


def test_no_false_negatives_and_deterministic_fps_small_filter(spark):
    """With a small (2^10) filter, false positives MUST occur and
    must match the reference bit-for-bit — the property that makes
    the operator hash-gateable rather than bounds-gateable."""
    m = 1 << 10
    members = [(i * 2654435761) % (1 << 60) for i in range(300)]
    others = [(i * 40503 + 7) % (1 << 60) for i in range(2000)]
    mdf = spark.createDataFrame([(h,) for h in members], "h long")
    odf = spark.createDataFrame(
        [(i, h) for i, h in enumerate(others)], "id long, h long"
    )
    words_df = bloom_build(mdf, n_bits=m)
    flagged = {
        r.h for r in bloom_contains(odf, words_df, n_bits=m).collect()
    }
    words = _ref_words(set(members), m, N_HASHES)
    exp = {h for h in others if _ref_member(h, words, m, N_HASHES)}
    assert flagged == exp
    # every true member is flagged (no false negatives)
    m_flag = bloom_contains(
        mdf.select(F.col("h")), words_df, n_bits=m
    ).count()
    assert m_flag == len(set(members))
    # the small filter genuinely produces false positives
    assert exp - set(members), "filter too large for the FP probe"


def test_contamination_superset_of_exact(spark):
    """bloom_contaminated must be a superset of the exact
    broadcast-join check over real data — the prefilter contract."""
    from formula1_data_pipeline_spark.operators.text import (
        shingle_hashes_df,
    )
    from formula1_data_pipeline_spark.queries import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")["documents"]
    sh = shingle_hashes_df(docs)
    bench = sh.filter(F.col("id") % 97 == 0).select("h").distinct()
    corpus_docs = docs.filter(F.col("doc_id") % 97 != 0)
    # small filter so FPs can exist; superset must still hold
    out = bloom_contamination(corpus_docs, bench, n_bits=1 << 12)
    flagged = {
        r.doc_id for r in out.collect() if r.bloom_contaminated
    }
    exact = {
        r.id
        for r in sh.filter(F.col("id") % 97 != 0)
        .join(F.broadcast(bench), "h").select("id").distinct().collect()
    }
    assert exact <= flagged


def test_word_table_is_bounded_and_broadcast(spark):
    hashes = spark.range(5000).select(
        (F.col("id") * 982451653 % (1 << 60)).alias("h")
    )
    words = bloom_build(hashes, n_bits=1 << 10)
    assert words.count() <= (1 << 10) // 63 + 1
    probe = bloom_contains(
        spark.range(100).select(
            (F.col("id") * 7919 % (1 << 60)).alias("h")
        ),
        words,
        n_bits=1 << 10,
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_duplicate_input_rows_keep_no_false_negatives(spark):
    """A duplicated member row must still be flagged: the all-k-bits
    test counts DISTINCT probe indexes, so input duplication (which
    collapses into one group with 2k passing probe rows) cannot
    produce a false negative (regression for the round-10 review
    finding)."""
    members = [(i * 2654435761) % (1 << 60) for i in range(50)]
    mdf = spark.createDataFrame([(h,) for h in members], "h long")
    words = bloom_build(mdf, n_bits=1 << 12)
    dup = spark.createDataFrame(
        [(h,) for h in members for _ in range(2)], "h long"
    )
    flagged = {
        r.h for r in bloom_contains(dup, words, n_bits=1 << 12).collect()
    }
    assert flagged == set(members)
