"""Count-Min sketch (operators/sketch.py) — property tests against
the exact groupBy baseline: the overestimate invariant (est >= true,
always), the heavy-hitter superset contract (no false negatives at
any width, exercised at a deliberately tiny width so collisions
actually inflate), merge distributivity, and partitioning
invariance."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators import sketch as S


def _grams(spark, rows):
    return spark.createDataFrame([(g,) for g in rows], "gram string")


@pytest.fixture(scope="module")
def corpus(spark):
    # Zipf-ish occurrence stream: gram g{i} appears (40 - i) times
    rows = [f"g{i}" for i in range(40) for _ in range(40 - i)]
    return _grams(spark, rows).cache()


def _exact(corpus):
    return {
        r["gram"]: r["n"]
        for r in corpus.groupBy("gram").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }


def test_estimate_never_undercounts(spark, corpus):
    exact = _exact(corpus)
    counters = S.cms_counters(corpus, "gram", d=4, w_bits=4)
    est = {
        r["gram"]: r["est_count"]
        for r in S.cms_probe(
            corpus.select("gram").distinct(), "gram", counters,
            d=4, w_bits=4,
        ).collect()
    }
    assert set(est) == set(exact)
    assert all(est[g] >= exact[g] for g in exact)
    # 40 grams into 2^4 buckets: collisions must inflate SOMETHING,
    # otherwise the width isn't exercising the overestimate path
    assert any(est[g] > exact[g] for g in exact)


def test_unseen_gram_estimates_zero_at_full_width(spark, corpus):
    counters = S.cms_counters(corpus, "gram", d=4, w_bits=20)
    probe = _grams(spark, ["never-seen-gram"])
    [row] = S.cms_probe(probe, "gram", counters, d=4,
                        w_bits=20).collect()
    assert row["est_count"] == 0


def test_heavy_hitters_superset_and_exact_counts(spark, corpus):
    exact = _exact(corpus)
    T = 25
    out = {
        r["gram"]: (r["n_occurrences"], r["est_count"], r["is_heavy"])
        for r in S.heavy_hitters(corpus, "gram", threshold=T,
                                 d=4, w_bits=4).collect()
    }
    true_heavy = {g for g, n in exact.items() if n >= T}
    # superset: every true heavy gram survives the prefilter
    assert true_heavy <= set(out)
    for g, (n, est, heavy) in out.items():
        assert n == exact[g]          # exact pass is exact
        assert est >= n               # sketch never undercounts
        assert heavy == (n >= T)      # verdict is the exact one
    # the tiny width must also produce at least one collision-born
    # near-miss row (est >= T but exact < T) — the FP path exercised
    assert any(not heavy for (_, _, heavy) in out.values())


def test_merge_equals_one_shot(spark, corpus):
    a = _grams(spark, [f"g{i}" for i in range(10)] * 3)
    b = _grams(spark, [f"g{i}" for i in range(5, 15)] * 2)
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in S.cms_merge(
            S.cms_counters(a, "gram", d=3, w_bits=6),
            S.cms_counters(b, "gram", d=3, w_bits=6),
        ).collect()
    }
    oneshot = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in S.cms_counters(a.unionByName(b), "gram",
                                d=3, w_bits=6).collect()
    }
    assert merged == oneshot


def test_partitioning_invariance(spark, corpus):
    base = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in S.cms_counters(corpus, "gram", d=4,
                                w_bits=8).collect()
    }
    shuffled = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in S.cms_counters(corpus.repartition(13), "gram",
                                d=4, w_bits=8).collect()
    }
    assert base == shuffled


def test_corpus_heavy_ngrams_matches_exact_bigrams(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the quick brown dog"),
            (2, "the quick brown fox sleeps"),
            (3, "lorem ipsum dolor sit amet the quick brown"),
            (4, None),
            (5, "single"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["gram"]: r["n_occurrences"]
        for r in S.corpus_heavy_ngrams(
            docs, n=2, threshold=3, w_bits=16).collect()
        if r["is_heavy"]
    }
    exact = {
        r["gram"]: r["n"]
        for r in S.gram_occurrences(docs, 2).groupBy("gram").agg(
            F.count(F.lit(1)).alias("n")).collect()
        if r["n"] >= 3
    }
    assert out == exact
    assert out["the quick"] == 4 and out["quick brown"] == 4
