"""Unit tests for the round-10 pre-staged operators: the stupid-
backoff bigram LM (operators/lm.py) and BM25 top-k retrieval
(operators/retrieval.py) — each checked row-for-row against an
explicit pure-Python reference implementation on synthetic corpora,
plus the structural edge cases (short docs, OOV, tie-breaks)."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.lm import (
    BACKOFF_DEN,
    BACKOFF_NUM,
    bigrams,
    score_ngram_lm,
    train_ngram_lm,
)
from formula1_data_pipeline_spark.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ---------------------------------------------------------------------------
# bigram LM
# ---------------------------------------------------------------------------

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ate the fish"),
    (3, "a dog sat on a log"),
    (4, "THE  Cat   sat "),           # casing + whitespace normalize
    (5, "zz qq zz qq zz"),            # fully out-of-reference
    (6, "solo"),                      # 1 token -> no bigrams
    (7, "   "),                       # 0 tokens
]
REF_IDS = {1, 2, 3}                   # the reference (training) slice


def _py_tokens(text):
    return [t for t in text.strip().lower().split() if t]


def _py_model():
    uni, big, total = Counter(), Counter(), 0
    for i, text in CORPUS:
        if i not in REF_IDS:
            continue
        toks = _py_tokens(text)
        uni.update(toks)
        total += len(toks)
        big.update(zip(toks, toks[1:]))
    return uni, big, total


def test_bigrams_expression(spark):
    got = {
        r["doc_id"]: r["pairs"]
        for r in _docs(spark, CORPUS)
        .select("doc_id", bigrams(F.col("text")).alias("pairs"))
        .collect()
    }
    for i, text in CORPUS:
        toks = _py_tokens(text)
        want = [
            {"w1": a, "w2": b} for a, b in zip(toks, toks[1:])
        ] or None  # <2 tokens -> NULL by contract (explodes to 0 rows)
        got_i = (
            None
            if got[i] is None
            else [r.asDict() for r in got[i]]
        )
        assert got_i == want, f"doc {i}"


def test_train_counts_match_reference(spark):
    uni, big, total = _py_model()
    model = train_ngram_lm(
        _docs(spark, CORPUS), F.col("doc_id").isin(*REF_IDS)
    )
    got_uni = {r["w"]: r["c1"] for r in model["unigrams"].collect()}
    got_big = {
        (r["w1"], r["w2"]): r["c2"] for r in model["bigrams"].collect()
    }
    assert got_uni == dict(uni)
    assert got_big == dict(big)
    assert model["totals"].collect()[0]["n_ref_tokens"] == total


def test_score_matches_reference(spark):
    uni, big, total = _py_model()
    docs = _docs(spark, CORPUS)
    model = train_ngram_lm(docs, F.col("doc_id").isin(*REF_IDS))
    out = {r["doc_id"]: r for r in score_ngram_lm(docs, model).collect()}
    assert set(out) == {i for i, _ in CORPUS}  # one row per INPUT doc

    for i, text in CORPUS:
        toks = _py_tokens(text)
        pairs = list(zip(toks, toks[1:]))
        r = out[i]
        n_hits = sum(1 for p in pairs if p in big)
        n_miss = len(pairs) - n_hits
        assert r["n_bigrams"] == len(pairs)
        assert r["n_hits"] == n_hits
        assert r["n_oov"] == sum(1 for _, w2 in pairs if w2 not in uni)
        if not pairs:
            assert r["hit_rate"] is None and r["quality_bucket"] is None
            continue
        assert r["hit_rate"] == round(n_hits / len(pairs), 6)
        if n_hits:
            num = sum(big[p] for p in pairs if p in big)
            den = sum(uni[p[0]] for p in pairs if p in big)
            assert r["cond_score"] == round(num / den, 6)
        else:
            assert r["cond_score"] is None
        if n_miss:
            mnum = sum(uni.get(w2, 0) for p in pairs if p not in big
                       for w2 in [p[1]])
            assert r["backoff_score"] == round(
                BACKOFF_NUM * mnum / (BACKOFF_DEN * total * n_miss), 6
            )
        else:
            assert r["backoff_score"] is None
        want_bucket = (
            "head" if 2 * n_hits >= len(pairs)
            else "middle" if 5 * n_hits >= len(pairs)
            else "tail"
        )
        assert r["quality_bucket"] == want_bucket


def test_score_buckets_separate_garbled_text(spark):
    """The word-order property the unigram filters can't see: a
    shuffled permutation of reference text keeps its unigrams but
    loses its bigrams, so the LM buckets it strictly below the
    original."""
    docs = _docs(spark, CORPUS)
    model = train_ngram_lm(docs, F.col("doc_id").isin(*REF_IDS))
    probe = _docs(
        spark,
        [(100, "the cat sat on the mat"),      # verbatim reference
         (101, "mat the on sat cat the"),      # same bag, shuffled
         (102, "zz qq zz qq zz")],             # fully OOV
    )
    out = {r["doc_id"]: r for r in score_ngram_lm(probe, model).collect()}
    assert out[100]["quality_bucket"] == "head"
    assert out[100]["hit_rate"] > out[101]["hit_rate"]
    assert out[102]["quality_bucket"] == "tail"
    assert out[102]["n_hits"] == 0 and out[102]["n_oov"] == 4


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

BM_CORPUS = [
    (1, "apple banana apple cherry"),
    (2, "apple apple apple apple apple apple"),   # saturation case
    (3, "banana cherry date elderberry fig grape kiwi lemon"),
    (4, "apple"),                                 # short doc, high tf share
    (5, "unrelated words only here"),
]


def _py_bm25(corpus, query, k1=6 / 5, b=3 / 4):
    docs = {i: _py_tokens(t) for i, t in corpus}
    docs = {i: t for i, t in docs.items() if t}
    n = len(docs)
    total = sum(len(t) for t in docs.values())
    avgdl = total / n
    dfreq = Counter()
    for t in docs.values():
        dfreq.update(set(t))
    scores = {}
    for i, t in docs.items():
        tf = Counter(t)
        s = 0.0
        m = 0
        for term in dict.fromkeys(_py_tokens(query)):
            if term not in tf:
                continue
            m += 1
            idf = (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5)
            tfn = (tf[term] * (k1 + 1)) / (
                tf[term] + k1 * (1 - b + b * len(t) / avgdl)
            )
            s += round(idf * tfn, 6)
        if m:
            scores[i] = (round(s, 6), m)
    return scores


def test_bm25_matches_reference(spark):
    docs = _docs(spark, BM_CORPUS)
    q = spark.createDataFrame(
        [("q1", "apple cherry"), ("q2", "fig unrelated"),
         ("q3", "absent-term")],
        ["query_id", "query_text"],
    )
    got = bm25_topk(docs, q, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, qtext in [("q1", "apple cherry"), ("q2", "fig unrelated")]:
        want = _py_bm25(BM_CORPUS, qtext)
        rows = {r["doc_id"]: r for r in by_q[qid]}
        assert set(rows) == set(want), qid
        for i, (s, m) in want.items():
            assert math.isclose(rows[i]["score"], s, abs_tol=2e-6), (qid, i)
            assert rows[i]["n_terms_matched"] == m
        # rank = (score desc, doc_id asc) over the recomputed scores
        order = sorted(want, key=lambda i: (-want[i][0], i))
        got_order = [
            r["doc_id"] for r in sorted(by_q[qid], key=lambda r: r["rank"])
        ]
        assert got_order == order, qid
    assert "q3" not in by_q  # no posting -> no candidate rows at all


def test_bm25_topk_truncates_and_saturates(spark):
    docs = _docs(spark, BM_CORPUS)
    q = spark.createDataFrame([("q", "apple")], ["query_id", "query_text"])
    top2 = bm25_topk(docs, q, k=2).collect()
    assert [r["rank"] for r in sorted(top2, key=lambda r: r["rank"])] == [1, 2]
    # saturation: doc 2's tf=6 must NOT dominate linearly — the short
    # doc 4 (tf=1 but dl=1) outranks it under length normalization
    assert top2[0]["doc_id"] == 4 or top2[1]["doc_id"] == 4


def test_score_hit_rate_value_identical_to_general_path(spark):
    """score_hit_rate (the join-pruned path the curation chain uses)
    returns exactly the general path's (n_bigrams, n_hits, hit_rate)
    on every doc — and its plan carries ONE join against the model
    against the general path's three."""
    from pyspark.sql import functions as F

    from formula1_data_pipeline_spark.operators.lm import (
        score_hit_rate,
        score_ngram_lm,
        train_ngram_lm,
    )
    from formula1_data_pipeline_spark.queries import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")["documents"]
    model = train_ngram_lm(docs, F.col("doc_id") % 3 == 2)
    cols = ("n_bigrams", "n_hits", "hit_rate")
    full = {r["doc_id"]: tuple(r[c] for c in cols)
            for r in score_ngram_lm(docs, model).collect()}
    lite_df = score_hit_rate(docs, model)
    lite = {r["doc_id"]: tuple(r[c] for c in cols)
            for r in lite_df.collect()}
    assert lite == full
    plan = lite_df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= 2  # model join + doc-preserving join
