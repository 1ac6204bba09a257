"""MMR diversity re-ranking (operators/mmr.py): greedy-reference
equality over the real embeddings table, diversity behavior on a
constructed redundant pool, determinism, and edge cases."""
from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.mmr import (
    candidate_pair_sims,
    mmr_rerank,
)

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    # Spark/DuckDB round() is HALF_UP; python's round is half-even —
    # they disagree exactly at the .xxxxx5 boundary
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na, nb = math.sqrt(sum(x * x for x in a)), \
        math.sqrt(sum(x * x for x in b))
    return _r6(d / (na * nb)) if na and nb else None


def _ref_mmr(qvec, cands, vecs, k, lam):
    """Pure-python greedy reference over (n_id, cos_sim) candidates —
    the EXACT decimal blend the operator computes (see mmr.py)."""
    lam_d = Decimal(str(lam))
    selected, out = [], []
    remaining = dict(cands)
    for r in range(1, k + 1):
        best = None
        for nid, cos in remaining.items():
            pen = max((_cos(vecs[nid], vecs[s]) for s in selected),
                      default=0.0)
            score_d = (lam_d * Decimal(repr(cos))
                       - (Decimal("1") - lam_d) * Decimal(repr(pen)))
            score = float(score_d)
            key = (-score_d, nid)
            if best is None or key < best[0]:
                best = (key, nid, cos, score)
        _, nid, cos, score = best
        out.append((nid, r, cos, score))
        selected.append(nid)
        del remaining[nid]
    return out


def test_matches_greedy_reference_on_corpus(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    got = mmr_rerank(emb, queries, k=5, pool=15, lam=0.7,
                     dim=64).collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append(
            (r["n_id"], r["mmr_rank"], r["cos_sim"], r["mmr_score"]))
    from formula1_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    cand = cosine_topk(emb, queries, k=15, dim=64).collect()
    pools: dict = {}
    for r in cand:
        pools.setdefault(r["q_id"], {})[r["n_id"]] = r["cos_sim"]
    assert set(by_q) == set(pools)
    for q, pool in pools.items():
        want = _ref_mmr(vecs[q], pool, vecs, 5, 0.7)
        got_q = sorted(by_q[q], key=lambda t: t[1])
        assert [t[0] for t in got_q] == [t[0] for t in want], q
        for (gn, gr, gc, gs), (wn, wr, wc, ws) in zip(got_q, want):
            assert (gn, gr) == (wn, wr)
            assert gc == pytest.approx(wc, abs=1e-9)
            assert gs == pytest.approx(ws, abs=1e-9)


def test_redundant_candidates_are_suppressed(spark):
    """Two near-identical top candidates: plain top-2 keeps both; MMR
    at any diversity weight > 0 picks the distinct third item second."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),           # query
        (1, [0.99, 0.14, 0.0, 0.0]),         # top candidate
        (2, [0.989, 0.148, 0.0, 0.0]),       # its near-clone
        (3, [0.7, -0.7, 0.1, 0.0]),          # distinct, lower cos
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    out = mmr_rerank(emb, emb.filter(F.col("vec_id") == 0),
                     k=2, pool=3, lam=0.5).collect()
    ranks = {r["mmr_rank"]: r["n_id"] for r in out}
    assert ranks[1] == 1 and ranks[2] == 3  # clone 2 suppressed
    # and rank-2's penalty actually bit: score < lam * cos
    r2 = [r for r in out if r["mmr_rank"] == 2][0]
    assert r2["mmr_score"] < 0.5 * r2["cos_sim"]


def test_pair_sims_are_pool_bounded_and_symmetric(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    from formula1_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    cand = cosine_topk(emb, queries, k=10, dim=64) \
        .select("q_id", "n_id", "cos_sim")
    ps = candidate_pair_sims(emb, cand).collect()
    assert len(ps) == 3 * 10 * 9  # ordered pairs, no self
    sym = {(r["q_id"], r["a_id"], r["b_id"]): r["pair_sim"]
           for r in ps}
    for (q, a, b), v in sym.items():
        assert sym[(q, b, a)] == v


def test_validation_errors(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="lambda"):
        mmr_rerank(emb, q, lam=1.5)
    with pytest.raises(ValueError, match="exceeds"):
        mmr_rerank(emb, q, k=30, pool=10)


def test_lambda_one_is_plain_relevance_order(spark):
    """lam=1 disables the penalty: MMR order == cosine order."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    got = {(r["q_id"], r["mmr_rank"]): r["n_id"]
           for r in mmr_rerank(emb, q, k=4, pool=10, lam=1.0,
                               dim=64).collect()}
    from formula1_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    want = {(r["q_id"], r["rank"]): r["n_id"]
            for r in cosine_topk(emb, q, k=4, dim=64).collect()}
    assert got == want
