"""Maximal Marginal Relevance (MMR) diversity re-ranking — the
standard retrieval diversification step (Carbonell & Goldstein,
SIGIR'98) between ANN candidate generation and consumption: from each
query's relevance-ranked candidate pool, greedily pick the item
maximizing

    mmr = lambda * sim(query, d)  -  (1 - lambda) * max  sim(d, s)
                                               s in selected

so the result page is both relevant AND non-redundant. In a training
-data pipeline this is how retrieved exemplars / few-shot pools /
dedup-aware eval panels are assembled; it composes directly with this
repo's ANN tier (cosine_topk / ann_lsh_topk / ivf_index_topk /
rp_topk all emit the same (q_id, n_id, cos_sim, rank) shape the pool
stage consumes).

Spark shape — NO driver loop, NO Python row path:

* Pool stage: any top-``pool`` ANN operator. Corpus-sized work ends
  here; everything after is pool-sized (|Q| x pool rows).
* Pairwise candidate similarities: ONE self-join per query group
  (<= pool^2 rows per query, pool is tens) with vectors re-attached
  by broadcast — never a corpus-sized pairs shuffle (the rp_topk
  lesson).
* Greedy selection: ``k`` UNROLLED rounds of pure relational ops —
  anti-join the selected set, max-penalty via join + groupBy,
  argmax via one row_number window per round. Plan depth grows with
  ``k`` (small by contract: a result page), data size never.

Determinism (the kcenter/q24 discipline, plus the q39 DECIMAL
lesson): similarities are rounded to 6 dp BEFORE any comparison, and
the lambda blend runs in EXACT DECIMAL arithmetic — cos/penalty cast
to DECIMAL(18,6) (exact: they are 6-dp-rounded values), lambda
constrained to <= 3 decimal digits as DECIMAL(4,3) — so the mmr
score is an exact 9-dp decimal with NO float rounding anywhere. A
first draft rounded the double product instead and hit the
shortest-repr tie trap at sf0.01: Spark's round goes through
BigDecimal.valueOf (shortest decimal repr — "0.2600395" ties and
HALF_UPs to 0.26004) while DuckDB rounds the binary double
(0.26003949999... -> 0.260039). Exact decimals have no ties to
break. Every argmax breaks ties by ascending ``n_id``, so the full
selection trace value-hash-gates cross-engine, round for round.

LANDING ROUTE: rides q24's r14 re-gate (q24 owns the
vector-similarity surface; r12-gated, due r14) as kind='mmr' rows.
Draft: tests/test_r15_gate_drafts.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from formula1_data_pipeline_spark.operators.similarity import (
    _as_double,
    cosine_from_norms,
    cosine_topk,
    norm,
)


def candidate_pair_sims(corpus: DataFrame, cand: DataFrame,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        round_dp: int = 6) -> DataFrame:
    """(q_id, a_id, b_id, pair_sim) for every ordered pair of a
    query's candidates — the penalty table MMR maxes over. Vectors
    re-attach to the (tiny) candidate list by broadcast-joining the
    corpus projection; the pair join is per-query and pool-bounded.
    """
    vecs = corpus.select(
        F.col(id_col).alias("cid"),
        _as_double(F.col(vec_col)).alias("cvec"),
    ).withColumn("cnorm", norm(F.col("cvec")))
    cv = (cand.select("q_id", F.col("n_id").alias("cid"))
          .join(vecs, "cid")
          .select("q_id", F.col("cid"), "cvec", "cnorm"))
    a, b = cv.alias("a"), cv.alias("b")
    return (
        a.join(b, "q_id")
        .filter(F.col("a.cid") != F.col("b.cid"))
        .select(
            "q_id",
            F.col("a.cid").alias("a_id"),
            F.col("b.cid").alias("b_id"),
            F.round(
                cosine_from_norms(F.col("a.cvec"), F.col("b.cvec"),
                                  F.col("a.cnorm"), F.col("b.cnorm")),
                round_dp,
            ).alias("pair_sim"),
        )
    )


def mmr_rerank(corpus: DataFrame, queries: DataFrame, k: int = 5,
               pool: int = 20, lam: float = 0.7,
               id_col: str = "vec_id", vec_col: str = "embedding",
               dim: int | None = None,
               cand: DataFrame | None = None) -> DataFrame:
    """Top-``k`` MMR selection per query from a ``pool``-sized exact
    cosine candidate stage (pass ``cand`` with (q_id, n_id, cos_sim)
    to rerank any other ANN operator's pool instead). Output:
    (q_id, n_id, mmr_rank, cos_sim, mmr_score) — mmr_score of the
    rank-1 pick is its plain relevance (empty penalty set = 0 by
    the standard convention)."""
    from decimal import Decimal

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lambda must be in [0, 1]: {lam}")
    lam_d = Decimal(str(lam))
    if -lam_d.as_tuple().exponent > 3:
        raise ValueError(
            f"lambda must have <= 3 decimal digits for the exact "
            f"decimal blend: {lam}")
    if k > pool:
        raise ValueError(f"k={k} exceeds the candidate pool={pool}")
    if cand is None:
        cand = cosine_topk(corpus, queries, k=pool, id_col=id_col,
                           vec_col=vec_col, dim=dim)
    cand = cand.select("q_id", "n_id", "cos_sim").persist()
    pairs = candidate_pair_sims(corpus, cand, id_col, vec_col)
    pairs = pairs.persist()
    lam_lit = F.lit(str(lam_d)).cast("decimal(4,3)")
    one_m_lit = F.lit(str(Decimal("1") - lam_d)).cast("decimal(4,3)")
    cos_dec = F.col("cos_sim").cast("decimal(18,6)")
    try:
        picks: list[DataFrame] = []
        selected = None  # (q_id, n_id) accumulated
        w = Window.partitionBy("q_id")
        for r in range(1, k + 1):
            if selected is None:
                scored = cand.select(
                    "q_id", "n_id", "cos_sim",
                    (lam_lit * cos_dec).alias("mmr_dec"),
                )
            else:
                remaining = cand.join(selected, ["q_id", "n_id"],
                                      "left_anti")
                pen = (
                    pairs
                    .join(selected.withColumnRenamed("n_id", "b_id"),
                          ["q_id", "b_id"], "left_semi")
                    .groupBy("q_id", F.col("a_id").alias("n_id"))
                    .agg(F.max("pair_sim").alias("penalty"))
                )
                scored = (
                    remaining.join(pen, ["q_id", "n_id"], "left")
                    .select(
                        "q_id", "n_id", "cos_sim",
                        (
                            lam_lit * cos_dec
                            - one_m_lit
                            * F.coalesce(
                                F.col("penalty")
                                .cast("decimal(18,6)"),
                                F.lit(0).cast("decimal(18,6)"))
                        ).alias("mmr_dec"),
                    )
                )
            pick = (
                scored.withColumn(
                    "_rn",
                    F.row_number().over(
                        w.orderBy(F.col("mmr_dec").desc(),
                                  F.col("n_id").asc())),
                )
                .filter(F.col("_rn") == 1)
                .select("q_id", "n_id", "cos_sim",
                        F.col("mmr_dec").cast("double")
                        .alias("mmr_score"),
                        F.lit(r).cast("int").alias("mmr_rank"))
            )
            # the accumulated selection feeds the NEXT round's
            # anti-join/penalty — localCheckpoint keeps the unrolled
            # plan from re-deriving round r-1 inside round r (depth
            # would otherwise grow quadratically in k)
            pick = pick.localCheckpoint(eager=True)
            picks.append(pick)
            sel_ids = pick.select("q_id", "n_id")
            selected = (sel_ids if selected is None
                        else selected.unionByName(sel_ids))
        out = picks[0]
        for p in picks[1:]:
            out = out.unionByName(p)
        return out.select("q_id", "n_id", "mmr_rank", "cos_sim",
                          "mmr_score")
    finally:
        cand.unpersist()
        pairs.unpersist()
