"""Diversity-balanced downsampling (curation Composite #2,
registered under q27's kind-union gate since round 11).

Lives in its own registration-free module so BOTH gate hosts can
import it: ``queries_curation`` (the composite surface) and
``queries_llm`` (q27's oracle composes :func:`diversity_cte_body`
at register time). Importing from ``queries_curation`` directly
would cycle — that module imports ``queries.register`` at top level,
and ``queries`` imports ``queries_llm`` before ``queries_curation``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Composite #2 (pre-staged for round 11): diversity-balanced
# downsampling — k-center cells + per-cell quotas
# --------------------------------------------------------------------------

#: greedy k-center exemplar count (embedding-space coverage)
DIVERSITY_K = 8
#: quota per cell — the "cap every region" downsampling policy
PER_CELL = 40
#: salt for the per-cell quota hash (independent of other samplers)
DIVERSITY_SALT = "div-v1"


def diversity_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap-per-region corpus downsampling: partition the embedding
    space with greedy k-center exemplars (``operators/coreset.py``),
    assign every vector to its nearest exemplar, and keep a fixed
    md5-ranked quota per cell (``sampling.stratified_topn``) — so no
    embedding-space region can dominate the corpus, the diversity
    complement of frequency-based balancing (q68's language mixture).

    Output (vec_id, center_rank, cos_sim): the kept rows. Everything
    is hash-gateable — the k-center trace is 6-dp-deterministic, the
    assignment ladder resolves exact ties by lowest rank, the quota
    rank is the repo's 60-bit md5. Zero-norm vectors (cosine
    undefined, NULL assignment) never reach a quota — the policy
    kcenter_assign documents."""
    from formula1_data_pipeline_spark.operators.coreset import (
        kcenter_assign,
        kcenter_centers,
    )
    from formula1_data_pipeline_spark.operators.sampling import (
        stratified_topn,
    )
    from formula1_data_pipeline_spark.queries import load

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    centers = kcenter_centers(emb, DIVERSITY_K)
    assigned = kcenter_assign(emb, centers).filter(
        F.col("center_rank").isNotNull()
    )
    return stratified_topn(
        assigned, ["center_rank"], F.col("vec_id"),
        n=PER_CELL, salt=DIVERSITY_SALT,
    ).select("vec_id", "center_rank", "cos_sim")


_SQL_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]), "
    "(acc, x) -> acc + x)"
)


def _kcenter_cte(k: int) -> str:
    """The greedy k-center trace as an unrolled materialized CTE
    chain ending in ``cen{k-1}`` (rank, vec_id, min_dist, v, nv) —
    the exact replay of ``kcenter_centers``'s per-round argmax
    (rounded-6dp cosines BEFORE max, id tie-breaks, selected ids
    excluded). ``WHERE nv > 0`` mirrors the Spark side's zero-norm
    exclusion exactly (a no-op on current testdata, but a zero
    vector with the smallest vec_id would otherwise desynchronize
    the seed pick — round-9 ADVICE)."""
    parts = [f"""
    base AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), nrm AS MATERIALIZED (
        SELECT vec_id, v, nv FROM (
            SELECT vec_id, v, sqrt({_SQL_DOT.format(a='v', b='v')}) AS nv
            FROM base
        ) WHERE nv > 0
    ), cen0 AS MATERIALIZED (
        SELECT 0 AS rank, vec_id, CAST(NULL AS DOUBLE) AS min_dist,
               v, nv
        FROM nrm ORDER BY vec_id LIMIT 1
    )"""]
    for r in range(1, k):
        sim = _SQL_DOT.format(a="b.v", b="c.v")
        parts.append(f"""
    d{r} AS MATERIALIZED (
        SELECT b.vec_id,
               1 - max(round({sim} / nullif(b.nv * c.nv, 0), 6)) AS d
        FROM nrm b CROSS JOIN cen{r - 1} c
        WHERE b.vec_id NOT IN (SELECT vec_id FROM cen{r - 1})
        GROUP BY b.vec_id
    ), p{r} AS MATERIALIZED (
        SELECT {r} AS rank, n.vec_id, d.d AS min_dist, n.v, n.nv
        FROM d{r} d JOIN nrm n USING (vec_id)
        ORDER BY d.d DESC, d.vec_id LIMIT 1
    ), cen{r} AS MATERIALIZED (
        SELECT * FROM cen{r - 1} UNION ALL SELECT * FROM p{r}
    )""")
    return ",".join(parts)


def diversity_cte_body() -> str:
    """The diversity pipeline as a composable WITH-body (ends in
    ``quota``): k-center trace -> nearest-exemplar assignment (sim
    DESC, rank ASC argmax ≡ the Spark struct-array's lowest-rank tie
    rule) -> per-cell md5-ranked quota (the exact stratified_topn
    ordering). q27's kind-union oracle composes this verbatim (the
    q97/q100 discipline: one CTE text, two gates)."""
    k = DIVERSITY_K
    sim = _SQL_DOT.format(a="e.v", b="c.v")
    return f"""{_kcenter_cte(k)}, sims AS (
        SELECT e.vec_id, c.rank,
               round({sim} / nullif(e.nv * c.nv, 0), 6) AS cos_sim
        FROM nrm e CROSS JOIN cen{k - 1} c
    ), best AS (
        SELECT vec_id, rank AS center_rank, cos_sim,
               row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY cos_sim DESC, rank ASC
               ) AS rn
        FROM sims
    ), quota AS (
        SELECT vec_id, center_rank, cos_sim,
               row_number() OVER (
                   PARTITION BY center_rank
                   ORDER BY CAST(('0x' || substr(md5(
                       CAST(vec_id AS VARCHAR) || '|{DIVERSITY_SALT}'
                   ), 1, 15)) AS BIGINT) ASC, vec_id ASC
               ) AS rn2
        FROM best WHERE rn = 1
    )"""


def diversity_downsample_oracle() -> str:
    """The standalone oracle statement (draft-gate form)."""
    return f"""
    WITH {diversity_cte_body()}
    SELECT vec_id, center_rank, cos_sim
    FROM quota WHERE rn2 <= {PER_CELL}
    """
