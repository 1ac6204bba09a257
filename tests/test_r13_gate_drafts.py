"""Round-13-tier gate drafts — operators pre-staged in round 11 whose
catalog landings ride CHANGED extensions of queries due in r12/r13
(the catalog is at the 100-entry / 50-row alternation ceiling: zero
free rows, riders only):

  * priority sampling (``operators/sampling.py::priority_sample`` —
    Duffield-Lund-Thorup weighted bottom-k with Horvitz-Thompson
    subset-sum estimation). LANDING ROUTE: rides q80's r12 re-gate
    (q80 owns the fixed-size sampling surface, r10-gated, due r12)
    as a kind='priority' leg, or q18's r13 re-gate (r9/r11-gated)
    as a third sampling kind.

  * lexical-diversity quality tier
    (``operators/text.py::lexical_diversity_df`` — TTR,
    Gini-Simpson index, top-token dominance; exact rationals, the
    no-libm twin of Shannon entropy). LANDING ROUTE: rides q25's
    r12 re-gate (q25 owns the per-doc text-stats surface,
    r10-gated, due r12) as added columns.

  * persisted mergeable HLL sketch table (``operators/hll.py`` —
    incremental distinct counting: per-batch sketch rows appended
    atomically, union-merged at query time, rollup over any group
    subset, landed data never rescanned). LANDING ROUTE: rides
    q53's r13 re-gate (q53 owns the approx-sketch surface,
    r9/r11-gated, due r13) as kind='hll_idx' rows gating EXACT
    counts + deterministic accuracy booleans (the q53/q79 HLL++
    bound discipline — estimates themselves are bounds-gated, never
    value-hashed).

Each draft runs the full driver-style compare (schema + rows +
order-insensitive canonical values) at sf0.001 and sf0.01 — the
exact acceptance its landing round promotes into __spark_entry__.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark import queries  # noqa: F401 — package import order: queries_llm alone is circular
from formula1_data_pipeline_spark.queries_llm import _SQL_TOKS
from tests.oracle_compare import canon, run_oracle

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

_PRIO_K = 100

#: the q80/q18 rider leg: priority-sample documents by n_chars.
#: 2^60 spelled as an exact double literal; every arithmetic step is
#: an IEEE correctly-rounded op on identically-constructed operands,
#: mirroring priority_sample's column expressions step for step.
_PRIO_ORACLE = f"""
WITH racers AS (
    SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                || '|' || 'priosample-v1'), 1, 15)) AS BIGINT) + 1
               AS u
    FROM documents
    WHERE n_chars IS NOT NULL AND n_chars > 0
), ranked AS (
    SELECT doc_id, w, u,
           row_number() OVER (
               ORDER BY CAST(u AS DOUBLE) / w ASC, doc_id ASC
           ) AS prio_rank
    FROM racers
), tau1 AS (
    SELECT COALESCE(max(w * 1152921504606846976.0 / CAST(u AS DOUBLE)),
                    0.0) AS tau
    FROM ranked WHERE prio_rank = {_PRIO_K + 1}
)
SELECT 'priority' AS kind, r.doc_id, r.w,
       CAST(r.prio_rank AS INTEGER) AS prio_rank, t.tau,
       greatest(r.w, t.tau) AS ht_weight
FROM ranked r, tau1 t
WHERE r.prio_rank <= {_PRIO_K}
"""

_LEXDIV_ORACLE = f"""
WITH base AS (
    SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), cnt AS (
    SELECT doc_id, t, count(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS t FROM base)
    GROUP BY 1, 2
), mom AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS types,
           CAST(sum(c * c) AS BIGINT) AS c2,
           CAST(max(c) AS BIGINT) AS maxc
    FROM cnt GROUP BY 1
)
SELECT b.doc_id,
       COALESCE(n, 0) AS n_tokens_lex,
       COALESCE(types, 0) AS n_types,
       COALESCE(CAST(types AS DOUBLE) / CAST(n AS DOUBLE), 0.0) AS ttr,
       COALESCE(1.0 - CAST(c2 AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 0.0)
           AS simpson_diversity,
       COALESCE(CAST(maxc AS DOUBLE) / CAST(n AS DOUBLE), 0.0)
           AS top_token_ratio
FROM base b LEFT JOIN mom USING (doc_id)
"""

#: hll_idx rows gate EXACT distinct counts (engine-replayable) plus
#: accuracy booleans that must be deterministically TRUE — the HLL
#: estimate itself stays out of the hash (trained/estimated floats
#: rule) but its correctness is pinned because a drifting estimate
#: flips est_ok under the hash.
_HLL_ORACLE = """
SELECT 'hll_idx' AS kind, source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_exact,
       TRUE AS est_ok
FROM documents GROUP BY source
UNION ALL
SELECT 'hll_idx', '_total',
       CAST(count(DISTINCT doc_id) AS BIGINT), TRUE
FROM documents
"""


def _compare(spark_df, oracle_sql: str, sf_dir: str):
    sdf = spark_df.toPandas()
    odf = run_oracle(oracle_sql, sf_dir)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    a, b = canon(sdf), canon(odf)
    assert a == b, [(x, y) for x, y in zip(a, b) if x != y][:3]


def _docs(spark, sf_dir):
    from formula1_data_pipeline_spark.queries import load

    return load(spark, sf_dir, "documents")["documents"]


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_priority_kind(spark, sf_dir):
    from formula1_data_pipeline_spark.operators.sampling import (
        priority_sample,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    leg = priority_sample(
        docs, F.col("n_chars").cast("double"), _PRIO_K
    ).select(
        F.lit("priority").alias("kind"),
        "doc_id", "w", "prio_rank", "tau", "ht_weight",
    )
    _compare(leg, _PRIO_ORACLE, sf_dir)


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_lexdiv_columns(spark, sf_dir):
    from formula1_data_pipeline_spark.operators.text import (
        lexical_diversity_df,
    )

    _compare(
        lexical_diversity_df(_docs(spark, sf_dir)),
        _LEXDIV_ORACLE, sf_dir,
    )


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_hll_idx_kind(spark, sf_dir, tmp_path):
    """Index built from three id-ranged batches (the incremental
    story), queried per source + rolled up to the grand total; the
    gated frame carries exact counts and the accuracy booleans."""
    from formula1_data_pipeline_spark.operators.hll import (
        hll_distinct_estimates,
        hll_sketch_append,
    )

    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "hllidx")
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    for lo, hi in ((-1, mx // 3), (mx // 3, (2 * mx) // 3),
                   ((2 * mx) // 3, mx)):
        hll_sketch_append(
            spark,
            docs.filter((F.col("doc_id") > lo) & (F.col("doc_id") <= hi)),
            idx, ["source"], "doc_id")
    est = hll_distinct_estimates(spark, idx, ["source"])
    exact = docs.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs_exact"))
    bound = F.greatest(
        F.lit(2.0), F.col("n_docs_exact").cast("double") * 0.05)
    per_src = exact.join(est, "source").select(
        F.lit("hll_idx").alias("kind"), "source", "n_docs_exact",
        (F.abs(
            F.col("n_distinct_est").cast("double")
            - F.col("n_docs_exact").cast("double")
        ) <= bound).alias("est_ok"),
    )
    tot_est = hll_distinct_estimates(spark, idx, []) \
        .collect()[0].n_distinct_est
    tot_exact = docs.select("doc_id").distinct().count()
    total = spark.createDataFrame(
        [("hll_idx", "_total", tot_exact,
          abs(tot_est - tot_exact) <= max(2.0, 0.05 * tot_exact))],
        "kind string, source string, n_docs_exact long, est_ok boolean",
    )
    _compare(per_src.unionByName(total), _HLL_ORACLE, sf_dir)
