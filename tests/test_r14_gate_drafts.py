"""Round-12-tier gate drafts — operators pre-staged late in round 11
whose catalog landings ride CHANGED extensions of queries due in r12
(the catalog is at the 100-entry / 50-row alternation ceiling: zero
free rows, riders only). File named r14 for the fallback window: if
an r12 host's window is tight, both targets re-gate again in r14.

  * persisted incremental aggregate mart (``operators/aggmart.py`` —
    landed mergeable partial aggregates: per-batch (n, sum, min,
    max, sumsq) rows, query-time fold, rollup over any group
    subset, batch-id exactly-once appends). LANDING ROUTE: rides
    q79's r12 re-gate (q79 owns the profiling surface, r10-gated,
    due r12) as kind='aggmart' rows — EXACT values under the full
    hash, derived floats replaying the documented expression shape.

  * sparse random projection (``operators/dimred.py`` — Achlioptas
    JL projection with an md5-derived sign matrix; ordered-fold dot
    products make projected values BIT-IDENTICAL across engines).
    LANDING ROUTE: rides q24's r12 re-gate (q24 owns the
    exact-cosine surface, r10-gated, due r12) as kind='rp' rows
    under the full value hash.

  * Gram-matrix PCA (``dimred.py::pca_fit/pca_project`` — one
    distributed X^T X pass, driver d x d eigh). Eigenvectors are
    TRAINED floats, so the gate pins deterministic structure
    booleans (descending eigenvalues, orthonormality, captured
    variance above the isotropic floor) — the HLL est_ok
    discipline. LANDING ROUTE: q24's r12 re-gate, kind='pca' row.

  * streaming aggregate-mart maintenance
    (``streaming/aggmart.py::stream_agg_mart`` — foreachBatch folds
    each micro-batch through ``agg_mart_append``; the stream's
    batch id IS the mart's exactly-once batch id, and the
    distributive fold makes the landed stats bit-for-bit the
    one-shot groupBy for any split). LANDING ROUTE: rides whichever
    of q31/q54's r12 streaming re-gates the streaming histogram
    does not take, as kind='aggmart_stream' rows.

  * dataset version diff (``operators/diff.py::dataset_diff`` —
    added/removed/changed via one null-safe hash-compare full outer
    join; the readable face of time travel, and ``txn_delete_keys``'
    deleted keys must surface as 'removed'). LANDING ROUTE: rides
    q75's r12 re-gate (time travel + targeted delete, r10-gated,
    due r12) as kind='diff' rows under the full value hash.

  * two-stage JL-compressed ANN (``dimred.py::rp_topk`` — narrow
    candidate window + candidates-broadcast vector re-fetch; fully
    deterministic, both stages oracle-replayed fold-for-fold).
    LANDING ROUTE: q24's r12 re-gate, kind='rp_topk' rows.

  * int8 scalar quantization (``operators/quantize.py`` — symmetric
    per-dimension max-abs scales, an order-free exact selection, so
    the CODES are bit-identical cross-engine and fully
    value-hashable where trained quantizers bound). LANDING ROUTE:
    rides q92's r13 re-gate (ANN-recall surface, r9/r11-gated, due
    r13) as kind='sq8' rows — codes under the hash + a
    deterministic reconstruction-bound boolean.

Each draft runs the full driver-style compare (schema + rows +
order-insensitive canonical values) at sf0.001 and sf0.01 — the
exact acceptance its landing round promotes into __spark_entry__.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark import queries  # noqa: F401
from formula1_data_pipeline_spark.operators import dimred as DR
from tests.oracle_compare import canon, run_oracle

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

_D, _K = 64, 16

#: the q79 rider leg: a 3-batch mart over documents (doc_id % 3,
#: batch-1 deliberately re-delivered — must be a no-op), read back at
#: (source) grain plus the grand total. The oracle replays the exact
#: derived-float shape from agg_mart_stats' docstring contract.
_AGGMART_ORACLE = """
WITH m AS (
    SELECT source,
           CAST(count(n_chars) AS BIGINT) AS n,
           CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS s,
           CAST(min(n_chars) AS BIGINT) AS mn,
           CAST(max(n_chars) AS BIGINT) AS mx,
           CAST(sum(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT))
                AS BIGINT) AS ssq
    FROM documents WHERE n_chars IS NOT NULL
    GROUP BY GROUPING SETS ((source), ())
)
SELECT 'aggmart' AS kind, COALESCE(source, '_total') AS source,
       n AS n_rows, s AS sum_value, mn AS min_value, mx AS max_value,
       CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_value,
       greatest(CAST(ssq AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0) AS var_pop,
       sqrt(greatest(CAST(ssq AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))
           AS stddev_pop
FROM m
"""


def _rp_oracle() -> str:
    expr = DR.rp_oracle_expr(
        "list_transform(embedding, x -> CAST(x AS DOUBLE))", _D, _K)
    return f"""
    SELECT 'rp' AS kind, vec_id, {expr} AS proj FROM embeddings
    """


def _fold_dot_sql(a: str, b: str) -> str:
    """DuckDB twin of similarity.dot's init-seeded fold."""
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), "
        f"(acc, x) -> acc + x)"
    )


def _rp_topk_oracle() -> str:
    """Full two-stage replay of rp_topk (q24 rider kind='rp_topk'):
    JL-space candidate rank -> exact re-rank, every fold/round/
    tiebreak mirrored — the one ANN whose VALUES gate, not just a
    recall bound."""
    proj = DR.rp_oracle_expr(
        "list_transform(embedding, x -> CAST(x AS DOUBLE))", _D, _K)

    def cos(a, b):
        return (f"round({_fold_dot_sql(a, b)} / nullif("
                f"sqrt({_fold_dot_sql(a, a)}) * "
                f"sqrt({_fold_dot_sql(b, b)}), 0.0), 6)")

    return f"""
    WITH c AS (
        SELECT vec_id AS n_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE))
                   AS n_vec,
               {proj} AS n_proj
        FROM embeddings
    ), q AS (
        SELECT n_id AS q_id, n_vec AS q_vec, n_proj AS q_proj
        FROM c WHERE n_id < 10
    ), s1 AS (
        SELECT q_id, n_id, q_vec, n_vec,
               {cos('q_proj', 'n_proj')} AS proj_cos
        FROM c CROSS JOIN q WHERE q_id <> n_id
    ), r1 AS (
        SELECT q_id, n_id, q_vec, n_vec,
               row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY proj_cos DESC, n_id ASC) AS cand_rank
        FROM s1
    ), s2 AS (
        SELECT q_id, n_id, {cos('q_vec', 'n_vec')} AS cos_sim
        FROM r1 WHERE cand_rank <= 30
    ), r2 AS (
        SELECT q_id, n_id, cos_sim,
               row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY cos_sim DESC, n_id ASC) AS rank
        FROM s2
    )
    SELECT 'rp_topk' AS kind, q_id, n_id, cos_sim,
           CAST(rank AS INTEGER) AS rank
    FROM r2 WHERE rank <= 5
    """


_PCA_ORACLE = """
SELECT 'pca' AS kind, TRUE AS eig_desc_ok, TRUE AS orthonormal_ok,
       TRUE AS variance_floor_ok, TRUE AS mart_matches_one_shot_ok
"""

#: the streaming-mart rider leg (rides whichever of q31/q54's r12
#: streaming re-gates the streaming histogram does not take): the
#: convergence contract makes the landed stream state answer the
#: SAME oracle as the batch mart at the stored grain.
_STREAM_AGGMART_ORACLE = """
SELECT 'aggmart_stream' AS kind, source,
       CAST(count(n_chars) AS BIGINT) AS n_rows,
       CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_value,
       CAST(min(n_chars) AS BIGINT) AS min_value,
       CAST(max(n_chars) AS BIGINT) AS max_value,
       CAST(sum(CAST(n_chars AS BIGINT)) AS DOUBLE)
         / CAST(count(n_chars) AS DOUBLE) AS mean_value
FROM documents WHERE n_chars IS NOT NULL
GROUP BY source
"""


def _diff_oracle() -> str:
    """q75 rider kind='diff': documents vs a deterministic mutation
    (doc_id % 11 removed, % 7 changed) — the time-travel diff report
    under the full value hash."""
    from formula1_data_pipeline_spark.operators.diff import (
        content_hash_sql,
    )

    h = content_hash_sql(["n_chars", "source", "text"])
    return f"""
    WITH old AS (
        SELECT doc_id, {h} AS old_hash FROM documents
    ), new_side AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN n_chars + 1
                    ELSE n_chars END AS n_chars,
               source, text
        FROM documents WHERE doc_id % 11 <> 0
    ), newh AS (
        SELECT doc_id, {h} AS new_hash FROM new_side
    ), j AS (
        SELECT doc_id, old_hash, new_hash
        FROM old FULL OUTER JOIN newh USING (doc_id)
    )
    SELECT 'diff' AS kind,
           CASE WHEN old_hash IS NULL THEN 'added'
                WHEN new_hash IS NULL THEN 'removed'
                WHEN old_hash <> new_hash THEN 'changed'
           END AS status,
           doc_id, old_hash, new_hash
    FROM j WHERE (old_hash IS NULL OR new_hash IS NULL
                  OR old_hash <> new_hash)
    """


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_diff_kind(spark, sf_dir):
    from formula1_data_pipeline_spark.operators.diff import (
        dataset_diff,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "source", "text", "n_chars")
    new = (
        docs.filter(F.col("doc_id") % 11 != 0)
        .withColumn("n_chars",
                    F.when(F.col("doc_id") % 7 == 0,
                           F.col("n_chars") + 1)
                    .otherwise(F.col("n_chars")))
    )
    out = (dataset_diff(docs, new, ["doc_id"])
           .select(F.lit("diff").alias("kind"), "status", "doc_id",
                   "old_hash", "new_hash"))
    _compare(out, _diff_oracle(), sf_dir)


def _sq8_oracle() -> str:
    """q92 rider kind='sq8': codes for vec_id < 50 under the full
    value hash + the per-row reconstruction-bound boolean (TRUE by
    construction of the round-half interval)."""
    from formula1_data_pipeline_spark.operators.quantize import (
        sq8_encode_sql,
        sq8_scales_sql,
    )

    vec = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    return f"""
    WITH scales AS ({sq8_scales_sql(vec, "embeddings", 64)})
    SELECT 'sq8' AS kind, vec_id, {sq8_encode_sql(vec)} AS sq8,
           TRUE AS recon_ok
    FROM embeddings, scales
    WHERE vec_id < 50
    """


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_sq8_kind(spark, sf_dir):
    from formula1_data_pipeline_spark.operators.quantize import (
        sq8_decode,
        sq8_encode,
        sq8_scales,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scales = sq8_scales(emb, "embedding", 64)
    enc = sq8_encode(emb, "embedding", scales)
    dec = sq8_decode(enc, "sq8", scales)
    # recon_ok computed engine-side from the decoded values — a
    # drifting code flips it under the hash
    bound = F.array(*[F.lit(s / 254.0 * 1.0001) for s in scales])
    err_ok = F.aggregate(
        F.zip_with(
            F.zip_with(
                F.transform(F.col("embedding"),
                            lambda x: x.cast("double")),
                F.col("deq"), lambda v, q: F.abs(v - q)),
            bound, lambda e, b: e <= b),
        F.lit(True), lambda acc, x: acc & x,
    )
    out = (dec.filter(F.col("vec_id") < 50)
           .select(F.lit("sq8").alias("kind"), "vec_id", "sq8",
                   err_ok.alias("recon_ok")))
    _compare(out, _sq8_oracle(), sf_dir)


def _compare(spark_df, oracle_sql: str, sf_dir: str):
    sdf = spark_df.toPandas()
    odf = run_oracle(oracle_sql, sf_dir)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    a, b = canon(sdf), canon(odf)
    assert a == b, [(x, y) for x, y in zip(a, b) if x != y][:3]


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_aggmart_kind(spark, sf_dir, tmp_path):
    from formula1_data_pipeline_spark.operators.aggmart import (
        agg_mart_append,
        agg_mart_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mart = str(tmp_path / "mart")
    for b in range(3):
        agg_mart_append(spark, docs.filter(F.col("doc_id") % 3 == b),
                        mart, ["source"], "n_chars", f"gate-{b}")
    # deliberate re-delivery: exactly-once means the stats are
    # unaffected, which the value hash then pins
    assert agg_mart_append(
        spark, docs.filter(F.col("doc_id") % 3 == 1),
        mart, ["source"], "n_chars", "gate-1",
    ) == 0
    by_source = agg_mart_stats(spark, mart, ["source"])
    total = agg_mart_stats(spark, mart, []).select(
        F.lit("_total").alias("source"), "n_rows", "sum_value",
        "min_value", "max_value", "mean_value", "var_pop", "stddev_pop",
    )
    out = by_source.unionByName(total).select(
        F.lit("aggmart").alias("kind"), "source", "n_rows",
        F.col("sum_value").cast("long").alias("sum_value"),
        "min_value", "max_value", "mean_value", "var_pop", "stddev_pop",
    )
    _compare(out, _AGGMART_ORACLE, sf_dir)


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_stream_aggmart_kind(spark, sf_dir):
    from formula1_data_pipeline_spark.scratch import scratch_dir
    from formula1_data_pipeline_spark.streaming.aggmart import (
        stream_agg_mart,
    )

    sf_tag = sf_dir.rsplit("sf", 1)[-1]
    got = stream_agg_mart(
        spark, f"{sf_dir}/documents.parquet", ["source"], "n_chars",
        work_dir=scratch_dir(prefix=f"gate_sam_{sf_tag}_"),
    )
    out = got.select(
        F.lit("aggmart_stream").alias("kind"), "source", "n_rows",
        F.col("sum_value").cast("long").alias("sum_value"),
        "min_value", "max_value", "mean_value",
    )
    _compare(out, _STREAM_AGGMART_ORACLE, sf_dir)


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_rp_kind(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = (
        DR.random_project(emb, "embedding", d=_D, k=_K)
        .select(F.lit("rp").alias("kind"), "vec_id", "proj")
    )
    _compare(out, _rp_oracle(), sf_dir)


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_rp_topk_kind(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    out = (
        DR.rp_topk(emb, queries, d=_D, k_proj=_K,
                   n_candidates=30, top_k=5)
        .select(F.lit("rp_topk").alias("kind"), "q_id", "n_id",
                "cos_sim", F.col("rank").cast("int").alias("rank"))
    )
    _compare(out, _rp_topk_oracle(), sf_dir)


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_pca_bounds_kind(spark, sf_dir, tmp_path):
    """The INCREMENTAL path is the gated one: the fit consumes a
    3-batch Gram mart (with a deliberate re-delivery that must
    no-op), and a dedicated boolean pins mart-fold == one-shot
    Gram to float-sum tolerance."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k = 8
    mart = str(tmp_path / "gm")
    for b in range(3):
        DR.gram_mart_append(spark, emb.filter(F.col("vec_id") % 3 == b),
                            mart, "embedding", _D, f"gate-{b}")
    assert DR.gram_mart_append(
        spark, emb.filter(F.col("vec_id") % 3 == 1),
        mart, "embedding", _D, "gate-1") == 0
    ev, comps = DR.pca_fit_from_mart(spark, mart, _D, k)
    C = np.array(comps)
    g_mart = np.array(DR.gram_from_mart(spark, mart, _D))
    g_full = np.array(DR.gram_matrix(emb, "embedding", _D))
    out = spark.createDataFrame(
        [(
            "pca",
            bool(all(ev[i] >= ev[i + 1] for i in range(k - 1))),
            bool(np.allclose(C @ C.T, np.eye(k), atol=1e-8)),
            bool(sum(ev) / float(np.trace(g_mart)) > k / _D),
            bool(np.allclose(g_mart, g_full, rtol=1e-9)),
        )],
        "kind string, eig_desc_ok boolean, orthonormal_ok boolean, "
        "variance_floor_ok boolean, mart_matches_one_shot_ok boolean",
    )
    _compare(out, _PCA_ORACLE, sf_dir)
