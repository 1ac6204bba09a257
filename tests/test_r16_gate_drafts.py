"""Round-14/15-tier gate drafts — operators pre-staged in round 13
whose catalog landings ride CHANGED extensions of queries due in
r14/r15 (file named r16 for the fallback window). The catalog stays
at the 100-entry / 50-row alternation ceiling: zero free rows,
riders only.

  * streaming BM25-index maintenance (``streaming/bm25.py::
    stream_bm25_index`` — foreachBatch -> bm25_index_append, the
    landed-doc anti-join IS the replay guard, final lease-serialized
    compaction). LANDING ROUTE: rides q39's r14 re-gate (q39 owns
    the BM25 surface; r12-gated, due r14) as kind='bm25_stream'
    rows — row-identical to the live-scan and batch-index kinds, so
    the SHARED oracle CTE replays all three (this draft compares
    against q39's registered oracle directly: zero duplication).

  * product quantization + ADC search (``operators/pq.py`` —
    unit-vector reduction, per-subspace Lloyd codebooks, m-lookup
    asymmetric scoring, exact re-rank of the candidate window).
    LANDING ROUTE: rides q92's r15 re-gate (ANN-recall surface;
    r13-gated, due r15) as kind='pq' rows — a recall-floor boolean
    against the exact top-5 on the clustered fixture (trained
    codebooks gate on BOUNDS, the q92 rule).

  * semantic benchmark decontamination (``similarity.py::
    semantic_contamination`` — the fourth contamination tier;
    untrained md5-hyperplane blocking + exact 6-dp cosine, so it
    gates under the FULL value hash). LANDING ROUTE: rides q66's
    r15 re-gate as kind='semantic' rows (section below).

  * per-group token-budget selection (``selection.py::
    select_token_budget_by_group`` — per-domain mixture quotas;
    exact integer/decimal arithmetic end to end). LANDING ROUTE:
    rides q68's r14 re-gate (mixture surface; r12-gated, due r14)
    as kind='group_budget' rows, or q100's r14 re-gate as a
    curation stage (section below).

  * streaming priority sampling (``streaming/sample.py`` — the
    bottom-(k+1) racer state merges per micro-batch; BIT-FOR-BIT
    the batch priority_sample for any split). LANDING ROUTE: rides
    q80's r14 re-gate as kind='priority_stream' rows against q80's
    own oracle (section below).

Each draft runs the full driver-style compare (schema + rows +
order-insensitive canonical values) at sf0.001 and sf0.01 — the
exact acceptance its landing round promotes into __spark_entry__.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark import queries  # noqa: F401
from tests.oracle_compare import canon, run_oracle

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _compare_frames(sdf: pd.DataFrame, odf: pd.DataFrame) -> None:
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    a, b = canon(sdf), canon(odf)
    assert a == b, [(x, y) for x, y in zip(a, b) if x != y][:3]


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_bm25_stream_kind(spark, sf_dir, tmp_path):
    """The q39 rider leg: top-10 per audit query from the
    STREAM-maintained index, shaped as q39's long rows with
    kind='bm25_stream'. Oracle = q39's OWN registered oracle's
    kind='bm25' rows re-labeled — the row-identity contract means
    the shared CTE replays the streamed path too."""
    from formula1_data_pipeline_spark.operators.retrieval import (
        bm25_index_topk,
    )
    from formula1_data_pipeline_spark.queries import CATALOG
    from formula1_data_pipeline_spark.queries_datapipe import (
        BM25_QUERIES,
    )
    from formula1_data_pipeline_spark.streaming.bm25 import (
        stream_bm25_index,
    )

    idx = stream_bm25_index(
        spark, f"{sf_dir}/documents.parquet", n_source_files=3,
        work_dir=str(tmp_path / "w"))
    qdf = spark.createDataFrame(BM25_QUERIES,
                                ["query_id", "query_text"])
    sdf = bm25_index_topk(spark, idx, qdf, k=10).select(
        F.lit("bm25_stream").alias("kind"),
        F.col("query_id").alias("key"),
        "doc_id",
        F.col("n_terms_matched").alias("n"),
        "score",
        "rank",
    ).toPandas()

    oracle_all = run_oracle(
        CATALOG["q39_tfidf_top_terms"].oracle, sf_dir)
    odf = oracle_all[oracle_all["kind"] == "bm25"].copy()
    odf["kind"] = "bm25_stream"
    _compare_frames(sdf, odf)


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_pq_kind(spark, sf_dir):
    """The q92 rider leg: kind='pq' recall-floor row on the shared
    clustered fixture (the q92 evaluation corpus — structure-free
    gaussians cannot distinguish a working quantizer from a broken
    one) + an encode-determinism row. Floor 0.85 at a 10% candidate
    window; a broken codebook/LUT measures 0.6-0.8 (operators/pq.py
    measurement table)."""
    from formula1_data_pipeline_spark.evalsets import (
        clustered_embeddings,
    )
    from formula1_data_pipeline_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )
    from formula1_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    emb = clustered_embeddings(spark, n=2000, dim=16, n_clusters=20,
                               std=0.6, seed=7)
    books = train_pq_codebooks(emb, dim=16, m=4, k=16, n_iter=3)
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r["q_id"], r["n_id"])
             for r in cosine_topk(emb, q, k=5, id_col="vec_id",
                                  vec_col="embedding").collect()}
    approx = {(r["q_id"], r["n_id"])
              for r in pq_adc_topk(emb, q, books, dim=16, k=5,
                                   n_candidates=200).collect()}
    recall = len(exact & approx) / len(exact)
    enc1 = pq_encode(emb, "embedding", books).orderBy("vec_id") \
        .select("pq").collect()
    enc2 = pq_encode(emb, "embedding", books).orderBy("vec_id") \
        .select("pq").collect()
    sdf = spark.createDataFrame(
        [("pq", len(exact), recall >= 0.85),
         ("pq_encode_deterministic", len(enc1), enc1 == enc2)],
        "method string, n_exact long, recall_ok boolean",
    ).toPandas()
    odf = run_oracle(
        f"""
        SELECT 'pq' AS method, CAST({len(exact)} AS BIGINT)
               AS n_exact, true AS recall_ok
        UNION ALL
        SELECT 'pq_encode_deterministic', 2000, true
        """,
        sf_dir,
    )
    _compare_frames(sdf, odf)


# --------------------------------------------------------------------
# Semantic benchmark decontamination (similarity.py::
# semantic_contamination, round 13) — the FOURTH contamination tier:
# embedding-space cosine >= threshold vs a benchmark embedding set,
# catching semantically-equivalent rephrasings the lexical tiers
# (exact shingle / Bloom / MinHash fuzzy) cannot. Fully untrained
# (md5 hyperplanes, exact 6-dp cosine) -> FULL value hash. LANDING
# ROUTE: rides q66's r15 re-gate (contamination surface; r13-gated,
# due r15) as kind='semantic' rows mapped onto q66's columns
# (doc_id := vec_id, n_hits := n_semantic_matches, contaminated :=
# semantic_contaminated, max_fuzzy_jaccard := max_semantic_cos).
# Benchmark derivation is deterministic: vec_id % 17 == 0 embeddings
# re-enter with +0.05 on dim 0 (cos ~0.999 — a semantic twin), plus
# md5-noise vectors (cos ~0, never flagged).

_SEM_T = 0.9


def _sem_oracle() -> str:
    from formula1_data_pipeline_spark.queries_llm import (
        _SQL_BUCKET_KEYS,
        _SQL_DOT,
    )

    noise_vec = (
        "list_transform(range(0, 64), d -> "
        "CAST(('0x' || substr(md5('noise:' || CAST(vec_id AS VARCHAR)"
        " || ':' || CAST(d AS VARCHAR)), 1, 16)) AS UBIGINT) "
        "/ 9223372036854775808.0 - 1.0)"
    )
    cos = (f"round({_SQL_DOT.format(a='cb.vec', b='bb.vec')} / nullif("
           f"sqrt({_SQL_DOT.format(a='cb.vec', b='cb.vec')}) * "
           f"sqrt({_SQL_DOT.format(a='bb.vec', b='bb.vec')}), 0.0), 6)")
    return f"""
    WITH vecs AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ), sbench AS (
        SELECT vec_id + 9000000 AS b_id,
               list_transform(list_zip(vec, range(1, 65)),
                   p -> p[1] + CASE WHEN p[2] = 1 THEN 0.05
                               ELSE 0.0 END) AS vec
        FROM vecs WHERE vec_id % 17 = 0
        UNION ALL
        SELECT vec_id + 9500000, {noise_vec}
        FROM vecs WHERE vec_id % 23 = 0
    ), cb AS (
        SELECT vec_id, vec, {_SQL_BUCKET_KEYS} AS bucket FROM vecs
    ), bb AS (
        SELECT b_id, vec, {_SQL_BUCKET_KEYS} AS bucket FROM sbench
    ), cand AS (
        SELECT DISTINCT cb.vec_id, bb.b_id, {cos} AS cos_sim
        FROM cb JOIN bb USING (bucket)
    ), hits AS (
        SELECT vec_id,
               CAST(count(DISTINCT b_id) AS BIGINT) AS n,
               max(cos_sim) AS mx
        FROM cand WHERE cos_sim >= {_SEM_T} GROUP BY 1
    )
    SELECT 'semantic' AS kind, v.vec_id AS doc_id,
           COALESCE(h.n, 0) AS n_hits,
           COALESCE(h.n, 0) > 0 AS contaminated,
           CAST(NULL AS BIGINT) AS n_bloom_hits,
           CAST(NULL AS BOOLEAN) AS bloom_contaminated,
           h.mx AS max_fuzzy_jaccard
    FROM vecs v LEFT JOIN hits h USING (vec_id)
    """


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_semantic_contamination_kind(spark, sf_dir):
    import hashlib

    from formula1_data_pipeline_spark.operators.similarity import (
        semantic_contamination,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    pert = F.transform(
        F.col("embedding"),
        lambda x, i: x.cast("double")
        + F.when(i == 0, F.lit(0.05)).otherwise(F.lit(0.0)),
    )
    copies = emb.filter(F.col("vec_id") % 17 == 0).select(
        (F.col("vec_id") + 9_000_000).alias("bench_id"),
        pert.alias("embedding"),
    )

    def noise_vec(v: int) -> list[float]:
        return [
            int(hashlib.md5(f"noise:{v}:{d}".encode())
                .hexdigest()[:16], 16) / 2 ** 63 - 1.0
            for d in range(64)
        ]

    noise_ids = [r["vec_id"] for r in
                 emb.filter(F.col("vec_id") % 23 == 0)
                 .select("vec_id").collect()]
    noise = spark.createDataFrame(
        [(v + 9_500_000, noise_vec(v)) for v in noise_ids],
        "bench_id long, embedding array<double>",
    )
    sdf = semantic_contamination(
        emb, copies.unionByName(noise), dim=64, threshold=_SEM_T,
    ).select(
        F.lit("semantic").alias("kind"),
        F.col("vec_id").alias("doc_id"),
        F.col("n_semantic_matches").alias("n_hits"),
        F.col("semantic_contaminated").alias("contaminated"),
        F.lit(None).cast("long").alias("n_bloom_hits"),
        F.lit(None).cast("boolean").alias("bloom_contaminated"),
        F.col("max_semantic_cos").alias("max_fuzzy_jaccard"),
    ).toPandas()
    odf = run_oracle(_sem_oracle(), sf_dir)
    _compare_frames(sdf, odf)
    # non-vacuous: the semantic twins are flagged, noise never is
    assert sdf[sdf["contaminated"]].shape[0] >= 1
    assert (sdf[sdf["contaminated"]]["doc_id"] % 17 == 0).all()


# --------------------------------------------------------------------
# Per-group token-budget selection (selection.py::
# select_token_budget_by_group, round 13) — pretraining mixtures are
# per-domain token QUOTAS; each group fills its own budget from its
# own (score DESC, id ASC) prefix. Strictly better scale shape than
# the gated global form (the one unpartitioned bucket-offset window
# partitions by group). LANDING ROUTE: rides q68's r14 re-gate
# (mixture surface; r12-gated, due r14) as kind='group_budget' rows
# — or q100's r14 re-gate as a curation stage. Exact integer/decimal
# arithmetic end to end -> FULL value hash.

_GB_BUDGETS = {"src0": 3000, "src1": 1200}
_GB_DEFAULT = 700


def _group_budget_oracle() -> str:
    vals = ", ".join(f"('{g}', {b})" for g, b in _GB_BUDGETS.items())
    return f"""
    WITH b(source, budget) AS (VALUES {vals}),
    d AS (
        SELECT source, doc_id,
               CAST(CAST(CAST(n_chars % 97 AS DOUBLE) / 97.0
                    AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS score_q,
               CAST(greatest(1, n_chars // 5) AS BIGINT) AS n_tokens
        FROM documents
    ), j AS (
        SELECT d.*, COALESCE(b.budget, {_GB_DEFAULT}) AS budget
        FROM d LEFT JOIN b USING (source)
    ), o AS (
        SELECT source, doc_id, score_q, n_tokens, budget,
               CAST(COALESCE(sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY score_q DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before
        FROM j
    )
    SELECT 'group_budget' AS kind, source, doc_id, score_q,
           n_tokens, cum_before
    FROM o WHERE cum_before < budget
    """


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_group_budget_kind(spark, sf_dir):
    from formula1_data_pipeline_spark.operators.selection import (
        select_token_budget_by_group,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sdf = select_token_budget_by_group(
        docs,
        (F.col("n_chars") % 97).cast("double") / 97.0,
        F.greatest(F.lit(1), F.col("n_chars") / F.lit(5)
                   ).cast("long"),
        "source", _GB_BUDGETS, default_budget=_GB_DEFAULT,
    ).select(
        F.lit("group_budget").alias("kind"),
        "source", "doc_id", "score_q", "n_tokens", "cum_before",
    ).toPandas()
    odf = run_oracle(_group_budget_oracle(), sf_dir)
    _compare_frames(sdf, odf)
    # mixture semantics visible: the budgeted sources keep more
    # tokens than the default-budget ones
    per = sdf.groupby("source")["n_tokens"].sum()
    assert per["src0"] > per["src2"]


# --------------------------------------------------------------------
# Streaming priority sampling (streaming/sample.py, round 13) — the
# fixed-size weighted sample maintained over a document stream,
# converging BIT-FOR-BIT to the batch priority_sample (bottom-k
# selection merges; md5 race keys make the state a pure function of
# the document set — value-level idempotent under replay, the HLL
# discipline). LANDING ROUTE: rides q80's r14 re-gate (fixed-size
# sampling surface; r12-gated, due r14) as kind='priority_stream'
# rows — the SAME oracle as the landed kind='priority' leg, by exact
# convergence (this draft compares against q80's registered oracle:
# zero duplication).


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_priority_stream_kind(spark, sf_dir, tmp_path):
    from formula1_data_pipeline_spark.queries import CATALOG
    from formula1_data_pipeline_spark.streaming.sample import (
        stream_priority_sample,
    )

    got = stream_priority_sample(
        spark, f"{sf_dir}/documents.parquet", "n_chars", 100,
        n_source_files=3, work_dir=str(tmp_path / "w"))
    # prio_rank rides as double here: the ORACLE side is filtered
    # out of q80's full union frame, where the stratified rows' NULL
    # ranks make pandas float64-ize the column ('32.0' under the
    # canon) — at landing time the spark side is the same full union
    # and float64-izes identically, so this is draft-only shimming
    sdf = got.select(
        F.lit("priority_stream").alias("kind"),
        F.lit(None).cast("string").alias("grp"),
        F.col("doc_id").alias("key"),
        F.lit(None).cast("bigint").alias("user_id"),
        "w",
        F.col("prio_rank").cast("double").alias("prio_rank"),
        "tau",
        "ht_weight",
    ).toPandas()
    oracle_all = run_oracle(
        CATALOG["q80_stratified_topn"].oracle, sf_dir)
    odf = oracle_all[oracle_all["kind"] == "priority"].copy()
    odf["kind"] = "priority_stream"
    _compare_frames(sdf, odf)


# --------------------------------------------------------------------
# Semantic-cluster-balanced resampling (similarity.py::
# cluster_balanced_resample, round 14) — q68's temperature-0.5
# mixture reweighting over SEMANTIC clusters (primary centroid cell
# of the q89/q34 hash-sample quantizer) instead of metadata labels:
# per-cluster keep rates sqrt(n_min/n_cluster), salted-md5 keep
# threshold, degenerate embeddings pass through loudly. All exact
# (sqrt is IEEE-correct in both engines; untrained quantizer) ->
# FULL value hash. LANDING ROUTE: rides q89's r15 re-gate as
# kind='balance' rows beside the dedup verdicts (shared quantizer
# cells, n_centroids=16), host reshaped to a kind-discriminated
# frame like q68 r14.


def _balance_oracle() -> str:
    from formula1_data_pipeline_spark.queries_llm import _SQL_DOT

    return f"""
    WITH raw0 AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ), vecs AS (
        SELECT vec_id, vec FROM raw0
        WHERE vec IS NOT NULL AND len(vec) > 0
    ), cent AS (
        SELECT vec_id, vec,
               row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) - 1 AS cluster,
               sqrt({_SQL_DOT.format(a='vec', b='vec')}) AS cnorm
        FROM vecs
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ), scores AS (
        SELECT v.vec_id AS id, cent.cluster,
               {_SQL_DOT.format(a='v.vec', b='cent.vec')}
               / nullif(cent.cnorm, 0.0) AS score
        FROM vecs v CROSS JOIN cent
    ), pri AS (
        SELECT id, cluster FROM (
            SELECT id, cluster, row_number() OVER (
                PARTITION BY id ORDER BY score DESC, cluster ASC
            ) AS crank FROM scores
        ) WHERE crank = 1
    ), counts AS (
        SELECT cluster, count(*) AS n_docs FROM pri GROUP BY 1
    ), m AS (
        SELECT min(n_docs) AS n_min FROM counts
    ), rates AS (
        SELECT cluster, n_docs,
               sqrt(CAST(n_min AS DOUBLE) / n_docs) AS rate
        FROM counts, m
    )
    SELECT p.id AS vec_id, p.cluster, r.n_docs,
           round(r.rate, 6) AS keep_rate,
           CAST(('0x' || substr(md5(CAST(p.id AS VARCHAR) || '|' ||
                'clusterbal-v1'), 1, 15)) AS BIGINT) % 1000000
               < CAST(floor(r.rate * 1000000) AS BIGINT) AS kept
    FROM pri p JOIN rates r USING (cluster)
    UNION ALL
    SELECT vec_id, -1, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
           TRUE
    FROM raw0 WHERE vec IS NULL OR len(vec) = 0
    """


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_cluster_balance_kind(spark, sf_dir):
    from formula1_data_pipeline_spark.operators.similarity import (
        cluster_balanced_resample,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    sdf = cluster_balanced_resample(
        emb, dim=64, n_centroids=16).toPandas()
    odf = run_oracle(_balance_oracle(), sf_dir)
    _compare_frames(sdf, odf)
    # non-vacuous: rates genuinely vary and the smallest cluster
    # keeps everything
    real = sdf[sdf["cluster"] >= 0]
    assert real["keep_rate"].nunique() > 1
    top = real[real["keep_rate"] == 1.0]
    assert len(top) and top["kept"].all()


# --------------------------------------------------------------------
# Shard integrity manifest (shards.py::shard_integrity_manifest,
# round 14) — per-shard (n_rows, rank slice, contiguous, order-free
# 60-bit XOR content fingerprint): the verification a trainer or a
# cross-site copy runs before consuming a 100 TB shard export. One
# map-side partial aggregate per shard key; partials merge (XOR), so
# per-file manifests fold. Exact md5/integer arithmetic -> FULL
# value hash. LANDING ROUTE: rides q94's r16 re-gate as
# kind='manifest' rows over the SAME bins/rank CTEs q94 already
# computes (group the existing r CTE by shard).


def _manifest_oracle() -> str:
    from formula1_data_pipeline_spark.queries_llm import (
        _bpe_sql_pattern,
    )

    return rf"""
    WITH d AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_bpe_sql_pattern()}'))
                    AS BIGINT) AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum_before
        FROM d
    ), bins AS (
        SELECT CAST(cum_before // 512 AS BIGINT) AS bin_id
        FROM c GROUP BY 1
    ), h AS (
        SELECT bin_id,
               CAST(('0x' || substr(md5(CAST(bin_id AS VARCHAR)
                    || '|' || 'epoch-1'), 1, 15)) AS BIGINT) AS _h
        FROM bins
    ), r AS (
        SELECT bin_id,
               row_number() OVER (ORDER BY _h, bin_id) - 1 AS epoch_rank
        FROM h
    ), s AS (
        SELECT bin_id, epoch_rank,
               epoch_rank // 16 AS shard,
               epoch_rank % 16 AS row_in_shard
        FROM r
    )
    SELECT shard, count(*) AS n_rows,
           min(epoch_rank) AS rank_min,
           max(epoch_rank) AS rank_max,
           max(epoch_rank) - min(epoch_rank) + 1 = count(*)
               AND min(row_in_shard) = 0
               AND max(row_in_shard) = count(*) - 1 AS contiguous,
           bit_xor(CAST(('0x' || substr(md5(
               CAST(bin_id AS VARCHAR) || '|' ||
               CAST(epoch_rank AS VARCHAR) || '|' || 'shardfp-v1'
           ), 1, 15)) AS BIGINT)) AS content_fp
    FROM s GROUP BY shard
    """


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_shard_manifest_kind(spark, sf_dir):
    from formula1_data_pipeline_spark.operators import text as T
    from formula1_data_pipeline_spark.operators.packing import (
        pack_sequences,
    )
    from formula1_data_pipeline_spark.operators.shards import (
        epoch_shuffle,
        shard_integrity_manifest,
    )
    from formula1_data_pipeline_spark.queries import load

    docs = load(spark, sf_dir, "documents")["documents"]
    bins = (
        pack_sequences(docs, T.bpe_token_count(F.col("text")),
                       budget=512, id_col="doc_id", bucket_size=1000)
        .groupBy("bin_id").agg(F.count("*").alias("n_docs"))
    )
    ranked = epoch_shuffle(bins, epoch_salt="epoch-1",
                           rows_per_shard=16, id_col="bin_id")
    sdf = shard_integrity_manifest(ranked, id_col="bin_id").toPandas()
    odf = run_oracle(_manifest_oracle(), sf_dir)
    _compare_frames(sdf, odf)
    assert sdf["contiguous"].all()
