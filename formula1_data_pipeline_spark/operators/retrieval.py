"""BM25 ranked retrieval over the document corpus — Robertson &
Sparck Jones probabilistic weighting in its BM25 form (Robertson et
al., TREC-3 1994; Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework: BM25 and Beyond"). The retrieval leg a
training-data pipeline needs for targeted corpus auditing: "show me
the documents this benchmark question could have leaked from"
(decontamination triage, q66's contamination check turned into a
ranked search), and for building retrieval training pairs.

Not in the reference (`/root/reference` has no search surface);
§2.12 extension charter. Complements q39 (TF-IDF top terms PER DOC)
with the transposed problem: top docs per QUERY, with the BM25
saturation + length normalization that plain TF-IDF lacks.

Cross-engine determinism discipline: BM25's ln() idf is replaced by
the linear idf ratio (N - df + 0.5)/(df + 0.5) — the q39 rule (no
libm in a value-hashed oracle path; monotone in the same direction,
so rankings for a fixed query differ only where ln's compression
reorders cross-term sums — acceptable for a corpus-audit surface and
exactly reproducible, which the audit needs more). With the standard
constants k1 = 6/5 and b = 3/4 held as exact rationals, every factor
of the per-(query,doc,term) score is an INTEGER product (exact in
doubles below 2^53), so the score is ONE IEEE divide, rounded to
6 dp, then summed per (query,doc) as DECIMAL — exact and
order-independent, the property a float sum over a shuffled term
stream cannot give. At planet scale the integer products approach
2^53 (tf·T·N terms); move the construction to DECIMAL(38,0) there —
the plan shape is unchanged.

Scale shape (100 TB): this is the classic distributed
posting-intersection plan — tf/df/dl each one map-side
partial-aggregated groupBy; the query-term table (tiny) BROADCASTS
onto the tf stream so candidate generation touches only postings of
query terms (filter-before-join: the inner join IS the pruning);
corpus stats ride in as a broadcast 1-row frame, never a driver
collect. The only per-query state is a top-k window over that
query's candidate docs — partitioned by query_id, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from formula1_data_pipeline_spark.operators.dedup import tokens

#: k1 = 6/5, b = 3/4 (the standard Robertson defaults) pre-folded
#: into the scaled-integer construction below; changing them means
#: re-deriving the three coefficients, so they are constants, not
#: parameters:  tf_norm = tf(k1+1) / (tf + k1(1 - b + b·dl·N/T))
#: scaled through by 20T  →  44·tf·T / (20·tf·T + 18·dl·N + 6·T).
_TFN_NUM_COEF = 44
_TFN_TF_COEF = 20
_TFN_DL_COEF = 18
_TFN_CONST_COEF = 6


def bm25_topk(
    docs: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
) -> DataFrame:
    """Top-``k`` documents per query by linear-idf BM25.

    ``queries_df`` is a (query_id, query_text) frame — typically tiny
    (benchmark prompts, audit probes); it is broadcast onto the
    posting lists. Query terms are DISTINCT per query (standard bag-
    of-words BM25 treats repeated query terms via qtf, which is 1 for
    the audit/dedup probes this serves; distinct keeps the candidate
    join a set intersection).

    Output: one row per (query, retained doc) —
      query_id, doc_id, n_terms_matched, score (double, 6 dp sum of
      6 dp term scores), rank (1-based, dense in each query).
    Ties break on (score desc, doc_id asc) — fully deterministic.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # corpus stats from the dl aggregate (one row per token-bearing
    # doc) — NOT count_distinct over the occurrence stream, which
    # re-shuffles every token just to count docs. N therefore counts
    # token-bearing docs: an empty doc can never match a term, and
    # excluding it from N only rescales idf by a constant.
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("n_tokens"),
    )

    qterms = queries_df.select(
        F.col(qid_col).alias("query_id"),
        F.explode(F.array_distinct(tokens(F.col(qtext_col)))).alias("term"),
    )

    cand = (
        tf.join(F.broadcast(qterms), "term")
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )

    n, t = F.col("n_docs"), F.col("n_tokens")
    idf_num = (2 * n - 2 * F.col("df") + 1).cast("double")
    idf_den = (2 * F.col("df") + 1).cast("double")
    tfn_num = (_TFN_NUM_COEF * F.col("tf") * t).cast("double")
    tfn_den = (
        _TFN_TF_COEF * F.col("tf") * t
        + _TFN_DL_COEF * F.col("dl") * n
        + _TFN_CONST_COEF * t
    ).cast("double")
    term_score = F.round(
        (idf_num * tfn_num) / (idf_den * tfn_den), 6
    ).cast("decimal(18,6)")

    scored = cand.groupBy("query_id", "doc_id").agg(
        F.count("*").alias("n_terms_matched"),
        F.sum(term_score).alias("score_dec"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_dec").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.col("n_terms_matched").cast("long").alias("n_terms_matched"),
            F.col("score_dec").cast("double").alias("score"),
            "rank",
        )
    )
