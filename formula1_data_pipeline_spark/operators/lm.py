"""N-gram language-model quality scoring — the CCNet-style corpus
filter (Wenzek et al. 2019, arXiv 1911.00359: perplexity of a LM
trained on a reference corpus buckets web documents into
head/middle/tail quality terciles), with the distributed stupid
backoff estimator of Brants et al. 2007 ("Large Language Models in
Machine Translation", EMNLP) — the n-gram scheme designed precisely
for MapReduce-shaped training where the model is a distributed count
TABLE, not a driver-resident artifact.

Not in the reference (`/root/reference` has no LM surface); mandated
by the §2.12 extension charter — this is the quality-filter stage a
training-data pipeline runs between ingest and dedup, complementary
to q99's trained classifier (supervised, fixed feature set) and
q93's DSIR weights (unigram target-ratio): the bigram LM captures
word ORDER, so shuffled/garbled text that passes unigram filters
scores low here.

Cross-engine determinism discipline (the q93/q39 rule): all
aggregation is exact INTEGER sums (order-independent, bit-identical
across engines); each output score is ONE IEEE divide of two integer
totals, rounded to 6 dp. The paper's log-probability perplexity
needs ln() whose last-ulp behavior differs between JVM Math.log and
C libm, so a value-hash oracle cannot tolerate it; the ratio-of-sums
surrogates below preserve the ranking signal (per-class conditional
mass) with zero libm calls. A deployment free of the cross-engine
constraint can swap the final projection for true log-perplexity
without touching the counting pipeline, which is the expensive part.

Scale shape (100 TB): bigram extraction is a pure array expression
(``transform(sequence(...))``) — no window, no shuffle, no per-doc
state; both model tables come from one map-side partial-aggregated
``groupBy`` each, so the exchanges move partial rows (vocabulary- and
bigram-type-sized), not token occurrences. Scoring joins the
(doc, bigram) stream against the model tables keyed by term — a
stopword-grade hot prefix STREAMS through its sort-merge-join task
(one build row per key, the q93 lesson; never a window over
occurrences). The model is never collected to the driver: at web
scale the bigram table is billions of rows and stays a first-class
distributed table exactly as in Brants et al. One integer-sum
aggregation per doc ends the pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.dedup import tokens

#: stupid backoff weight alpha = 0.4 (Brants et al. 2007 §4) as an
#: exact dyadic-free rational — kept num/den so the surrogate scores
#: below stay integer-exact until the single final divide.
BACKOFF_NUM = 2
BACKOFF_DEN = 5


def bigrams(col: Column) -> Column:
    """Adjacent token pairs of lower-cased whitespace tokens, as an
    array<struct<w1,w2>> — built with ``transform(sequence(...))`` so
    pair construction is a row-local array expression (no posexplode
    self-join, no per-doc window). ``element_at`` is 1-based, matching
    DuckDB's ``toks[i]`` for the oracle twin.

    Docs with <2 tokens return NULL, not an empty array: Spark's
    ``sequence(2, size)`` DESCENDS when size < 2 (sequence(2,1) is
    [2,1], and element_at(_, 0) then raises), so the short-doc case
    must be guarded out before the transform — and ``explode(NULL)``
    already yields zero rows, exactly like an empty array would.

    The token array is bound as a LAMBDA VARIABLE via a one-element
    array wrapper (r14 optimization): higher-order functions evaluate
    interpreted with NO subexpression caching, so a ``tokens(col)``
    subtree referenced inside the lambda body used to re-split the
    WHOLE document for every ``element_at`` — O(tokens^2) regex work
    per doc (measured: q65's LM leg spent 19 s of its 21 s just
    materializing 360k bigram rows at sf0.1; linear after the
    binding). The wrapper evaluates ``tokens(col)`` once (argument
    position), the inner lambda touches only the bound variable, and
    the emitted pairs are value-identical."""
    return F.element_at(
        F.transform(F.array(tokens(col)), _pairs_of_bound_toks), 1)


def _pairs_of_bound_toks(toks: Column) -> Column:
    """Adjacent-pair construction over an already-BOUND token array
    (a lambda variable or attribute — never an expression subtree,
    see ``bigrams``)."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(toks)),
            lambda i: F.struct(
                F.element_at(toks, i - 1).alias("w1"),
                F.element_at(toks, i).alias("w2"),
            ),
        ),
    )


def train_ngram_lm(
    docs: DataFrame,
    is_reference: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """Count a bigram LM over the REFERENCE slice of ``docs`` (the
    docs where ``is_reference`` holds — CCNet's "clean corpus" side,
    e.g. a quality predicate or a trusted-domain flag).

    Returns three distributed count tables (never driver-collected):
      ``bigrams``  : (w1, w2, c2)   — bigram type counts
      ``unigrams`` : (w, c1)        — unigram type counts
      ``totals``   : (n_ref_tokens) — ONE row, reference token count

    Each table is one map-side partial-aggregated ``groupBy`` over
    the reference token/pair stream; the model stays a table so
    scoring is a join, per Brants et al. 2007.
    """
    ref = docs.filter(is_reference).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__text")
    )
    toks = ref.select(F.explode(tokens(F.col("__text"))).alias("w"))
    pairs = ref.select(F.explode(bigrams(F.col("__text"))).alias("p"))
    return {
        "bigrams": pairs.groupBy(
            F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
        ).agg(F.count("*").alias("c2")),
        "unigrams": toks.groupBy("w").agg(F.count("*").alias("c1")),
        "totals": toks.agg(F.count("*").alias("n_ref_tokens")),
    }


def score_ngram_lm(
    docs: DataFrame,
    model: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against a trained bigram LM. One row per
    INPUT doc (the q89 contract — a vanished row is indistinguishable
    from a filtered one downstream); docs with <2 tokens come back
    with n_bigrams 0 and NULL scores.

    Output columns (all sums exact integers, one divide per score):
      n_bigrams      : bigram occurrences in the doc
      n_hits         : bigrams present in the model
      n_oov          : bigrams whose CONTINUATION token is unseen
      hit_rate       : n_hits / n_bigrams                  (6 dp)
      cond_score     : sum(c2) / sum(c1 of prefix) over hits (6 dp) —
                       the ratio-of-sums surrogate for mean
                       conditional probability c2/c1
      backoff_score  : alpha * sum(c1 of continuation over misses)
                       / (n_ref_tokens * n_misses)          (6 dp) —
                       the stupid-backoff unigram leg, ratio-of-sums
      quality_bucket : CCNet-style head/middle/tail on hit_rate
                       (fixed thresholds 0.5 / 0.2 — deterministic,
                       unlike the paper's data-dependent terciles)
    """
    pairs = docs.select(
        F.col(id_col).alias("id"),
        F.explode(bigrams(F.col(text_col))).alias("p"),
    ).select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))

    big = model["bigrams"]
    uni = model["unigrams"]
    joined = (
        pairs.join(big, ["w1", "w2"], "left")
        .join(
            uni.select(F.col("w").alias("w1"), F.col("c1").alias("c1_prefix")),
            "w1",
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1_cont")),
            "w2",
            "left",
        )
    )
    hit = F.col("c2").isNotNull()
    agg = joined.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum(F.when(hit, 1).otherwise(0)).alias("n_hits"),
        F.sum(F.when(F.col("c1_cont").isNull(), 1).otherwise(0)).alias(
            "n_oov"
        ),
        F.sum(F.when(hit, F.col("c2")).otherwise(0)).alias("hit_num"),
        F.sum(F.when(hit, F.col("c1_prefix")).otherwise(0)).alias("hit_den"),
        F.sum(
            F.when(~hit, F.coalesce(F.col("c1_cont"), F.lit(0))).otherwise(0)
        ).alias("miss_num"),
    )
    out = (
        docs.select(F.col(id_col).alias("id"))
        .join(agg, "id", "left")
        .crossJoin(F.broadcast(model["totals"]))
    )
    n_miss = F.col("n_bigrams") - F.col("n_hits")
    return out.select(
        F.col("id").alias(id_col),
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
        F.round(
            F.col("n_hits").cast("double")
            / F.nullif(F.col("n_bigrams"), F.lit(0)).cast("double"),
            6,
        ).alias("hit_rate"),
        F.round(
            F.col("hit_num").cast("double")
            / F.nullif(F.col("hit_den"), F.lit(0)).cast("double"),
            6,
        ).alias("cond_score"),
        F.round(
            (F.lit(BACKOFF_NUM) * F.col("miss_num")).cast("double")
            / (
                F.lit(BACKOFF_DEN)
                * F.col("n_ref_tokens")
                * F.nullif(n_miss, F.lit(0))
            ).cast("double"),
            6,
        ).alias("backoff_score"),
        F.when(F.col("n_bigrams").isNull() | (F.col("n_bigrams") == 0), None)
        .when(
            F.col("n_hits") * 2 >= F.col("n_bigrams"), F.lit("head")
        )
        .when(
            F.col("n_hits") * 5 >= F.col("n_bigrams"), F.lit("middle")
        )
        .otherwise(F.lit("tail"))
        .alias("quality_bucket"),
    )


def score_hit_rate(
    docs: DataFrame,
    model: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The hit-rate-only scoring path: (id_col, n_bigrams, n_hits,
    hit_rate) — identical hit_rate values to :func:`score_ngram_lm`
    (same pair stream, same join, same integer sums, same single
    6-dp divide), with the two unigram joins REMOVED.

    Exists because Catalyst cannot prune them away itself: they are
    LEFT joins against a non-declared-unique key, so even when no
    downstream column references them the optimizer must assume they
    could duplicate rows and keeps them. A consumer that needs only
    hit_rate (the CCNet-bucket signal — e.g. the curation composite
    chain) pays two full join stages for nothing through the general
    path; this one is one join + one aggregate. One row per INPUT
    doc, <2-token docs score NULL, as in the general path."""
    pairs = docs.select(
        F.col(id_col).alias("id"),
        F.explode(bigrams(F.col(text_col))).alias("p"),
    ).select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    agg = (
        pairs.join(model["bigrams"], ["w1", "w2"], "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(
                F.when(F.col("c2").isNotNull(), 1).otherwise(0)
            ).alias("n_hits"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(agg, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long")
            .alias("n_bigrams"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.col("n_hits").cast("double")
                / F.nullif(F.col("n_bigrams"), F.lit(0)).cast("double"),
                6,
            ).alias("hit_rate"),
        )
    )
