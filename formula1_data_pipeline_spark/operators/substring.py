"""Cross-document exact-substring (span-level) deduplication.

The substring-granularity companion to the document-level dedup family
(exact q20, MinHash q21, incremental q87/q88, semantic q89): find and
cut byte-identical token spans of length >= L shared ACROSS documents
— boilerplate, licenses, memorizable quotes — the "deduplicate
training data at the substring level" pass every production corpus
pipeline runs alongside doc-level dedup (Lee et al. 2021, arXiv
2107.06499, whose suffix-array formulation this re-expresses in
relational shingle algebra so it runs as three Spark shuffles instead
of a single-machine suffix array).

Key identity: a duplicated span of >= L tokens shared by two documents
contains at least one matching L-gram, and every token of the span is
covered by some matching L-gram — so with shingle width k = L,
"tokens covered by cross-doc-matching k-shingles" is EXACTLY the set
of tokens inside shared spans >= L (no false negatives; runs shorter
than L produce no k-shingle and survive).

Semantics: the FIRST document (min doc_id) containing a given k-gram
keeps its copy; every later document's occurrences are marked for
cutting — the repo-wide smaller-id-wins convention, which also makes
the pass idempotent (re-running on the cleaned corpus finds nothing).
Maximal spans are the per-document union of covered token intervals,
merged across overlap AND adjacency: two matched starts p, p' with
p' <= p + k cover the contiguous token range [p, p'+k-1].

Scale shape (100 TB): the positional shingle table is ~one row per
corpus token, each row three integers wide after hashing; it moves
through three full shuffles — (1) by doc id for the lead-window
shingling, (2) by shingle hash for the first-occurrence join, (3) by
doc id for the island merge (per-doc row counts bound the window
partitions) — plus one small shuffle of map-side-reduced partial
minima. The global min(id) per shingle is a two-stage aggregate
(round-8 hardening): each map task emits at most one (h, min_id)
partial per shingle it sees (HashAggregate partial_min BEFORE the
exchange), the final agg per shingle receives at most one row per
upstream partition, and the per-row "is this the first doc?" test is
a sort-merge join of the stream against that one-row-per-shingle
table — which STREAMS through a hot key. A planet-scale hot shingle
(a license header shared by millions of docs) therefore costs a
linear streaming pass in the join task — the enumeration lower bound
— but never buffers its occurrence list the way the previous
Window.partitionBy(h) min did (WindowExec materializes each partition
frame before emitting; a million-row frame buffers and spills). The
shingle subtree feeds both the aggregate and the probe side; its
exchange-(1) output is reused (ReusedExchange), so the corpus is
shingled once. There is no pairwise blowup anywhere (the operator
never builds doc-pair candidates at all).

Reference parity note: /root/reference has no text operators; this is
part of the SURVEY §2.12 training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.dedup import tokens

DEFAULT_MIN_SPAN_TOKENS = 8


def positional_shingles(docs: DataFrame, k: int,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(id, pos, h): the 60-bit md5 hash of the k tokens starting at
    0-based token offset ``pos``, one row per start position — the
    position-KEEPING sibling of ``text.shingle_hashes_df`` (same
    lead-window shingling, same hash, but no distinct: span recovery
    needs every occurrence, including repeats within one doc). Null
    ids are dropped up front: a null id belongs to no document, and
    filtering HERE (rather than letting the consumer's join condition
    push the same isnotnull onto one branch only) keeps the two
    shingle subtrees of ``duplicate_spans`` canonically identical so
    AQE reuses the exchange instead of shingling the corpus twice."""
    ex = docs.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "t"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("t")] + [F.lead("t", i).over(w) for i in range(1, k)]
    shingled = ex.select(
        "id", "pos",
        F.concat_ws(" ", *parts).alias("sh"),
        parts[-1].isNotNull().alias("full"),
    ).filter(F.col("full"))
    h = F.conv(F.substring(F.md5(F.col("sh")), 1, 15), 16, 10).cast("long")
    return shingled.select("id", "pos", h.alias("h"))


def duplicate_spans(docs: DataFrame,
                    min_span_tokens: int = DEFAULT_MIN_SPAN_TOKENS,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Maximal cross-document duplicated spans to cut: one row per
    (doc_id, span_start, span_end, n_tokens), 0-based inclusive token
    offsets. A token position is covered iff some k-shingle through it
    also occurs in a document with a SMALLER id (k =
    ``min_span_tokens``); covered positions merge into maximal
    contiguous spans. The min-id document for each shingle keeps its
    text — so every duplicated span survives in exactly one place and
    the operator is idempotent on its own output.

    The cross-doc test is a two-stage min over the shingle hash: a
    map-side partial-aggregated ``groupBy(h).min(id)`` (each map task
    ships one partial row per shingle it holds; the final aggregate
    per shingle sees at most one row per upstream partition) joined
    back onto the shingle stream. A hot shingle streams through its
    join task instead of buffering a WindowExec frame — see the
    module docstring for the cost model and hot-shingle bound.
    """
    k = min_span_tokens
    sh = positional_shingles(docs, k, text_col, id_col)
    # min over struct(id, pos) == min(id) (ids are non-null), chosen so
    # the aggregate branch reads the SAME columns as the probe branch:
    # with equal column sets the two shingle subtrees canonicalize
    # identically and AQE reuses the by-id window exchange (verified in
    # tests/test_substring.py) — plain min(id) lets column pruning drop
    # `pos` from this branch and the corpus shingles twice.
    first = sh.groupBy("h").agg(
        F.min(F.struct("id", "pos"))["id"].alias("first_id")
    )
    # Deliberately NOT hinted SHUFFLE_HASH, though it measures ~1.5x
    # faster at sf0.1 (skips sorting the positional stream): the
    # build side is one row per DISTINCT shingle — stream-sized at
    # corpus scale — and Spark's shuffled-hash build must fit each
    # partition's map in executor memory. Sort-merge spills both
    # sides and streams hot keys; that robustness is the point of
    # this operator. AQE may still locally pick SHJ where a runtime
    # partition is genuinely small.
    starts = (
        sh.join(first, "h")
        .filter(F.col("id") > F.col("first_id"))
        .select("id", "pos")
    )
    # gaps-and-islands: matched starts p, p' merge while p' <= p + k
    # (covered intervals [p, p+k-1] overlap or touch); a new island
    # begins when the gap exceeds k
    w = Window.partitionBy("id").orderBy("pos")
    prev = F.lag("pos").over(w)
    island = F.sum(
        F.when(prev.isNull() | (F.col("pos") > prev + k), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        starts.withColumn("island", island)
        .groupBy("id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).alias("span_end"),
        )
        .select(
            F.col("id").alias("doc_id"),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("n_tokens"),
        )
    )


def cut_duplicate_spans(docs: DataFrame,
                        min_span_tokens: int = DEFAULT_MIN_SPAN_TOKENS,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """The cleaned-corpus projection of ``duplicate_spans``: one row
    per input document — (doc_id, clean_text, n_kept, n_cut) where
    ``clean_text`` is the surviving tokens (lower-cased,
    single-space-joined — the tokenizer's normal form) with every
    duplicated span removed, '' when the whole document was cut (an
    exact duplicate). Downstream filters drop or re-score short
    remnants; this operator only guarantees the cut is exact.

    Cost on top of the span pass: spans explode to cut positions
    (total cut tokens, disjoint by construction) and one anti-join of
    the token stream on (id, pos) — linear data movement, no pair
    blowup."""
    spans = duplicate_spans(docs, min_span_tokens, text_col, id_col)
    cut_pos = spans.select(
        F.col("doc_id").alias("id"),
        F.explode(F.sequence("span_start", "span_end")).alias("pos"),
    )
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "t"),
    )
    kept = (
        toks.join(cut_pos, ["id", "pos"], "left_anti")
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "t"))),
                    lambda s: s["t"],
                ),
                " ",
            ).alias("clean_text"),
            F.count("*").alias("n_kept"),
        )
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(tokens(F.col(text_col))).alias("n_total"),
    )
    return (
        base.join(kept, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_total") - F.coalesce("n_kept", F.lit(0)))
            .cast("long").alias("n_cut"),
        )
    )
