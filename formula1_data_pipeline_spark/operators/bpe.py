"""Distributed BPE merge training — learning a byte-pair vocabulary
from the corpus with bounded-iteration DataFrame aggregates.

q33 estimates token costs with a FIXED pre-tokenizer regex; a corpus
pipeline that ships tokenized data needs the merge table *trained on
that corpus* (Sennrich et al. 2016, arXiv 1508.07909). The classic
algorithm: split words into characters, repeatedly count adjacent
symbol pairs weighted by word frequency, merge the most frequent
pair, repeat for ``n_merges`` rounds.

Scale shape (the Lloyd-trainer pattern, similarity.py): the corpus is
touched ONCE — a pre-tokenize + word-count aggregation whose output
is the vocabulary-sized (word, freq) table (tens of millions of rows
at 100 TB, fully distributed, map-side partial agg). Every merge
round then runs ONE aggregation pass over that word table (pair
explode -> partial-agg count -> TakeOrdered argmax to the driver) —
no corpus rescans, plan depth constant per round (the symbol
representation is re-derived by a chain of literal ``replace``
expressions, one per merge SINCE THE LAST CHECKPOINT — pure codegen'd
string ops; every ``checkpoint_every`` merges the trainer
rematerializes the word table with the representation applied, the
way MLlib checkpoints iterative lineage, so a 32k-merge production
vocab never builds a 32k-deep expression). The merge table itself
lives on the driver: ``n_merges`` rows of a few short strings — the
same bounded-scalar argument as the k-means centroids.

Determinism (gate-grade): pair counts are integer sums of int
frequencies — exact on any partitioning; the argmax tie-breaks
lexicographically on (pair count desc, left, right), both engines
binary-compare ASCII; applying one merge is non-overlapping
left-to-right literal string replacement, identical in Spark and
DuckDB, so an unrolled-SQL oracle replays training EXACTLY.

Representation: each symbol is wrapped in its own pipe pair and
concatenated — "hello" -> "|h||e||l||l||o|". The pair (a, b) is then
the literal "|a||b|", replaced by "|ab|". The double delimiter is
load-bearing twice over: a bare-infix form ("a|b") can match inside
a longer symbol ("xa|b"), and a shared-single-delimiter form
("|a|b|") CONSUMES the boundary of an adjacent occurrence
("|a|b|a|b|" would merge once, not twice). With the pipe wrap both
stay correct ("|a||b||a||b|" -> "|ab||ab|"). Words containing the
delimiter itself are excluded from training (loudly documented;
real-corpus BPE trainers normalize such bytes away before counting).

Reference parity note: /root/reference has no tokenizer surface; this
is part of the SURVEY §2.12 training-data-pipeline mandate (round-7
verdict, "What's missing" #2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.text import bpe_tokens

#: symbol delimiter — words containing it are excluded from training
DELIM = "|"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq): pre-token frequencies over the corpus — the ONE
    corpus-wide pass of BPE training (q33's GPT-2-style pre-tokenizer,
    case and leading-space preserved). Map-side partial agg; output is
    vocabulary-sized."""
    return (
        docs.select(F.explode(bpe_tokens(F.col(text_col))).alias("w"))
        .filter(~F.col("w").contains(DELIM))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def _initial_repr(w: Column) -> Column:
    """'hello' -> '|h||e||l||l||o|' (every char wrapped)."""
    chars = F.filter(F.split(w, ""), lambda c: c != F.lit(""))
    return F.concat_ws(
        "", F.transform(
            chars, lambda c: F.concat(F.lit(DELIM), c, F.lit(DELIM))
        )
    )


def apply_merges(r: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply ``merges`` in order to an existing pipe-wrapped symbol
    representation — the TRAINER-side form.

    Shape (r14 optimization): a FOLD over one literal array of
    (search, replace) pairs instead of a chain of ``merges`` nested
    replace nodes. Value-identical — the fold runs the same
    ``replace`` calls on the same arguments in the same order — but
    the expression tree is constant-size, so per-round analysis cost
    in the trainer stops growing with the merge count and the
    compiled source is round-invariant (the folded literal array
    lands in the codegen references, not the source). The fold is a
    higher-order function (INTERPRETED eval, per row), which is the
    right trade only where the input is the vocabulary-sized word
    table and the plan is rebuilt every round (train_bpe_merges,
    _checkpoint_repr). Corpus-facing one-shot paths must use
    ``apply_merges_chain`` instead (round-15 fix: r14 routed
    bpe_tokenize's corpus-sized row stream through this fold and the
    per-row interpreted eval regressed q98 16%)."""
    if not merges:
        return r
    pairs = F.array(*[
        F.struct(
            F.lit(f"{DELIM}{a}{DELIM}{DELIM}{b}{DELIM}").alias("s"),
            F.lit(f"{DELIM}{a}{b}{DELIM}").alias("t"),
        )
        for a, b in merges
    ])
    return F.aggregate(
        pairs, r, lambda acc, m: F.replace(acc, m["s"], m["t"]))


def apply_merges_chain(r: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply ``merges`` in order as a chain of nested ``replace``
    nodes — the CORPUS-side form: whole-stage-codegen'd (fused,
    compiled once per plan), value-identical to ``apply_merges``
    (same replaces, same order; twin-pinned in test_bpe). The plan
    is built ONCE per tokenize/score call, so the chain's size-in-
    merges is a one-time analysis cost, not the trainer's per-round
    quadratic — and per ROW it beats the interpreted fold on every
    corpus-sized stream."""
    for a, b in merges:
        r = F.replace(
            r,
            F.lit(f"{DELIM}{a}{DELIM}{DELIM}{b}{DELIM}"),
            F.lit(f"{DELIM}{a}{b}{DELIM}"),
        )
    return r


def merged_repr(w: Column, merges: list[tuple[str, str]]) -> Column:
    """The symbol representation of ``w`` after applying ``merges`` in
    order — trainer-side fold form (see ``apply_merges``)."""
    return apply_merges(_initial_repr(w), merges)


def merged_repr_chain(w: Column, merges: list[tuple[str, str]]) -> Column:
    """``merged_repr`` in the corpus-side codegen chain form (see
    ``apply_merges_chain``)."""
    return apply_merges_chain(_initial_repr(w), merges)


def repr_symbols(r: Column) -> Column:
    """Back from '|ab||c|' to ['ab', 'c']."""
    return F.filter(F.split(r, r"\|"), lambda x: x != F.lit(""))


def train_bpe_merges(
    docs: DataFrame | None,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    words: DataFrame | None = None,
    checkpoint_every: int = 128,
    plan_inspector=None,
    resume: tuple[DataFrame, list[tuple[str, str]]] | None = None,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns
    [(left, right, pair_count), ...] in training order. Stops early
    when no pair reaches ``min_count`` (or none exists). One corpus
    pass + one word-table aggregation per round; merge state is
    driver-resident (bounded).

    The (word, freq) table is persisted across rounds (it is the
    vocabulary-sized artifact the module docstring's "corpus is
    touched ONCE" contract rests on — without it every round's
    collect re-executes the corpus scan). Pass ``words`` (a
    ``word_freqs`` output you manage yourself, e.g. shared with
    ``build_vocab``) to skip the internal persist.

    Representation checkpointing (round-9 verdict item): the symbol
    representation is a chain of literal ``replace`` expressions, one
    per learned merge — at production vocab sizes (32k merges) an
    unbounded chain is a plan-size and Catalyst-analysis hazard
    (every round re-analyzes O(merges) expressions: quadratic total).
    Every ``checkpoint_every`` merges the word table is REMATERIALIZED
    with the accumulated representation applied and landed to scratch
    parquet (lineage truncation — persist alone leaves the logical
    plan growing), so the per-round replace chain is bounded by
    ``checkpoint_every`` and per-round analysis cost is constant.
    Training below ``checkpoint_every`` merges (every gated query:
    10) never checkpoints and runs the exact pre-checkpoint plan.
    Equivalence at small checkpoint intervals is property-tested
    (test_bpe.py); the 1,000-merge probe is recorded in SCALE.md.

    ``plan_inspector`` (tests/diagnostics only): called with each
    round's pair-source DataFrame before it executes, so a test can
    assert the actual analyzed-plan expression depth stays bounded.

    ``resume=(words_repr, prior_merges)``: continue a previous run
    from its checkpoint — ``words_repr`` is a (freq, repr) frame
    (``checkpoint_words_repr``'s output, or the scratch parquet a
    crashed run left behind) whose repr has ``prior_merges`` already
    applied. The return value contains only the NEW merges; training
    is provably identical to an uninterrupted run (tested). With
    ``resume`` set, ``docs``/``words`` are unused and may be None —
    resuming never rescans the corpus.
    """
    if resume is not None:
        ckpt, prior = resume
        merges: list[tuple[str, str]] = list(prior)
        n_ckpt = len(merges)
        own_words = False
    else:
        own_words = words is None
        if own_words:
            words = word_freqs(docs, text_col).persist()
        merges = []
        ckpt = None  # (freq, repr) at last checkpoint
        n_ckpt = 0  # merges already baked into ckpt's repr
    out: list[tuple[str, str, int]] = []
    # unpersist on EVERY exit — an exception in a per-round collect
    # must not leak the cached frames for the session (round-8 ADVICE;
    # same shape as q98's shared-words finally)
    try:
        for _ in range(n_merges):
            if ckpt is None:
                syms = repr_symbols(merged_repr(F.col("w"), merges))
                d = words.select("freq", syms.alias("syms"))
            else:
                syms = repr_symbols(
                    apply_merges(F.col("repr"), merges[n_ckpt:]))
                d = ckpt.select("freq", syms.alias("syms"))
            if plan_inspector is not None:
                plan_inspector(d)
            n = F.size("syms")
            pairs = d.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", F.lit(1), n - 1).alias("a"),
                        F.slice("syms", F.lit(2), n - 1).alias("b"),
                    )
                ).alias("p"),
            ).select("freq", F.col("p.a").alias("a"),
                     F.col("p.b").alias("b"))
            best = (
                pairs.groupBy("a", "b")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.col("cnt").desc(), F.col("a").asc(),
                         F.col("b").asc())
                .limit(1)
                .collect()
            )
            if not best or best[0]["cnt"] < min_count:
                break
            a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
            merges.append((a, b))
            out.append((a, b, cnt))
            if checkpoint_every and len(merges) % checkpoint_every == 0:
                ckpt = _checkpoint_repr(
                    words if ckpt is None else ckpt,
                    merges[n_ckpt:], base_is_words=ckpt is None)
                n_ckpt = len(merges)
    finally:
        if own_words:
            words.unpersist()
    return out


def checkpoint_words_repr(
        words: DataFrame,
        merges: list[tuple[str, str]]) -> DataFrame:
    """Materialize the (freq, repr) resume artifact from a
    ``word_freqs`` table with ``merges`` applied — what
    ``train_bpe_merges(resume=...)`` consumes. Landed to scratch
    parquet (lineage truncated), so the returned frame is a flat scan
    however deep the training history."""
    return _checkpoint_repr(words, merges, base_is_words=True)


def _checkpoint_repr(base: DataFrame,
                     pending: list[tuple[str, str]],
                     base_is_words: bool) -> DataFrame:
    """Land the word table's current symbol representation to scratch
    parquet and read it back — full lineage truncation, so the next
    training round's plan starts from a flat (freq, repr) scan. The
    checkpoint is the production artifact shape too: a crashed 32k-
    merge training run resumes from the last checkpoint + the merge
    list instead of replaying every round."""
    from formula1_data_pipeline_spark.scratch import scratch_dir

    r = _initial_repr(F.col("w")) if base_is_words else F.col("repr")
    path = scratch_dir("bpe-ckpt-") + "/words_repr"
    base.select("freq", apply_merges(r, pending).alias("repr")) \
        .write.mode("overwrite").parquet(path)
    return base.sparkSession.read.parquet(path)


def merges_df(spark, trained: list[tuple[str, str, int]]) -> DataFrame:
    """(merge_rank, lhs, rhs, merged, pair_count) — the vocab table
    downstream tokenization consumes ('left'/'right' avoided: both are
    SQL keywords/functions)."""
    rows = [(i, a, b, a + b, c) for i, (a, b, c) in enumerate(trained)]
    return spark.createDataFrame(
        rows, "merge_rank int, lhs string, rhs string, merged string, "
              "pair_count long",
    )


def bpe_encode_count(text: Column,
                     merges: list[tuple[str, str]]) -> Column:
    """Trained-vocab token count of a document: pre-tokenize, apply
    the merge table to every word, count surviving symbols. The
    trained companion of ``text.bpe_token_count`` (q33) — same
    pre-tokenizer, corpus-fitted vocabulary. Pure codegen'd
    expressions; delimiter-containing words count at their char
    length (they were excluded from training)."""
    per_word = F.transform(
        bpe_tokens(text),
        lambda w: F.when(
            w.contains(DELIM), F.length(w)
        ).otherwise(F.size(repr_symbols(merged_repr_chain(w, merges)))),
    )
    return F.coalesce(
        F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x),
        F.lit(0),
    )


def build_vocab(spark, docs: DataFrame,
                trained: list[tuple[str, str, int]],
                text_col: str = "text",
                words: DataFrame | None = None) -> DataFrame:
    """(sym, token_id): GPT-style id assignment — the training
    corpus's base alphabet first (dense ids in binary char order),
    then one id per merge in training order. The alphabet is
    collected to the driver (bounded: distinct characters of the
    corpus — a few hundred entries at any corpus size, the same
    bounded-scalar argument as k-means centroids), so the vocab table
    is driver-built and broadcast-joinable. Chars derive from the
    vocabulary-sized word table — pass the same ``words`` frame the
    trainer used to share one corpus pass across both."""
    if words is None:
        words = word_freqs(docs, text_col)
    chars = (
        words.select(F.explode(
            F.filter(F.split("w", ""), lambda c: c != F.lit(""))
        ).alias("c"))
        .distinct()
    )
    alphabet = sorted(r["c"] for r in chars.collect())
    rows = [(s, i) for i, s in enumerate(alphabet)] + [
        (a + b, len(alphabet) + k)
        for k, (a, b, _) in enumerate(trained)
    ]
    return spark.createDataFrame(rows, "sym string, token_id int")


def bpe_tokenize(docs: DataFrame,
                 trained: list[tuple[str, str, int]],
                 vocab: DataFrame,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Encode every document with the trained vocabulary: one row per
    token — (id_col, pos, sym, token_id), ``pos`` the dense 0-based
    position in the document's token stream. The shippable form of
    the tokenizer story (train q95 -> encode here -> pack q64 ->
    shard q94): exploded rather than array-valued, because at corpus
    scale the token stream IS the dataset — downstream packing,
    statistics, and shard writes all consume it relationally.

    Symbols outside the vocab map to token_id -1; words containing
    the training delimiter (excluded from training) degrade to their
    raw characters rather than lying. Pure codegen'd expressions +
    one broadcast vocab join + one per-doc window for ``pos``.
    """
    merges = [(a, b) for a, b, _ in trained]
    from pyspark.sql import Window

    w = F.col("w")
    syms = F.when(
        w.contains(DELIM),
        F.filter(F.split(w, ""), lambda c: c != F.lit("")),
    ).otherwise(repr_symbols(merged_repr_chain(w, merges)))
    tok = (
        docs.select(
            F.col(id_col),
            F.posexplode(bpe_tokens(F.col(text_col))).alias("widx", "w"),
        )
        .select(
            id_col, "widx",
            F.posexplode(syms).alias("sidx", "sym"),
        )
    )
    pos = F.row_number().over(
        Window.partitionBy(id_col).orderBy("widx", "sidx")
    ) - 1
    return (
        tok.withColumn("pos", pos)
        .join(F.broadcast(vocab), "sym", "left")
        .select(
            id_col,
            F.col("pos").cast("long").alias("pos"),
            "sym",
            F.coalesce("token_id", F.lit(-1)).cast("int")
            .alias("token_id"),
        )
    )
