"""Sequence packing — assigning documents to fixed token-budget bins.

LLM training consumes documents packed into fixed-length sequences
("sample packing"): walk the corpus in a deterministic order, keep a
running token count, and a document's bin is the budget-window its
start lands in. The semantics are a global exclusive prefix sum over
the ordered token counts — which is exactly the operation a naive
window (``Window.orderBy(...)`` with no partition) would funnel
through ONE task at 100 TB.

The scale shape here is the classic two-level distributed prefix sum:

1. range-bucket the order key (contiguous id ranges, so bucket order
   equals document order),
2. one hash aggregate computes each bucket's token total,
3. the tiny bucket table (corpus_rows / bucket_size rows) takes the
   only global-ordered window — thousands of rows, not billions,
4. bucket offsets broadcast-join back and a PARTITIONED window
   (partitionBy bucket) finishes the within-bucket prefix.

Total cost: one narrow aggregate + one broadcast join + one bounded
window per bucket. No global sort, no single-task stage; bucket_size
tunes the tradeoff between driver-side table size and per-bucket
window width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Spark simpleString dtypes the range-bucketing math is valid for
_NUMERIC_DTYPES = {"tinyint", "smallint", "int", "bigint",
                   "float", "double"}


def _require_numeric_id(df: DataFrame, id_col: str, op: str) -> None:
    """Driver-side schema check (no plan change): the floor-division
    range bucketing silently NULLs on non-numeric ids — fail loudly
    instead (round-8 ADVICE)."""
    dt = dict(df.dtypes).get(id_col)
    if dt is None:
        raise TypeError(f"{op}: id column {id_col!r} not in "
                        f"{df.columns}")
    if dt not in _NUMERIC_DTYPES and not dt.startswith("decimal"):
        raise TypeError(
            f"{op}: id column {id_col!r} must be numeric for range "
            f"bucketing (got {dt}); map string ids to a dense numeric "
            f"rank first (see shards.epoch_shuffle)")


def pack_sequences(
    docs: DataFrame,
    n_tokens: Column,
    budget: int = 512,
    id_col: str = "doc_id",
    bucket_size: int = 1000,
) -> DataFrame:
    """Assign each document a packing bin: bin_id = which
    ``budget``-token window the document's start offset falls in when
    documents are laid out in ``id_col`` order. Returns
    (id_col, n_tokens, bin_id, pack_pos) where pack_pos is the start
    offset within the bin. Deterministic — depends only on ids and
    token counts, not on physical partitioning.

    ``id_col`` must be NUMERIC: the range-bucketing step
    (``floor(id / bucket_size)``) relies on bucket order equaling id
    order, which only a numeric id gives (hash-bucketing a string id
    would break the prefix-sum ordering, and floor-division on a
    string silently yields NULL buckets — collapsing the two-level
    prefix sum into one unpartitioned window, the single-task stage
    this operator exists to avoid; round-8 ADVICE item). Non-numeric
    ids raise loudly; map string ids to a dense numeric rank first
    (``shards.epoch_shuffle``'s md5-rank is the repo's recipe).
    """
    _require_numeric_id(docs, id_col, "pack_sequences")
    d = docs.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.floor(F.col(id_col) / bucket_size).alias("_bkt"),
    )
    bucket_sums = d.groupBy("_bkt").agg(
        F.sum("n_tokens").alias("_bsum")
    )
    # the only unpartitioned window runs over the tiny bucket table
    w_off = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        "_bkt",
        F.coalesce(F.sum("_bsum").over(w_off), F.lit(0)).alias("_offset"),
    )
    w_in = (
        Window.partitionBy("_bkt").orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "_cum_before",
            F.col("_offset")
            + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)),
        )
        .select(
            id_col,
            "n_tokens",
            F.floor(F.col("_cum_before") / budget).alias("bin_id"),
            (F.col("_cum_before") % budget).alias("pack_pos"),
        )
    )


def chunk_token_stream(
    toks: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    bucket_size: int = 1000,
) -> DataFrame:
    """Concatenate-then-chunk: place every token of a positioned
    token stream (the ``bpe_tokenize``/q98 shape — one row per token,
    dense ``pos_col`` within ``id_col``) at its GLOBAL offset in
    document-id order and slice the stream into fixed ``seq_len``
    training sequences — the GPT-pretraining input layout, where a
    sequence may span document boundaries and long documents split
    across sequences (``pack_sequences`` above is the
    whole-document-per-bin variant; this is the token-exact one).

    Adds (global_pos, seq_id, seq_pos): ``global_pos`` dense from 0
    across the corpus, ``seq_id = global_pos // seq_len``, every
    sequence but the last exactly ``seq_len`` tokens. Deterministic —
    a pure function of (id order, per-doc positions).

    Scale shape: per-doc token counts (map-side partial agg) feed the
    SAME two-level prefix sum ``pack_sequences`` uses (with
    budget = seq_len, a doc's bin/offset IS its global start slot:
    start = bin_id * seq_len + pack_pos), then one join of the
    doc-level offset table back onto the stream — no global sort, no
    single-task stage, and the stream moves through exactly one
    doc-keyed shuffle.

    ``id_col`` must be numeric — the same range-bucketing
    precondition as ``pack_sequences`` (validated there; the check
    runs here too so the error names THIS operator).

    Gated round 9 as q19_token_chunks (built and
    cross-engine-validated round 8; the r8 gate budget was full)."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1: {seq_len}")
    _require_numeric_id(toks, id_col, "chunk_token_stream")
    counts = toks.groupBy(id_col).agg(F.count("*").alias("__n"))
    packed = pack_sequences(
        counts, F.col("__n"), budget=seq_len, id_col=id_col,
        bucket_size=bucket_size,
    ).select(
        id_col,
        (F.col("bin_id") * seq_len + F.col("pack_pos")).alias("__start"),
    )
    g = F.col("__start") + F.col(pos_col)
    return (
        toks.join(packed, id_col)
        .select(
            *toks.columns,
            g.cast("long").alias("global_pos"),
            F.floor(g / seq_len).cast("long").alias("seq_id"),
            (g % seq_len).cast("long").alias("seq_pos"),
        )
    )


def pack_examples_nostraddle(
    examples: DataFrame,
    n_tokens: Column,
    budget: int = 512,
    id_col: str = "example_id",
    bucket_size: int = 1000,
) -> DataFrame:
    """Greedy NO-STRADDLE packing: walk examples in ``id_col`` order,
    append each to the current bin, open a new bin when it would not
    fit. Returns (id_col, n_tokens, bin_id, pack_pos) with every
    example FULLY inside one bin — the SFT-packing contract
    (``pack_sequences`` lets documents span window boundaries, which
    is the pretraining-stream layout, not the instruction-tuning
    one). Examples longer than ``budget`` fail loudly — truncate or
    chunk upstream.

    Greedy fill is a sequential fold (current fill resets at bin
    breaks), not a prefix sum, so the scale shape differs from
    ``pack_sequences``: (1) bucket by id range, (2) fold each
    bucket's sorted examples with ONE array ``F.aggregate`` (bounded
    at bucket_size elements; interpreted HOF, but linear and
    parallel across buckets — the price of exact greedy semantics),
    (3) bins do NOT cross bucket boundaries, so each bucket's
    bins_used is independent and the global bin id is the two-level
    prefix sum over the tiny bucket table. The bucket-aligned bin
    break wastes at most one partial bin per bucket_size examples —
    at real corpus scale a vanishing fraction, and the determinism
    it buys is what makes the layout reproducible and oracle-
    replayable.
    """
    _require_numeric_id(examples, id_col, "pack_examples_nostraddle")
    # STRICTER than pack_sequences: the per-bucket fold carries the id
    # through a struct<_id:long> array, so a fractional float/double
    # id would be silently truncated — 1.5 and 1.2 collide as 1 and
    # the caller's join-back on id_col (sft_pack_with_loss_mask)
    # drops every such row with zero output and zero errors.
    from formula1_data_pipeline_spark.operators._guards import (
        require_integral,
    )

    require_integral(
        examples, [id_col], "pack_examples_nostraddle",
        hint="the bucket fold carries ids as longs, so fractional "
             "ids would be silently truncated — map to a dense "
             "integer rank first")
    n_guard = F.when(
        n_tokens.cast("long") <= budget, n_tokens.cast("long")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("pack_examples_nostraddle: example "),
                F.col(id_col).cast("string"),
                F.lit(f" exceeds the bin budget {budget}; truncate or "
                      "chunk upstream"),
            )
        ).cast("long")
    )
    d = examples.select(
        F.col(id_col).alias("_id"),
        n_guard.alias("_n"),
        F.floor(F.col(id_col) / bucket_size).alias("_bkt"),
    )
    per_bucket = d.groupBy("_bkt").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_id"), F.col("_n")))
        ).alias("_ex")
    )
    # one sequential fold per bucket: acc = (rows, bin, fill)
    folded = per_bucket.select(
        "_bkt",
        F.aggregate(
            F.col("_ex"),
            F.struct(
                F.array().cast(
                    "array<struct<_id:long,_n:long,_bin:long,_pos:long>>"
                ).alias("rows"),
                F.lit(0).cast("long").alias("bin"),
                F.lit(0).cast("long").alias("fill"),
            ),
            lambda acc, e: F.struct(
                F.concat(
                    acc["rows"],
                    F.array(F.struct(
                        e["_id"].cast("long").alias("_id"),
                        e["_n"].alias("_n"),
                        F.when(acc["fill"] + e["_n"] > budget,
                               acc["bin"] + 1)
                        .otherwise(acc["bin"]).alias("_bin"),
                        F.when(acc["fill"] + e["_n"] > budget,
                               F.lit(0).cast("long"))
                        .otherwise(acc["fill"]).alias("_pos"),
                    )),
                ).alias("rows"),
                F.when(acc["fill"] + e["_n"] > budget, acc["bin"] + 1)
                .otherwise(acc["bin"]).alias("bin"),
                F.when(acc["fill"] + e["_n"] > budget, e["_n"])
                .otherwise(acc["fill"] + e["_n"]).alias("fill"),
            ),
        ).alias("_acc"),
    ).select(
        "_bkt",
        F.col("_acc.rows").alias("_rows"),
        (F.col("_acc.bin") + 1).alias("_bins_used"),
    )
    # two-level prefix: global bin offset per bucket (tiny table)
    w_off = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = folded.select(
        "_bkt", "_rows",
        F.coalesce(F.sum("_bins_used").over(w_off), F.lit(0))
        .alias("_bin_off"),
    )
    return offsets.select(
        "_bin_off", F.explode("_rows").alias("r")
    ).select(
        F.col("r._id").alias(id_col),
        F.col("r._n").alias("n_tokens"),
        (F.col("_bin_off") + F.col("r._bin")).alias("bin_id"),
        F.col("r._pos").alias("pack_pos"),
    )


def sft_pack_with_loss_mask(
    examples: DataFrame,
    prompt_tokens: Column,
    completion_tokens: Column,
    budget: int = 512,
    id_col: str = "example_id",
    bucket_size: int = 1000,
) -> DataFrame:
    """Instruction-tuning layout over ``pack_examples_nostraddle``:
    each (prompt, completion) example packs whole into a bin, and the
    output carries what the trainer's collator needs per example —
    (id_col, bin_id, pack_pos, n_tokens, loss_start, loss_end,
    attn_seg): loss is masked over the prompt span (loss covers
    [pack_pos + prompt, pack_pos + prompt + completion) within the
    bin), and ``attn_seg`` is the example's index within its bin (the
    block-diagonal attention segment id — packed neighbors must not
    attend to each other). All integer arithmetic on the packer's
    exact offsets — hash-gateable."""
    total = (prompt_tokens.cast("long")
             + completion_tokens.cast("long"))
    base = examples.select(
        F.col(id_col),
        prompt_tokens.cast("long").alias("_p"),
        total.alias("_t"),
    )
    packed = pack_examples_nostraddle(
        base, F.col("_t"), budget=budget, id_col=id_col,
        bucket_size=bucket_size,
    )
    # id_col tiebreak: a zero-token example shares pack_pos with its
    # successor, and row_number over equal keys would be
    # partition-layout-dependent — breaking the hash-gate contract
    w_seg = Window.partitionBy("bin_id").orderBy("pack_pos", id_col)
    return (
        packed.join(base.select(id_col, "_p"), id_col)
        .select(
            id_col,
            "bin_id",
            "pack_pos",
            "n_tokens",
            (F.col("pack_pos") + F.col("_p")).alias("loss_start"),
            (F.col("pack_pos") + F.col("n_tokens")).alias("loss_end"),
        )
        .withColumn(
            "attn_seg",
            (F.row_number().over(w_seg) - 1).cast("long"),
        )
    )
