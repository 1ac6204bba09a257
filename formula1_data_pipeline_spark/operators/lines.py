"""Line-level corpus deduplication — the CCNet paragraph-dedup /
C4 boilerplate-removal stage (Wenzek et al. 2019, arXiv 1911.00359
§3.1 dedups paragraph hashes corpus-wide; Raffel et al. 2020, arXiv
1910.10683 §2.2 drops repeated three-sentence spans and boilerplate
lines). Web-crawl corpora repeat navigation chrome ("subscribe to our
newsletter", cookie banners) across millions of pages; dropping those
lines is the cheapest, highest-yield cleaning stage and runs BEFORE
document-level dedup (q20/q21) — whole-doc near-dup rates drop once
shared chrome is gone.

Not in the reference (`/root/reference` has no corpus surface);
§2.12 extension charter. Granularity ladder this completes:
whole-document (q20 exact / q21 MinHash), span-of-shingles (q90/q91),
and now LINE — the unit web boilerplate actually lives at.

Cross-engine determinism discipline: counting keys are the exact
normalized line strings (trim+lower), all aggregates are integer
counts or lexicographic (doc_id, pos) minima, and reassembly joins
kept lines back in original position order — every output cell
replays bit-for-bit in an ANSI-SQL oracle. No libm, no floats.

Scale shape (100 TB): line splitting is a row-local ``posexplode``
(no window, no shuffle); doc-frequency counting is a two-step
map-side partial aggregation (distinct (doc, line) pairs, then a
count keyed by the line — a million-doc boilerplate line partial-aggs
to one row per map task before the exchange, the q90 two-stage-min
lesson applied to counts); the hot-line table joins back against the
line stream keyed by the line (sort-merge anti/left join — hot build
keys are single rows, so probes stream). Reassembly is one
``groupBy(doc)`` whose state is bounded by a single document's lines
— the same per-doc bound every chunker/window in this repo accepts.
The only corpus-sized shuffles are the two countings and the
reassembly, each keyed well.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(line: Column) -> Column:
    """Counting key: case- and edge-whitespace-insensitive, exact
    otherwise (CCNet hashes the raw paragraph; lower+trim is the C4
    tolerance). The ORIGINAL line text is what reassembly keeps."""
    return F.trim(F.lower(line))


def dedup_lines(
    docs: DataFrame,
    min_docs: int = 2,
    keep: str = "none",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove corpus-wide duplicated lines from every document.

    A line is *hot* when its normalized form occurs in >= ``min_docs``
    DISTINCT documents. ``keep`` selects the removal policy:

    * ``"none"``  — drop every occurrence of a hot line (the C4
      boilerplate policy: chrome is noise, no copy is worth keeping);
    * ``"first"`` — keep exactly the lexicographically smallest
      (doc_id, pos) occurrence corpus-wide and drop the rest (the
      CCNet dedup policy: one copy of real content survives).

    Lines that are empty after normalization are never counted and
    never removed — blank separators are document structure, not
    boilerplate.

    One row per INPUT doc (the q89 contract): docs whose lines are all
    removed come back with ``text_clean = ''``; docs with NULL text
    come back with ``text_clean`` NULL and zero counts. Output:
    (id_col, text_clean, n_lines, n_kept, n_removed) — counts are
    longs over physical lines (empty ones included).
    """
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")

    lines = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("nline", _norm(F.col("line")))

    occ = lines.filter(F.col("nline") != "")
    # doc frequency: distinct (doc, line) then count by line — both
    # exchanges partial-aggregate map-side; a corpus-hot line leaves
    # each map task as ONE row, never as its occurrence stream.
    hot = (
        occ.select("id", "nline")
        .distinct()
        .groupBy("nline")
        .agg(F.count("*").alias("line_df"))
        .filter(F.col("line_df") >= min_docs)
    )

    if keep == "none":
        kept = lines.join(hot.select("nline"), "nline", "left_anti")
    else:
        # corpus-wide first occurrence per hot line: groupBy-min of a
        # (doc, pos) struct — map-side partial min, one row per key
        # per task before the exchange (the q90 two-stage-min shape).
        firsts = (
            occ.join(hot.select("nline"), "nline", "left_semi")
            .groupBy("nline")
            .agg(
                F.min(F.struct(F.col("id"), F.col("pos"))).alias("first_occ")
            )
        )
        kept = (
            lines.join(firsts, "nline", "left")
            .filter(
                F.col("first_occ").isNull()
                | (
                    (F.col("first_occ.id") == F.col("id"))
                    & (F.col("first_occ.pos") == F.col("pos"))
                )
            )
            .drop("first_occ")
        )

    # reassembly: per-doc state bounded by one document's line count.
    rebuilt = (
        kept.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("line")))
                    ),
                    lambda s: s.line,
                ),
                "\n",
            ).alias("text_clean"),
            F.count("*").alias("n_kept"),
        )
    )
    totals = lines.groupBy("id").agg(F.count("*").alias("n_lines"))

    return (
        docs.select(F.col(id_col).alias("id"))
        .join(totals, "id", "left")
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("n_lines").isNull(), None)
            .otherwise(F.coalesce(F.col("text_clean"), F.lit("")))
            .alias("text_clean"),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.coalesce("n_lines", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def top_boilerplate_lines(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The audit twin of :func:`dedup_lines`: the ``k`` most
    widespread normalized lines corpus-wide, by distinct-document
    frequency — what an operator reads before choosing ``min_docs``.

    Output: (line, line_df, n_occurrences, rank), rank 1-based with
    the fully deterministic (line_df desc, line asc) tie-break. Global
    top-k over the LINE-TYPE table (already one row per distinct
    normalized line, vocabulary-sized) — ``orderBy().limit(k)`` is a
    TakeOrdered, not a full sort.
    """
    occ = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), "\n")).alias("line"),
        )
        .withColumn("nline", _norm(F.col("line")))
        .filter(F.col("nline") != "")
    )
    per_line = occ.groupBy("nline").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct("id").alias("line_df"),
    )
    ranked = (
        per_line.orderBy(F.col("line_df").desc(), F.col("nline").asc())
        .limit(k)
        .select(
            F.col("nline").alias("line"),
            F.col("line_df").cast("long").alias("line_df"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
        )
    )
    # rank over <= k rows — bounded window, the shards.py exemption.
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("line_df").desc(), F.col("line").asc())
    return ranked.withColumn("rank", F.row_number().over(w).cast("int"))
