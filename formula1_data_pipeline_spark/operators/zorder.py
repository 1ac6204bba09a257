"""Z-order (Morton) multi-column layout — the table-layout side of
data skipping at 100 TB.

Manifest stats pruning (``sources/txn.py``, gated q82) skips segments
whose [min, max] range misses the predicate — which only helps when
the layout CORRELATES the column with segments. Sorting by one column
makes its ranges selective and every other column's ranges useless
(each segment spans the full domain of the others). Z-ordering
interleaves the bits of k columns into one Morton key and lays
segments out along it, so EVERY interleaved column's per-segment
range is narrow: a box predicate on any subset of the k columns
prunes files. This is the standard layout optimization the big table
formats expose (the OPTIMIZE ... ZORDER BY idea) re-expressed on this
repo's manifest-txn tables.

All integer math, no RNG, no libm: min-max scaling is an exact
DECIMAL integral quotient, interleaving is shift/AND/OR arithmetic
(codegen'd, built as ONE SQL string — the q22/q51 plan-construction
lesson), and the segment assignment is the exact-rank two-level
prefix sum (the pack_sequences shape) with ``file_id = rank *
n_files DIV N``. Everything value-hash-gates bit-for-bit.

Landing route: rides q82's r12 re-gate (q82 owns the data-skipping
surface) as a z-layout leg whose in-query assertion is the q82
pattern — a box prune on EITHER column must plan strictly fewer
input files than the full read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators._guards import (
    require_integral,
)


def morton_sql(cols: list[str], bits: int) -> str:
    """The Morton interleave of ``bits`` low bits of k integer
    columns as ONE SQL expression string (bit i of column j lands at
    position i*k + j), total width k*bits <= 62. SPARK-ONLY:
    ``shiftleft``/``shiftright`` are not DuckDB scalar functions —
    an oracle needs the ``<<``-based twin
    (``tests/test_r11_gate_drafts._morton_terms_sql``), with every
    shift term parenthesized because DuckDB binds ``+`` tighter
    than ``<<`` (round-10 ADVICE: the previous 'usable verbatim in
    both engines' claim invited pasting a string DuckDB cannot
    parse)."""
    k = len(cols)
    if k * bits > 62:
        raise ValueError(
            f"morton_sql: {k} cols x {bits} bits = {k * bits} > 62")
    terms = [
        f"shiftleft(shiftright({c}, {i}) & 1, {i * k + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "(" + " + ".join(terms) + ")"


def scaled_cols(df: DataFrame, cols: list[str],
                bits: int = 16) -> DataFrame:
    """``df`` + ``_s<j>`` columns: each input column min-max scaled to
    [0, 2^bits) with the exact integral quotient
    ``(x - min) * (2^bits - 1) DIV greatest(1, max - min)`` — a
    1-row broadcast aggregate fans the min/max out (the scalar
    cross-join pattern), nothing shuffles."""
    require_integral(df, cols, "scaled_cols",
                     hint="bucket or rank continuous values first")
    top = (1 << bits) - 1
    agg = df.agg(*[
        f(c).alias(f"_{nm}_{j}")
        for j, c in enumerate(cols)
        for nm, f in (("mn", F.min), ("mx", F.max))
    ])
    out = df.crossJoin(F.broadcast(agg))
    for j, c in enumerate(cols):
        # both subtractions in DECIMAL(38,0), never BIGINT: an
        # extreme-range column (max - min > 2^63) would silently
        # wrap in non-ANSI mode and z-order garbage (round-10
        # ADVICE) — the same discipline the multiply/DIV already use
        out = out.withColumn(
            f"_s{j}",
            F.expr(
                f"CAST((CAST({c} AS DECIMAL(38,0)) "
                f"- CAST(_mn_{j} AS DECIMAL(38,0))) * {top} "
                f"DIV greatest(CAST(1 AS DECIMAL(38,0)), "
                f"CAST(_mx_{j} AS DECIMAL(38,0)) "
                f"- CAST(_mn_{j} AS DECIMAL(38,0))) AS BIGINT)"
            ),
        )
    return out.drop(*[f"_{nm}_{j}" for j in range(len(cols))
                      for nm in ("mn", "mx")])


def zorder_assignment(df: DataFrame, cols: list[str], n_files: int,
                      id_col: str, bits: int = 16,
                      bucket_bits: int = 10) -> DataFrame:
    """(id_col, zvalue, file_id): each row's Morton key over the
    scaled columns and the segment it lands in when the table is cut
    into ``n_files`` equal-count runs of z-order. Exact ranks via the
    two-level prefix sum over COUNTS (range buckets on the key's top
    bits -> tiny offset window -> within-bucket row_number by
    (zvalue, id)) — no global single-task sort; ``file_id = rank *
    n_files DIV N`` is an exact integral quotient. Deterministic:
    a pure function of (column values, id tiebreak)."""
    from pyspark.sql import Window

    if n_files <= 0:
        raise ValueError(f"n_files must be positive: {n_files}")
    z = F.expr(morton_sql([f"_s{j}" for j in range(len(cols))], bits))
    total_bits = len(cols) * bits
    shift = max(0, total_bits - bucket_bits)
    # eager localCheckpoint (the coreset discipline): d feeds BOTH
    # the bucket-count side and the probe side of the offsets join,
    # and it embeds the min/max aggregate + the Morton projection —
    # unmaterialized, the full input scan and the scalar job would
    # run twice per call
    d = scaled_cols(df, cols, bits).select(
        F.col(id_col), z.alias("zvalue")
    ).withColumn(
        "_bkt", F.shiftright(F.col("zvalue"), shift)
    ).localCheckpoint(eager=True)
    counts = d.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_c"))
    w_off = (Window.orderBy("_bkt")
             .rowsBetween(Window.unboundedPreceding, -1))
    w_all = (Window.orderBy(F.lit(1))
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    offsets = counts.select(
        "_bkt",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    w_in = (Window.partitionBy("_bkt").orderBy("zvalue", id_col))
    return (
        d.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "_rank",
            F.col("_off") + F.row_number().over(w_in) - 1,
        )
        .select(
            id_col, "zvalue",
            F.expr(f"CAST(CAST(_rank AS DECIMAL(38,0)) * {n_files} "
                   "DIV CAST(_n AS DECIMAL(38,0)) AS BIGINT)")
            .alias("file_id"),
        )
    )


def zorder_land(spark: SparkSession, df: DataFrame, cols: list[str],
                n_files: int, path: str, id_col: str,
                bits: int = 16) -> None:
    """Land ``df`` at ``path`` as ``n_files`` manifest-txn segments in
    z-order over ``cols``, each segment carrying min/max stats on ALL
    interleaved columns — so ``read_table(prune={col: (lo, hi)})``
    skips segments for a box on ANY of them (the q82 contract,
    multi-column). One commit per segment keeps per-segment stats
    tight; at deployment scale segments batch by z-run exactly the
    same way."""
    from formula1_data_pipeline_spark.sources.txn import txn_append

    asg = zorder_assignment(df, cols, n_files, id_col, bits)
    landed = df.join(asg.select(id_col, "file_id"), id_col).persist()
    try:
        for fid in range(n_files):
            seg = landed.filter(
                F.col("file_id") == fid).drop("file_id")
            txn_append(spark, seg, path,
                       stats_cols=list(cols) if fid == 0 else None,
                       compact_threshold=None)
    finally:
        landed.unpersist()
