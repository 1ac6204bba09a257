"""Data-quality report — declarative checks in ONE aggregation pass.

The reference's quality surface is dbt generic tests: one
``SELECT count(*) WHERE col IS NULL`` query per declared test, 55 of
them (``dbt/models/schema.yml:9-179``, run by
``dags/formula1_elt_dag.py:46-50``). ``plans/assertions.py`` ports
those faithfully for the model chain; this operator is the scale
shape: every rule becomes a conditional SUM in a single aggregate, so
a 100-rule suite over 100 TB costs one scan + one 1-row reduce instead
of 100 scans. Uniqueness rides in the same pass as
``count(*) - count(DISTINCT key)``.

Output is long-form (check, n_violations) — joinable, alertable, and
stable as rules are added.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_report(
    df: DataFrame,
    violation_rules: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """``violation_rules``: check name -> boolean Column that is true
    for a VIOLATING row (e.g. ``F.col("user_id").isNull()``).
    ``unique_keys``: check name -> key columns whose duplicated rows
    count as violations. Returns (check, n_violations) with one row
    per rule, computed in a single aggregation."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in violation_rules.items()
    ]
    for name, keys in (unique_keys or {}).items():
        aggs.append(
            (F.count(*[F.lit(1)]) - F.count_distinct(*[F.col(k) for k in keys]))
            .cast("long")
            .alias(name)
        )
    wide = df.agg(*aggs)
    names = list(violation_rules) + list(unique_keys or {})
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {stack}) as (check, n_violations)"
    )


def profile_table(
    df: DataFrame,
    cols: list[str],
    distinct_mode: str = "approx",
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column table profile in ONE aggregation pass — the ANALYZE /
    dbt-docs reconnaissance a training-data pipeline runs before
    trusting a 100 TB source: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value), long-form.

    ``distinct_mode``: 'approx' (HyperLogLog++, map-side mergeable —
    the scale path), 'exact' (count_distinct; adds a shuffle-heavy
    partial per column), or 'both' (adds ``approx_ok`` — |approx -
    exact| <= 15% of exact — the q53 accuracy-gate pattern used by the
    q79 oracle gate). min/max are cast to string after aggregation so
    the long form holds mixed column types.
    """
    if distinct_mode not in ("approx", "exact", "both"):
        raise ValueError(f"unknown distinct_mode {distinct_mode!r}")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).cast("long").alias(f"__nn_{c}"))
        if distinct_mode in ("exact", "both"):
            aggs.append(
                F.count_distinct(F.col(c)).cast("long").alias(f"__ed_{c}")
            )
        if distinct_mode in ("approx", "both"):
            aggs.append(
                F.approx_count_distinct(c, rsd).cast("long")
                .alias(f"__ad_{c}")
            )
        aggs.append(F.min(c).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__mx_{c}"))
    wide = df.agg(*aggs)
    legs = []
    for c in cols:
        distinct = (
            F.col(f"__ed_{c}") if distinct_mode in ("exact", "both")
            else F.col(f"__ad_{c}")
        )
        fields = [
            F.lit(c).alias("column"),
            F.col("__n_rows").alias("n_rows"),
            (F.col("__n_rows") - F.col(f"__nn_{c}")).alias("n_nulls"),
            distinct.alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        ]
        if distinct_mode == "both":
            fields.append(
                (
                    F.abs(F.col(f"__ad_{c}") - F.col(f"__ed_{c}"))
                    <= 0.15 * F.col(f"__ed_{c}")
                ).alias("approx_ok")
            )
        legs.append(wide.select(*fields))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


# ---------------------------------------------------------------------------
# Two-snapshot distribution drift (corpus monitoring)
# ---------------------------------------------------------------------------


def value_counts_long(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, value, cnt) for every listed column in ONE pass:
    each row explodes into one (col, stringified value) pair per
    column, then a single map-side partial-aggregated groupBy counts
    them — scan cost independent of how many columns are profiled.
    NULLs keep a bucket (value NULL), so missingness drift is
    visible."""
    pairs = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col(c).cast("string").alias("value"),
        )
        for c in cols
    ])
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.column").alias("column"),
                 F.col("p.value").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def drift_report(
    old: DataFrame, new: DataFrame, cols: list[str]
) -> DataFrame:
    """Per-value distribution drift between two snapshots of the same
    table — the monitoring complement to the single-snapshot
    ``quality_report``/``profile_table``: did yesterday's ingest
    shift the language mix, the source mix, the length profile?

    Output one row per (column, value) seen in EITHER snapshot:
    (column, value, cnt_old, cnt_new, share_old, share_new,
    abs_delta) with shares rounded to 6 dp (one integer/integer IEEE
    divide each — engine-exact) and abs_delta their |difference|
    (exact op on rounded operands, so the whole frame
    value-hash-gates). ``drift_summary`` folds it to per-column
    total-variation distance.

    Scale: two single-pass counts + one (column, value)-keyed outer
    join; the joined table is value-cardinality-sized, not
    row-sized. High-cardinality columns (free text) should be
    bucketed by the caller first (hash_bucket / length bands) — the
    drift of a billion singleton buckets is meaningless anyway."""
    a = value_counts_long(old, cols).withColumnRenamed("cnt", "cnt_old")
    b = value_counts_long(new, cols).withColumnRenamed("cnt", "cnt_new")
    n1 = old.count()
    n2 = new.count()
    share_old = F.round(
        F.col("cnt_old").cast("double") / F.lit(max(n1, 1)), 6
    )
    share_new = F.round(
        F.col("cnt_new").cast("double") / F.lit(max(n2, 1)), 6
    )
    # NULL-SAFE join on value: the NULL bucket is a first-class
    # drift signal (missingness shift), and a plain equality join
    # would split it into two half-rows — one per snapshot — because
    # NULL never equals NULL in a join key (caught by the hypothesis
    # property test; oracles must mirror with IS NOT DISTINCT FROM)
    cond = (a["column"] == b["column"]) & a["value"].eqNullSafe(
        b["value"]
    )
    return (
        a.join(b, cond, "full_outer")
        .select(
            F.coalesce(a["column"], b["column"]).alias("column"),
            F.coalesce(a["value"], b["value"]).alias("value"),
            F.coalesce(a["cnt_old"], F.lit(0)).alias("cnt_old"),
            F.coalesce(b["cnt_new"], F.lit(0)).alias("cnt_new"),
        )
        .select(
            "column", "value", "cnt_old", "cnt_new",
            share_old.alias("share_old"),
            share_new.alias("share_new"),
            F.round(F.abs(share_old - share_new), 6).alias("abs_delta"),
        )
    )


def drift_summary(report: DataFrame) -> DataFrame:
    """Per-column total-variation distance: TV = sum(|dp|)/2 over the
    value buckets (0 = identical distributions, 1 = disjoint).
    Rounded 6-dp deltas sum as DECIMAL (exact, order-independent),
    one final divide — hash-gateable."""
    return (
        report.groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            (
                F.sum(F.col("abs_delta").cast("decimal(18,6)"))
                .cast("double") / 2.0
            ).alias("tv_distance"),
        )
    )


HIST_SUB_BITS = 3   # mantissa bits per octave: relative value error
                    # of a bucket representative <= 2^-HIST_SUB_BITS


def quantile_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    sub_bits: int = HIST_SUB_BITS,
    scale: int = 6,
) -> DataFrame:
    """Mergeable bounded-state quantile histogram — the scale seam
    ``grouped_quantiles`` documents (a single group whose
    DISTINCT-value count outgrows one reducer): values collapse into
    base-2 log buckets with ``sub_bits`` mantissa bits (the DDSketch
    idea with DETERMINISTIC integer buckets — no libm, no gamma
    boundary ulps), so per-group state is capped at ~2 * 63 *
    2^sub_bits + 1 rows however many distinct values the group has,
    and histograms from disjoint corpora MERGE by summing counts.

    Bucketing is exact integer math replayable in any engine: the
    value scales to an integer at ``scale`` decimals (round-half-up,
    identical on doubles in both engines), msb = length(bin(|v|)) - 1
    (verified identical Spark/DuckDB), sub = the top ``sub_bits + 1``
    bits, and the bucket representative ``v_rep_scaled = sign * (sub
    << max(0, msb - sub_bits))`` is the bucket's magnitude lower
    bound — |rep| <= |true| < |rep| * (1 + 2^-sub_bits) for
    |scaled| >= 2^sub_bits, EXACT below it (small magnitudes get
    singleton buckets). NULLs are excluded (no rank).

    Returns (group_cols..., cls, msb, sub, v_rep_scaled, cnt); feed
    to ``histogram_quantiles`` for rank picks, or sum cnt across
    batch builds to merge."""
    vs_dbl = F.round(
        F.col(value_col).cast("double") * (10 ** scale), 0
    )
    # loud magnitude guard: past 2^62 the double->long cast SATURATES
    # silently in Spark (and errors in DuckDB — a gate divergence, not
    # a replay), collapsing every such value into one msb=62 bucket.
    # The systematic_sample overflow lesson applied at the input edge.
    v_scaled = F.when(
        F.abs(vs_dbl) < float(1 << 62), vs_dbl.cast("long")
    ).otherwise(
        F.raise_error(F.concat(
            F.lit(f"quantile_histogram: |value| * 10^{scale} "
                  "exceeds 2^62 — lower `scale` or pre-clip; "
                  "value="),
            F.col(value_col).cast("string"),
        )).cast("long")
    )
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, v_scaled.alias("_vs"))
        .select(
            *group_cols,
            F.when(F.col("_vs") > 0, 1)
            .when(F.col("_vs") < 0, -1)
            .otherwise(0).cast("int").alias("cls"),
            F.abs(F.col("_vs")).alias("_mag"),
        )
        .withColumn(
            "msb",
            F.when(F.col("_mag") > 0,
                   F.length(F.bin(F.col("_mag"))) - 1)
            .otherwise(F.lit(0)).cast("int"),
        )
        .withColumn(
            "sub",
            # column-amount shifts need the SQL form (wrapper takes
            # literals only)
            F.expr(f"shiftright(_mag, CAST(greatest(0, "
                   f"msb - {sub_bits}) AS INT))"),
        )
        .withColumn(
            "v_rep_scaled",
            F.expr(f"cls * shiftleft(sub, CAST(greatest(0, "
                   f"msb - {sub_bits}) AS INT))"),
        )
    )
    return (
        d.groupBy(*group_cols, "cls", "msb", "sub", "v_rep_scaled")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    probs: list[float],
) -> DataFrame:
    """Rank picks over a ``quantile_histogram``: per group, the
    bucket representative at rank ``ceil(p * n)`` in ascending VALUE
    order — ``v_rep_scaled`` alone is that order (sign-mirrored
    magnitude lower bounds are distinct across buckets). The same
    DECIMAL rank discipline as ``grouped_quantiles``; labels are
    ``p<pct>_approx`` to keep the bound explicit. The per-group
    window runs over the CAPPED bucket table, never raw values —
    this is the whole point at 100 TB."""
    from pyspark.sql import Window

    if not probs:
        raise ValueError("probs must be non-empty")
    if not all(0.0 < p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in (0, 1]: {probs}")
    labels = [f"p{round(p * 100)}_approx" for p in probs]
    if len(set(labels)) != len(labels):
        raise ValueError(
            f"probs collide at percent resolution: {probs} -> {labels}"
        )
    wg = Window.partitionBy(*group_cols)
    ranked = hist.select(
        *group_cols, "v_rep_scaled",
        F.sum("cnt").over(wg.orderBy("v_rep_scaled")).alias("cum"),
        F.sum("cnt").over(wg).alias("tot"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("cum")
                >= F.ceil(
                    F.lit(p).cast("decimal(20,12)") * F.col("tot")
                ),
                F.col("v_rep_scaled"),
            )
        ).alias(lab)
        for p, lab in zip(probs, labels)
    ]
    return ranked.groupBy(*group_cols).agg(*aggs)


def grouped_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probs: list[float],
) -> DataFrame:
    """EXACT per-group quantiles (discrete/type-1: the value at rank
    ``ceil(p * n)`` ascending) — the distribution tail-bound every
    quality gate needs ("cut above the p95 repetition score") where an
    approximate sketch's rank error would move real documents across
    the cut.

    Shape for scale: rows first collapse to (group, value) COUNTS —
    one shuffle with map-side combine, so the ordered pass that
    follows runs over distinct values, not raw rows (a 100 TB events
    table with bounded-cardinality measures collapses by orders of
    magnitude). The cumulative rank is a per-group window — parallel
    across groups; a single group whose DISTINCT-value count is too
    large for one reducer would range-bucket values first and
    prefix-sum bucket totals (the packing/shards two-level pattern) —
    that seam is deliberately not built until a real corpus needs it.
    No value arithmetic: each output quantile is one of the input
    doubles, picked by integer rank, so the cross-engine hash is
    exact with no rounding discipline.

    NULL values are excluded (they have no rank); groups where every
    value is NULL yield no row.
    """
    from pyspark.sql import Window

    if not probs:
        raise ValueError("probs must be non-empty")
    if not all(0.0 < p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in (0, 1]: {probs}")
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wg = Window.partitionBy(*group_cols)
    cum = F.sum("c").over(wg.orderBy(value_col))
    tot = F.sum("c").over(wg)
    ranked = counts.select(
        *group_cols, F.col(value_col).alias("v"),
        cum.alias("cum"), tot.alias("tot"),
    )
    labels = [f"p{round(p * 100)}" for p in probs]
    if len(set(labels)) != len(labels):
        raise ValueError(
            f"probs collide at percent resolution: {probs} -> {labels}"
        )
    aggs = [
        # rank in DECIMAL, not double: ceil(0.07 * 100) is 8 in IEEE
        # doubles (0.07*100 = 7.000000000000001) — the decimal cast
        # snaps p back to its literal digits so the documented
        # ceil(p*n) rank is exact for every prob, not just the
        # binary-friendly ones
        F.min(
            F.when(
                F.col("cum")
                >= F.ceil(
                    F.lit(p).cast("decimal(20,12)") * F.col("tot")
                ),
                F.col("v"),
            )
        ).alias(lab)
        for p, lab in zip(probs, labels)
    ]
    return ranked.groupBy(*group_cols).agg(*aggs)
