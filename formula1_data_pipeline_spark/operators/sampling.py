"""Deterministic hash sampling — reproducible splits and downsampling.

Training-data pipelines need sampling that is (a) reproducible across
runs and engines, (b) stable under repartitioning, and (c) disjoint
across named salts — none of which ``df.sample()`` (seeded per-partition
RNG, layout-dependent) provides. The standard fix is key-hash
bucketing: ``bucket = int(md5(key || salt)[:15]) % n``; a row's bucket
depends only on its key and the salt, so train/val/test membership is a
pure function of the data. The reference has no sampling surface; this
is part of the LLM-pipeline extension ops (SURVEY.md §2.12).

Everything here is a codegen'd column expression (md5 + conv + pmod) —
shuffle-free, scan-parallel, identical plan shape at any scale. The md5
prefix is 15 hex chars (60 bits), exactly reproducible in DuckDB as
``CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)`` for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash60(key: Column, salt: str) -> Column:
    """The repo's ONE 60-bit keyed hash: the first 15 hex chars of
    md5(key || '|' || salt) as a bigint — exactly reproducible in
    DuckDB as ``CAST(('0x' || substr(md5(...), 1, 15)) AS BIGINT)``.
    Every hash-keyed operator (bucketing, stratified sampling, epoch
    shuffle) derives from this single definition so the hash family
    cannot drift between call sites and their oracles."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", key.cast("string"), F.lit(salt))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")


def hash_bucket(key: Column, salt: str, n_buckets: int = 100) -> Column:
    """Uniform bucket in [0, n_buckets) from md5(key || '|' || salt).
    Different salts give independent bucketings, so a split salt and a
    downsample salt don't correlate."""
    return F.pmod(md5_hash60(key, salt), F.lit(n_buckets))


def assign_split(bucket: Column, train_pct: int = 80,
                 val_pct: int = 10) -> Column:
    """train/val/test label from a percent bucket — disjoint, exhaustive,
    and stable: a document never migrates between splits as the corpus
    grows (unlike fraction-of-count sampling)."""
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def stratified_keep(bucket: Column, rate_pct: Column) -> Column:
    """Per-stratum downsample: keep iff bucket < the stratum's rate.
    ``rate_pct`` is a per-row column (e.g. a CASE over language), so one
    pass implements language-balanced corpus downsampling."""
    return bucket < rate_pct


def stratified_topn(df, stratum_cols: list[str], key: Column, n: int,
                    salt: str = "sample"):
    """Exactly-``n``-per-stratum deterministic sample: rank rows inside
    each stratum by the 60-bit key hash (uniform, engine-reproducible)
    and keep the first ``n``. The fixed-size complement of
    ``stratified_keep``'s rate-based sampling — the primitive for
    building fixed-budget mixtures ("100k docs per language").

    Scale shape: one shuffle on the stratum columns + an in-partition
    sort (the row_number window). For strata far larger than ``n`` the
    refinement is a two-phase threshold estimate (sample the hash
    distribution, keep hash < t, exact-trim the remainder), which
    replaces the full per-stratum sort with a scan + small sort; the
    window form is exact and is the right default until a stratum's
    sort spills.
    """
    from pyspark.sql import Window

    h = md5_hash60(key, salt)
    w = Window.partitionBy(*stratum_cols).orderBy(h.asc(), key.asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


#: Upper bound (exclusive) of the 60-bit md5-prefix hash space —
#: shared with shards.py's epoch rank.
_HASH_SPACE = 1 << 60


def stratified_topn_bucketed(df, stratum_cols: list[str], key: Column,
                             n: int, salt: str = "sample",
                             n_buckets: int = 1024):
    """Row-for-row identical to :func:`stratified_topn` (same hash,
    same (hash, key) order, same exactly-``n`` cut — equivalence is
    property-tested), with the skew-proof physical plan that function's
    docstring defers to: the per-domain quota cap of RefinedWeb
    (Penedo et al. 2023, arXiv 2306.01116) hits strata of wildly
    uneven size, and a single ``partitionBy(stratum)`` window sorts a
    billion-row domain in ONE task.

    Two-level plan (the shards.py/packing.py prefix-sum shape, applied
    per stratum): RANGE-bucket the 60-bit hash (hash order == bucket
    order), count each (stratum, bucket) with one map-side-partial
    aggregate, prefix-sum the counts per stratum (a window over
    <= ``n_buckets`` metadata rows per stratum — the shards.py
    exemption), and PRUNE: only buckets whose running offset is
    < ``n`` can contribute rows, so the in-bucket sort window touches
    ~``n`` rows per stratum no matter how large the stratum — the
    million-to-one reduction happens in the counting exchange, where
    partial aggregation has already collapsed each map task's
    contribution to one row per (stratum, bucket).

    Cost note: the bucket-count branch re-derives ``df`` (an extra
    column-pruned scan; no extra shuffle of the stream) — same trade
    as ``epoch_shuffle``, and same advice: land expensive pipelines
    first, cap the artifact."""
    from pyspark.sql import Window

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    width = -(-_HASH_SPACE // n_buckets)  # ceil: bucket ids < n_buckets
    d = df.withColumn("__h", md5_hash60(key, salt)) \
          .withColumn("__bkt", F.floor(F.col("__h") / width))
    counts = d.groupBy(*stratum_cols, "__bkt").agg(
        F.count("*").alias("__bcnt")
    )
    w_off = Window.partitionBy(*stratum_cols).orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    live = counts.select(
        *stratum_cols,
        "__bkt",
        F.coalesce(F.sum("__bcnt").over(w_off), F.lit(0)).alias("__off"),
    ).filter(F.col("__off") < n)
    w_in = Window.partitionBy(*stratum_cols, "__bkt").orderBy(
        F.col("__h").asc(), key.asc()
    )
    return (
        d.join(live, [*stratum_cols, "__bkt"])
        .withColumn("__seq", F.col("__off") + F.row_number().over(w_in) - 1)
        .filter(F.col("__seq") < n)
        .drop("__h", "__bkt", "__off", "__seq")
    )


def importance_weights(docs, is_target: Column, text_col: str = "text",
                       id_col: str = "doc_id"):
    """DSIR-style data selection (Xie et al. 2023, arXiv 2302.03169):
    score every document by how much its token distribution resembles
    a TARGET subset of the corpus, so a pipeline can up-sample
    target-like data without a trained classifier. ``is_target`` is a
    boolean column over ``docs`` (e.g. a quality/domain predicate —
    the "few exemplary docs" side of importance resampling).

    Estimator: per token occurrence t, the smoothed target-likelihood
    ratio numerator ``n_t(target) + 1`` against denominator
    ``n_t(corpus) + 1``; per document,
    ``importance = sum(num) / sum(den)`` over its occurrences — the
    ratio-of-sums surrogate for the paper's mean log-ratio. Chosen
    deliberately: the aggregation is pure INTEGER sums (exact,
    order-independent, bit-identical across engines) with ONE IEEE
    divide per document at the end, the same libm-free discipline as
    q39's linear idf. (The log-weight form needs ln(), whose last-ulp
    behavior differs between JVM Math.log and C libm — a value-hash
    oracle cannot tolerate that; a deployment free of the cross-engine
    constraint can swap the final projection for log weights without
    touching the counting pipeline, which is the expensive part.)

    Scale shape: both per-term counts come from one map-side
    partial-aggregated ``groupBy("term")`` (count(*) plus a
    conditional sum in the same aggregate — each map task ships one
    partial row per term it holds, so the term exchange moves partial
    rows, not occurrences), joined back onto the (id, term) stream,
    then one integer-sum aggregation per doc. A stopword-grade hot
    term STREAMS through its sort-merge-join task (one build row per
    term) — the round-7 window formulation instead buffered the hot
    term's entire occurrence list in one spilling WindowExec frame
    (the q90 window-min trick is safe for streaming min over
    near-unique shingle hashes; a Zipf-distributed term column is
    exactly where it straggles). Two full shuffles of a skinny
    stream (by term for the join, by id for the doc sums), one small
    partial-count shuffle, no float accumulation anywhere.
    """
    from formula1_data_pipeline_spark.operators.dedup import tokens

    # The target flag is evaluated behind a one-element generator
    # barrier: projections substitute through a plain select into the
    # post-explode projection (CollapseProject), which would re-run
    # ``is_target`` — typically a multi-pass expression over the FULL
    # document text — once per TOKEN occurrence instead of once per
    # doc (measured 9 s -> 1.3 s at sf0.1 with the q25 quality flag;
    # same fix as dedup.jaccard_verified).
    flagged = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text"),
        F.explode(F.array(is_target)).alias("__tgt"),
    )
    toks = flagged.select(
        "id",
        "__tgt",
        F.explode(tokens(F.col("__text"))).alias("term"),
    )
    counts = toks.groupBy("term").agg(
        (F.count("*") + 1).alias("den"),
        (F.sum(F.when(F.col("__tgt"), 1).otherwise(0)) + 1).alias("num"),
    )
    counted = toks.select("id", "term").join(counts, "term")
    agg = counted.groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("num").alias("imp_num"),
        F.sum("den").alias("imp_den"),
    )
    # one row per INPUT doc (the q89 contract: a vanished row is
    # indistinguishable from a filtered one downstream) — token-less
    # docs come back with n_tokens 0 and NULL importance
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(agg, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long")
            .alias("n_tokens"),
            F.col("imp_num").cast("long").alias("imp_num"),
            F.col("imp_den").cast("long").alias("imp_den"),
            F.round(
                F.col("imp_num").cast("double")
                / F.col("imp_den").cast("double"), 6
            ).alias("importance"),
        )
    )


def temporal_split(df, ts_col: str, cutoff=None,
                   train_frac: float = 0.8,
                   embargo_seconds: int = 0):
    """Time-based train/test split with an EMBARGO gap — the temporal
    complement of the cluster-keyed leakage-safe split (q85): train
    is everything at or before the cutoff, test everything after
    cutoff + embargo, and the embargo band between them is LABELED
    (not silently dropped) so the caller sees exactly what the gap
    excluded. The embargo is what blocks near-boundary leakage
    (features computed from a window that straddles the cutoff, label
    horizons that peek past it); without it a time split leaks
    exactly at the seam it was supposed to protect.

    ``cutoff``: an explicit timestamp (the deployment case — "train
    on everything before X"); ``None`` derives it as the EXACT type-1
    quantile of ``ts_col`` at ``train_frac`` — the grouped_quantiles
    collapse-to-counts shape on one group (its documented
    single-huge-group seam applies; at 100 TB pass an explicit cutoff
    or derive one from the bounded ``quantile_histogram``).

    All timestamp arithmetic is exact integer microseconds; NULL
    timestamps get split = NULL (no temporal position). Returns
    ``df`` + ``split`` ('train' | 'embargo' | 'test')."""
    if cutoff is None:
        if not 0.0 < train_frac < 1.0:
            raise ValueError(
                f"train_frac must be in (0, 1): {train_frac}")
        # the exact type-1 rank pick is grouped_quantiles' job —
        # including the DECIMAL ceil(p*n) exactness discipline whose
        # rationale lives there; reimplementing it here would fork
        # that subtle arithmetic (review finding)
        from formula1_data_pipeline_spark.operators.quality import (
            grouped_quantiles,
        )

        lab = f"p{round(train_frac * 100)}"
        rows = grouped_quantiles(
            df.select(ts_col), ts_col, [], [train_frac]).collect()
        cutoff = rows[0][lab] if rows else None
        if cutoff is None:  # no non-null timestamps at all
            return df.withColumn("split",
                                 F.lit(None).cast("string"))
    cut_us = F.unix_micros(F.lit(cutoff))
    ts_us = F.unix_micros(F.col(ts_col))
    emb_us = int(embargo_seconds) * 1_000_000
    return df.withColumn(
        "split",
        F.when(F.col(ts_col).isNull(), F.lit(None).cast("string"))
        .when(ts_us <= cut_us, "train")
        .when(ts_us <= cut_us + F.lit(emb_us), "embargo")
        .otherwise("test"),
    )


def temporal_leakage_report(split_df, entity_col: str):
    """(n_entities, n_train_only, n_test_only, n_straddling,
    straddle_fraction) — the check to run before trusting a temporal
    split: entities with rows in BOTH train and test carry
    entity-level signal across the boundary (fine for forecasting,
    fatal for entity-generalization claims). One aggregation pass
    over the split frame; embargo/NULL rows don't count toward
    either side."""
    per_entity = (
        split_df.filter(F.col("split").isin("train", "test"))
        .groupBy(entity_col)
        .agg(
            F.max(F.when(F.col("split") == "train", 1)
                  .otherwise(0)).alias("in_train"),
            F.max(F.when(F.col("split") == "test", 1)
                  .otherwise(0)).alias("in_test"),
        )
    )
    return per_entity.agg(
        F.count(F.lit(1)).alias("n_entities"),
        F.sum(F.when((F.col("in_train") == 1) & (F.col("in_test") == 0),
                     1).otherwise(0)).cast("long").alias("n_train_only"),
        F.sum(F.when((F.col("in_train") == 0) & (F.col("in_test") == 1),
                     1).otherwise(0)).cast("long").alias("n_test_only"),
        F.sum(F.when((F.col("in_train") == 1) & (F.col("in_test") == 1),
                     1).otherwise(0)).cast("long").alias("n_straddling"),
    ).select(
        "*",
        # 0/0 guard: a split with no train/test rows (all embargo or
        # NULL ts) reports a clean 0.0 — "nothing straddles" — not a
        # NULL (non-ANSI) or a DIVIDE_BY_ZERO (ANSI) that breaks a
        # caller's `== 0.0` approval check
        F.when(
            F.col("n_entities") > 0,
            F.round(F.col("n_straddling").cast("double")
                    / F.col("n_entities"), 6),
        ).otherwise(F.lit(0.0)).alias("straddle_fraction"),
    )


def systematic_sample(df, weight: Column, n_select: int,
                      id_col: str = "doc_id",
                      salt: str = "syssample-v1",
                      bucket_bits: int = 10,
                      weight_scale: int = 6):
    """Exact fixed-size weighted sampling (Madow 1949 systematic /
    probability-proportional-to-size): lay the rows on a cumulative-
    weight line in a deterministic md5-shuffled order, drop
    ``n_select`` grid points at stride ``W / n_select``, and hit the
    row whose weight interval contains each point. Fills the missing
    cell of the sampling matrix — ``resample_by_weight`` is weighted
    but Bernoulli (random size), ``stratified_topn`` is exact-size
    but uniform; this is exact-size AND weighted: inclusion
    probability ``n * w / W`` for every row with ``w < W/n``, and
    exactly ``n_select`` hits in total (a row wider than the stride
    absorbs several — its multiplicity comes back in ``n_hits``, so
    the operator doubles as a fixed-total with-replacement resampler
    for epoch weighting: repeat each doc ``n_hits`` times).

    Determinism end-to-end, no RNG and no libm: the order is the
    60-bit keyed hash (ties broken by id), weights are scaled to
    integers at ``weight_scale`` decimals (round-half-up — identical
    on doubles in both engines), cumulative sums are exact
    DECIMAL(38,0) — never BIGINT, whose silent wraparound a 100 TB
    total scaled weight would reach — via the two-level prefix sum
    (range buckets on the hash's top
    ``bucket_bits`` bits -> tiny-table offset window -> partitioned
    within-bucket window — no global single-task sort, the
    pack_sequences shape), and the grid test is pure integer
    comparison: row selected iff
    ``(cum_after * n) DIV W  >  (cum_before * n) DIV W``
    (counts grid points ``m*W/n <= x`` without ever forming the
    ratio — both engines' integral division is exact, so no
    float-boundary flakes). Membership is a pure function of
    (ids, weights, salt): reproducible across runs, engines, and
    partitionings.

    Returns ``df`` plus ``n_hits`` (grid points in the row's
    interval) and ``sampled = n_hits > 0`` — callers filter, the
    q38 pattern. NULL weights count as 0 on both sides of the math
    (the resample_by_weight discipline); negative weights raise
    loudly (a negative interval would corrupt every later cum).
    """
    from pyspark.sql import Window

    if n_select <= 0:
        raise ValueError(f"n_select must be positive: {n_select}")
    scale = 10 ** weight_scale
    w_raw = weight.cast("double")
    w_guard = F.when(
        w_raw < 0,
        F.raise_error(F.concat(
            F.lit("systematic_sample: negative weight "),
            w_raw.cast("string"),
        )),
    ).otherwise(F.coalesce(w_raw, F.lit(0.0)))
    # DECIMAL(38,0) from the first sum on: a 100 TB corpus's total
    # scaled weight passes 2^63 (e.g. char-count weights: ~1e14 chars
    # x 10^6 scale = 1e20), and BIGINT window sums would wrap
    # silently — the _dec_sum discipline applies to cumulative
    # weights exactly as it does to means. Per-row weights still
    # round as doubles (identical half-up in both engines).
    w_int = F.round(w_guard * scale, 0).cast("decimal(38,0)")
    h = md5_hash60(F.col(id_col), salt)
    d = df.select(
        "*",
        w_int.alias("_w"),
        h.alias("_h"),
        F.shiftright(h, 60 - bucket_bits).alias("_bkt"),
    )
    bucket_sums = d.groupBy("_bkt").agg(F.sum("_w").alias("_bsum"))
    w_off = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        "_bkt",
        F.coalesce(F.sum("_bsum").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_bsum").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("_total"),
    )
    w_in = (
        Window.partitionBy("_bkt").orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_b = (F.col("_off")
             + F.coalesce(F.sum("_w").over(w_in), F.lit(0)))
    # grid count f(x) = #{m >= 1 : m*W <= x*n} = (x*n) DIV W —
    # exact integral quotients of DECIMAL(38,0) products in both
    # engines, never a rounded ratio. Bound: W * n_select < 10^38
    # (a 1e20 total at n=10^9 grid points is 1e29 — ample headroom;
    # past it the decimal product nulls rather than wrapping)
    def grid(x):
        return F.expr(
            f"CAST({x} AS DECIMAL(38,0)) * {n_select} "
            "DIV CAST(_total AS DECIMAL(38,0))"
        )

    out = (
        d.join(F.broadcast(offsets), "_bkt")
        .withColumn("_cb", cum_b)
        .withColumn("_ca", cum_b + F.col("_w"))
        .withColumn(
            "n_hits",
            F.when(F.col("_total") > 0, grid("_ca") - grid("_cb"))
            .otherwise(F.lit(0)).cast("long"),
        )
    )
    return out.select(
        *df.columns, "n_hits", (F.col("n_hits") > 0).alias("sampled")
    )


def resample_by_weight(df, weight: Column, target_fraction: float,
                       id_col: str = "doc_id",
                       salt: str = "resample-v1"):
    """Deterministic importance resampling — the second half of DSIR
    (Xie et al. 2023): keep each row with probability proportional to
    its ``weight``, scaled so the expected kept fraction is
    ``target_fraction``. The acceptance test is
    ``hash_uniform(id) < weight * k`` with ``k = target_fraction /
    mean(weight)`` — no per-row RNG, so membership is a pure function
    of (id, salt, weights): reproducible across runs, engines, and
    partitionings, exactly like the split/downsample family above.

    Gated round 9 as q18_importance_resample (built and cross-engine
    validated round 8; the r8 gate budget was full): the gate
    composes ``importance_weights`` -> this, with the oracle
    replaying the decimal mean and the hash comparison. Also wired
    into the q97 corpus-to-trainer flagship (weights -> resample
    between span-dedup and BPE training — the full DSIR story).

    Scale shape: one map-side decimal aggregation for the mean (exact
    and order-independent — the repo's _dec_sum discipline, so an
    oracle can replay the scalar bit-for-bit), then a shuffle-free
    filter projection. Weighted rows cap at probability 1 (a weight
    large enough that weight*k >= 1 is always kept — the standard
    truncated-importance-sampling behavior).

    Returns ``df`` plus a boolean ``kept`` column (callers filter, so
    the decision stays inspectable — the q38 pattern). A NULL weight
    is treated as 0.0 on BOTH sides of the math — the normalizing
    mean and the acceptance test — so ``kept`` is always a true
    boolean (never NULL) and the mean is unbiased: the round-8 form
    excluded NULLs from the sum but counted them in n, and a NULL
    weight propagated into ``kept`` where ``filter('kept')`` silently
    dropped the row (round-8 ADVICE item)."""
    from pyspark.sql import functions as F

    if not 0.0 < target_fraction <= 1.0:
        raise ValueError(
            f"target_fraction must be in (0, 1]: {target_fraction}")
    w = F.coalesce(weight.cast("double"), F.lit(0.0))
    stats = df.agg(
        F.sum(w.cast("decimal(28,10)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    n = int(stats["n"])
    mean_w = (float(stats["s"]) / n) if n and stats["s"] is not None else 0.0
    if mean_w <= 0.0:
        return df.withColumn("kept", F.lit(False))
    k = target_fraction / mean_w
    # hash_uniform in [0, 1): the 60-bit keyed hash over 2^60
    u = md5_hash60(F.col(id_col), salt).cast("double") / float(1 << 60)
    return df.withColumn("kept", u < w * F.lit(k))


def priority_sample(df, weight: Column, k: int,
                    id_col: str = "doc_id",
                    salt: str = "priosample-v1"):
    """Exact-size weighted sampling WITHOUT replacement with unbiased
    subset-sum estimation — priority sampling (Duffield, Lund &
    Thorup, "Priority sampling for estimation of arbitrary subset
    sums", JACM 2007). Completes the sampling matrix's last cell:
    ``systematic_sample`` is exact-size PPS WITH replacement (a row
    wider than the stride absorbs several hits); this draws ``k``
    DISTINCT rows and hands back a Horvitz-Thompson weight
    (``ht_weight = max(w, tau)``, ``tau`` = the (k+1)-th priority)
    whose sample-sum is an unbiased estimator of ANY subset's total
    weight — the primitive for auditing a curated corpus from a
    fixed-size sample ("estimate total tokens per source from 10k
    docs").

    Each row races with priority ``q = w / u``, ``u`` uniform from
    the 60-bit keyed hash (``u = (h+1) / 2^60`` — never 0); the k
    largest priorities win. Determinism end to end, no RNG and no
    libm: the race key is the DOUBLE quotient ``(h+1) / w``
    (ascending == priority descending) — a single IEEE division of
    identically-constructed operands, CORRECTLY ROUNDED by the
    standard and therefore bit-identical across JVM and DuckDB
    (unlike ln/pow, whose last ulp is libm's — the repo's no-libm
    gate discipline; the q18 bernoulli leg already gates on exactly
    this +-*/-only double determinism), with ids breaking the
    (2^-53-rare) quantized ties. ``tau`` and ``ht_weight`` are the
    same discipline: exact integers through IEEE multiply/divide
    only, so the full output value-hashes. An earlier draft raced on
    ``(h+1) * 10^18 DIV w_int`` in DECIMAL(38,0) — Spark's ``DIV``
    returns BIGINT whatever its operands, and the ~1e27 quotients
    wrapped silently (the zorder ADVICE trap); the double form is
    both simpler and exactly engine-portable.

    Scale shape: the bottom-(k+1) runs as ``TakeOrderedAndProject``
    — per-partition partial top-k, merge on the driver, NO global
    sort or shuffle; the only windows are over the (k+1)-row
    candidate frame. Because selection is "k smallest race keys",
    reservoirs MERGE: the bottom-k of a union is the bottom-k of
    the parts' bottom-k's, so per-shard reservoirs union and
    re-select without touching shard data again (property-tested) —
    the streaming/mergeable weighted-reservoir story at 100 TB.

    NULL and zero weights sit out the race (inclusion probability
    proportional to w = 0 — they can never be sampled); negative
    weights raise loudly (the systematic_sample discipline). If the
    population has <= k positive-weight rows the whole population
    returns with ``tau = 0`` and ``ht_weight = w`` (the DLT
    degenerate case: the sample IS the population, estimates exact).

    Returns the sampled rows: ``df``'s columns + ``w`` (double),
    ``prio_rank`` (1 = highest priority), ``tau``, ``ht_weight``.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    w_raw = weight.cast("double")
    w_guard = F.when(
        w_raw < 0,
        F.raise_error(F.concat(
            F.lit("priority_sample: negative weight "),
            w_raw.cast("string"),
        )),
    ).otherwise(F.coalesce(w_raw, F.lit(0.0)))
    u_int = md5_hash60(F.col(id_col), salt) + F.lit(1)
    d = (
        df.select("*", w_guard.alias("_w"), u_int.alias("_u"))
        .filter(F.col("_w") > 0)
        .withColumn("_r", F.col("_u").cast("double") / F.col("_w"))
    )
    # bottom-(k+1) by the race key: Catalyst compiles orderBy+limit to
    # TakeOrderedAndProject (per-partition heap, driver merge) — the
    # scale-correct global top-k, no Exchange. localCheckpoint pins
    # the (k+1)-row result so the tau leg below reuses it instead of
    # re-running the corpus scan (two TakeOrderedAndProject legs =
    # two full scans, the one-sample-two-scans anti-shape).
    cand = (
        d.orderBy(F.col("_r").asc(), F.col(id_col).asc()).limit(k + 1)
        .localCheckpoint(eager=False)
    )
    w_rank = Window.orderBy(F.col("_r").asc(), F.col(id_col).asc())
    ranked = cand.withColumn("prio_rank", F.row_number().over(w_rank))
    # tau = the (k+1)-th priority in WEIGHT units: w * 2^60 / (h+1) —
    # IEEE */ over exact operands; the oracle twin spells the
    # identical left-associated expression so both engines round
    # identically step by step
    tau_expr = (
        F.col("_w") * F.lit(float(1 << 60))
        / F.col("_u").cast("double")
    )
    tau_1row = (
        ranked.filter(F.col("prio_rank") == k + 1)
        .agg(F.max(tau_expr).alias("_tau_raw"))
    )
    return (
        ranked.filter(F.col("prio_rank") <= k)
        .crossJoin(F.broadcast(tau_1row))
        .withColumn("tau", F.coalesce(F.col("_tau_raw"), F.lit(0.0)))
        .withColumn("w", F.col("_w"))
        .withColumn("ht_weight", F.greatest(F.col("w"), F.col("tau")))
        .select(*df.columns, "w", "prio_rank", "tau", "ht_weight")
    )


def dedup_weighted_sample(docs, k: int, text_col: str = "text",
                          id_col: str = "doc_id",
                          max_distance: int = 3,
                          salt: str = "priosample-v1"):
    """Duplication-neutral corpus sampling: priority-sample exactly
    ``k`` documents with weight 1 / near-dup-cluster-size, so every
    near-duplicate CLUSTER contributes equal expected mass however
    many copies of it the raw crawl holds — the sampling-time
    counterpart of dedup-then-sample (which destroys provenance) and
    the standard correction when audits/evals must run on the RAW
    corpus. Composes two gated operators verbatim:
    ``cluster.neardup_clusters`` (SimHash + pigeonhole CC — supplies
    cluster_size) and ``priority_sample`` (exact-size, no-RNG,
    Horvitz-Thompson ht_weight, so subset-sum estimates over the
    sample remain unbiased UNDER the dedup weighting — e.g.
    "distinct-content tokens per source" straight from the sample).

    Weight is ONE IEEE division of identically-constructed operands
    (1.0 / int-cast-to-double), correctly rounded in both engines —
    the priority_sample determinism contract holds end to end.

    Output: (doc_id, cluster_id, cluster_size, w, prio_rank, tau,
    ht_weight). LANDING ROUTE: rides q37's r14 re-gate (q37 owns the
    near-dup-cluster surface) as kind='dedup_sample' rows; draft in
    tests/test_r15_gate_drafts.py."""
    from formula1_data_pipeline_spark.operators.cluster import (
        neardup_clusters,
    )

    cl = neardup_clusters(docs, text_col=text_col, id_col=id_col,
                          max_distance=max_distance)
    return priority_sample(
        cl.select(id_col, "cluster_id", "cluster_size"),
        F.lit(1.0) / F.col("cluster_size").cast("double"),
        k, id_col=id_col, salt=salt,
    )
