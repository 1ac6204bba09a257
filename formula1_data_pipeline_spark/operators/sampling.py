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


def hash_bucket(key: Column, salt: str, n_buckets: int = 100) -> Column:
    """Uniform bucket in [0, n_buckets) from md5(key || '|' || salt).
    Different salts give independent bucketings, so a split salt and a
    downsample salt don't correlate."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", key.cast("string"), F.lit(salt))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(n_buckets))


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

    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", key.cast("string"), F.lit(salt))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy(*stratum_cols).orderBy(h.asc(), key.asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
