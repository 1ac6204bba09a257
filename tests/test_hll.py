"""Persisted mergeable HLL sketch table (operators/hll.py) —
merge-exactness vs one-shot, value-level idempotence under
re-delivery, rollup over stored groups, accuracy bound vs exact,
compaction invariance, and the marker-atomicity protocol."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.hll import (
    hll_distinct_estimates,
    hll_sketch_append,
    hll_sketch_compact,
    _tables,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    from formula1_data_pipeline_spark.queries import load

    return load(spark, SF_DIR, "documents")["documents"]


def _est(spark, idx, cols=None):
    return {
        tuple(r[c] for c in (cols or [])) or r[0 if not cols else None]:
        r.n_distinct_est
        for r in hll_distinct_estimates(spark, idx, cols).collect()
    } if cols else {
        r.source: r.n_distinct_est
        for r in hll_distinct_estimates(spark, idx).collect()
    }


@pytest.fixture()
def idx(tmp_path):
    return str(tmp_path / "hllidx")


def test_batched_tracks_oneshot_and_exact(spark, idx, tmp_path):
    """Union-of-batch-sketches vs one-shot sketch of the union:
    NOT bit-identical — Spark's DataSketches one-shot estimator and
    the union-gadget estimator disagree by ~1 at coupon-mode
    cardinalities (measured: 24 exact -> one-shot 25, union 24) —
    but both must sit within the HLL error bound of exact, and the
    batched estimate is itself deterministic (re-derived equal)."""
    docs = _docs(spark)
    for lo, hi in ((0, 150), (150, 350), (350, 10 ** 9)):
        hll_sketch_append(
            spark,
            docs.filter((F.col("doc_id") > lo) & (F.col("doc_id") <= hi)),
            idx, ["source"], "doc_id")
    one = str(tmp_path / "oneshot")
    hll_sketch_append(spark, docs, one, ["source"], "doc_id")
    batched, oneshot = _est(spark, idx), _est(spark, one)
    exact = {
        r.source: r.n
        for r in docs.groupBy("source").agg(
            F.countDistinct("doc_id").alias("n")).collect()
    }
    assert batched.keys() == oneshot.keys() == exact.keys()
    for s, n in exact.items():
        bound = max(2, 0.05 * n)
        assert abs(batched[s] - n) <= bound, (s, batched[s], n)
        assert abs(oneshot[s] - n) <= bound, (s, oneshot[s], n)
    # deterministic: the same landed state re-estimates identically
    assert _est(spark, idx) == batched


def test_redelivery_is_value_idempotent(spark, idx):
    """A re-delivered batch cannot move any estimate: inserting an
    already-represented value is a register no-op — the ingestion
    dedup problem doesn't exist for sketches."""
    docs = _docs(spark)
    hll_sketch_append(spark, docs, idx, ["source"], "doc_id")
    before = _est(spark, idx)
    hll_sketch_append(
        spark, docs.filter(F.col("doc_id") % 3 == 0),
        idx, ["source"], "doc_id")
    assert _est(spark, idx) == before


def test_rollup_subset_of_groups(spark, idx):
    """Estimating over a SUBSET of the stored group columns unions
    the finer sketches — equal to sketching the coarser grouping
    directly (the incremental rollup exact counts can't do)."""
    docs = _docs(spark)
    hll_sketch_append(spark, docs, idx, ["source", "lang"], "doc_id")
    per_source = {
        r.source: r.n_distinct_est
        for r in hll_distinct_estimates(
            spark, idx, ["source"]).collect()
    }
    direct = {
        r.source: r.n_distinct_est
        for r in _docs(spark).groupBy("source").agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("doc_id", F.lit(12))
            ).cast("long").alias("n_distinct_est")).collect()
    }
    assert per_source == direct
    total = hll_distinct_estimates(spark, idx, []).collect()
    assert len(total) == 1 and total[0].n_distinct_est > 0


def test_estimate_within_hll_bound(spark, idx):
    """|est - exact| <= 5 * (1.04 / sqrt(2^lg_k)) * exact at a
    cardinality (50k) far past sparse mode — the standard-error
    bound the r13 gate will pin per source."""
    big = spark.range(50_000).select(
        F.lit("s").alias("g"), F.col("id").alias("v"))
    hll_sketch_append(spark, big, idx, ["g"], "v")
    est = hll_distinct_estimates(spark, idx).collect()[0].n_distinct_est
    rel = 5 * 1.04 / (2 ** 12) ** 0.5
    assert abs(est - 50_000) <= rel * 50_000, est


def test_partitioning_invariance(spark, idx, tmp_path):
    docs = _docs(spark)
    hll_sketch_append(spark, docs.repartition(13), idx,
                      ["source"], "doc_id")
    other = str(tmp_path / "h2")
    hll_sketch_append(spark, docs.coalesce(1), other,
                      ["source"], "doc_id")
    assert _est(spark, idx) == _est(spark, other)


def test_compaction_folds_and_preserves(spark, idx):
    from formula1_data_pipeline_spark.sources.txn import read_table

    docs = _docs(spark)
    for m in (0, 1, 2):
        hll_sketch_append(
            spark, docs.filter(F.col("doc_id") % 3 == m),
            idx, ["source"], "doc_id")
    before = _est(spark, idx)
    t = _tables(idx)
    n_groups = _docs(spark).select("source").distinct().count()
    assert read_table(spark, t["sketches"]).count() > n_groups
    hll_sketch_compact(spark, idx)
    assert _est(spark, idx) == before
    # folded to one committed row per group (crashed-attempt orphans
    # would be dropped by the rewrite; none here)
    assert read_table(spark, t["sketches"]).count() == n_groups


def test_uncommitted_append_is_invisible(spark, idx):
    """Rows landed WITHOUT their commits marker (a crashed append)
    must not contribute — readers filter on committed attempts."""
    from formula1_data_pipeline_spark.sources.txn import txn_append

    docs = _docs(spark)
    hll_sketch_append(
        spark, docs.filter(F.col("doc_id") <= 200), idx,
        ["source"], "doc_id")
    before = _est(spark, idx)
    orphan = (
        docs.groupBy("source")
        .agg(F.hll_sketch_agg("doc_id", F.lit(12)).alias("sketch"))
        .select("source", "sketch", F.lit("deadbeef").alias("attempt"))
    )
    txn_append(spark, orphan, _tables(idx)["sketches"],
               stats_cols=["source"])
    assert _est(spark, idx) == before


def test_empty_batch_is_noop(spark, idx):
    docs = _docs(spark)
    assert hll_sketch_append(
        spark, docs.filter(F.lit(False)), idx, ["source"], "doc_id"
    ) == 0
