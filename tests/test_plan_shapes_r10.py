"""Plan-shape pins for the late-round-10 operators — the 100 TB
design claims asserted against the actual physical plans, the
test_winnow discipline: exchange counts bounded, broadcasts where
the docstrings promise them, no sort-based global stages."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> int:
    return plan.count("Exchange") - plan.count("ReusedExchange")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, "the quick brown fox " * (1 + i % 3)) for i in range(40)],
        "doc_id long, text string",
    ).cache()


def test_cms_probe_is_broadcast_only(spark, docs):
    """The probe side must never shuffle: d broadcast joins + one
    least() projection — zero exchanges beyond the bounded build."""
    from formula1_data_pipeline_spark.operators import sketch as S

    grams = S.gram_occurrences(docs, 2)
    counters = S.cms_counters(grams, "gram", 4, 8)
    # freeze the (bounded) build so the probe plan stands alone
    counters = counters.localCheckpoint(eager=True)
    plan = _plan(S.cms_probe(docs.select(
        F.col("text").alias("gram")), "gram", counters, 4, 8))
    assert plan.count("BroadcastHashJoin") == 4, plan
    assert _exchanges(plan) == plan.count("BroadcastExchange"), plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_systematic_sample_two_data_exchanges(spark):
    """One hash-bucket exchange for the per-bucket window + the
    bucket-sums aggregation exchange over the tiny table + the
    broadcast of offsets — no global sort of the data."""
    from formula1_data_pipeline_spark.operators.sampling import (
        systematic_sample,
    )

    df = spark.createDataFrame(
        [(i, float(i % 7) + 1) for i in range(200)],
        "doc_id long, wgt double",
    )
    plan = _plan(systematic_sample(df, F.col("wgt"), 10))
    # big-side exchanges: bucket hash partitioning (window) + the
    # groupBy(_bkt) agg; offsets arrive by broadcast; the only sorts
    # are within-bucket window sorts, never a global range sort
    assert "BroadcastExchange" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert _exchanges(plan) - plan.count("BroadcastExchange") <= 3, plan


def test_zorder_assignment_no_global_sort(spark):
    """Exact ranks without a global single-task sort: bucket hash
    exchange + tiny offsets broadcast; the within-bucket sort is
    partitioned."""
    from formula1_data_pipeline_spark.operators import zorder as Z

    df = spark.createDataFrame(
        [(i, i % 31, (i * 7) % 29) for i in range(300)],
        "id long, x long, y long",
    )
    plan = _plan(Z.zorder_assignment(df, ["x", "y"], 4, "id", bits=5))
    assert "rangepartitioning" not in plan.lower(), plan
    assert "BroadcastExchange" in plan, plan


def test_quantile_histogram_single_aggregate_exchange(spark):
    """The histogram build is ONE hash aggregation with map-side
    partial combine — a single data exchange on the bucket key."""
    from formula1_data_pipeline_spark.operators import quality as Q

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 500)], "g string, v double")
    plan = _plan(Q.quantile_histogram(df, "v", ["g"]))
    assert _exchanges(plan) == 1, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def test_bloom_membership_is_broadcast_only(spark, docs):
    """bloom_contains' big side must not shuffle before the verdict
    aggregation: membership is explode + ONE broadcast join."""
    from formula1_data_pipeline_spark.operators import bloom as B
    from formula1_data_pipeline_spark.operators.text import (
        shingle_hashes_df,
    )

    bench = shingle_hashes_df(docs.limit(5)).select("h")
    words = B.bloom_build(bench).localCheckpoint(eager=True)
    corpus = shingle_hashes_df(docs)
    plan = _plan(B.bloom_contains(corpus, words))
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan
