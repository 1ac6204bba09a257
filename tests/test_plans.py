"""Physical-plan regression tests — lock in the SCALE.md audit claims
so future changes can't silently reintroduce shuffles or lose
pushdown/broadcast properties."""

from __future__ import annotations

from formula1_data_pipeline_spark.queries import CATALOG

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return (
        CATALOG[name].fn(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )


def test_flagship_single_shuffle(spark):
    plan = plan_of(spark, "q40_flagship_pipeline")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_agg_back_join_broadcasts(spark):
    plan = plan_of(spark, "q06_agg_back_join")
    assert "BroadcastHashJoin" in plan
    # the detail stream must not shuffle
    assert "Exchange hashpartitioning" not in plan.split(
        "BroadcastExchange"
    )[0], plan


def test_anti_join_broadcasts(spark):
    plan = plan_of(spark, "q07_anti_join")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_top1_no_global_sort(spark):
    plan = plan_of(spark, "q08_top1_priority")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q12_window_filter")
    # predicates reach the parquet scan
    assert "PushedFilters: [IsNotNull" in plan, plan
    # column pruning: o_comment-like unused columns absent from ReadSchema
    scan = plan[plan.index("FileScan"):]
    assert "o_totalprice" in scan.split("ReadSchema")[0]


def test_groupby_partial_aggregation(spark):
    plan = plan_of(spark, "q05_groupby_summary")
    assert "partial_sum" in plan or "partial_count" in plan, plan
