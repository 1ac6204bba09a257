"""Data-quality assertions — the ``dbt test`` equivalent.

The reference declares 55 ``not_null`` tests over key/grain columns
(``dbt/models/schema.yml:9-179``) run by the ``dbt_test`` task
(``dags/formula1_elt_dag.py:46-50``). Reproduced here as cheap Spark
checks, plus the uniqueness assertion on the dedup grain the reference
*implies* (its row_number dedup) but never asserts — SURVEY.md §5 (4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# model -> columns with not_null tests (dbt/models/schema.yml:9-179)
NOT_NULL_TESTS: dict[str, list[str]] = {
    "stg_openf1_laps_historical": ["meeting_key", "session_key", "driver_number", "lap_number"],
    "stg_openf1_laps_realtime": ["meeting_key", "session_key", "driver_number", "lap_number"],
    "stg_openf1_position_historical": ["meeting_key", "session_key", "driver_number", "event_timestamp"],
    "stg_openf1_position_realtime": ["meeting_key", "session_key", "driver_number", "event_timestamp"],
    "stg_openf1_race_control_historical": ["meeting_key", "session_key", "event_timestamp", "message"],
    "stg_openf1_race_control_realtime": ["meeting_key", "session_key", "event_timestamp", "message"],
    "int_openf1_laps_all": ["meeting_key", "session_key", "driver_number", "lap_number"],
    "int_openf1_position_all": ["meeting_key", "session_key", "driver_number", "event_timestamp"],
    "int_openf1_race_control_all": ["meeting_key", "session_key", "event_timestamp", "message"],
    "int_session_driver_laps": ["meeting_key", "session_key", "driver_number", "lap_number"],
    "int_driver_lap_features": ["meeting_key", "session_key", "driver_number", "lap_number"],
    "fct_driver_laps": ["meeting_key", "session_key", "driver_number", "lap_number"],
    "fct_driver_race_summary": ["meeting_key", "session_key", "driver_number"],
    "final_f1": ["meeting_key", "session_key", "driver_number", "lap_number"],
}

# dedup grain per model whose uniqueness the pipeline depends on
UNIQUE_GRAIN: dict[str, list[str]] = {
    "int_openf1_laps_all": ["meeting_key", "session_key", "driver_number", "lap_number"],
    "int_openf1_position_all": ["meeting_key", "session_key", "driver_number", "event_timestamp"],
    "int_openf1_race_control_all": ["meeting_key", "session_key", "event_timestamp", "message"],
    "int_session_driver_laps": ["meeting_key", "session_key", "driver_number", "lap_number"],
    "fct_driver_race_summary": ["meeting_key", "session_key", "driver_number"],
}


@dataclass
class AssertionFailure:
    model: str
    kind: str
    detail: str


def check_not_null(df: DataFrame, model: str, cols: list[str]) -> list[AssertionFailure]:
    """One pass per model: count nulls in all tested columns at once
    (single job, not one scan per column)."""
    aggs = [F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in cols]
    row = df.agg(*aggs).first()
    return [
        AssertionFailure(model, "not_null", f"{c}: {row[c]} null rows")
        for c in cols
        if row[c] > 0
    ]


def check_unique(df: DataFrame, model: str, grain: list[str]) -> list[AssertionFailure]:
    dups = (
        df.groupBy(*grain).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dups:
        return [AssertionFailure(model, "unique", f"duplicate grain {grain}")]
    return []


def assertions_report(built: dict[str, DataFrame]) -> DataFrame:
    """Every declared assertion as ONE DataFrame — (model, kind,
    passed) — evaluated in a single job.

    ``run_assertions`` fires one action per check; at 19 checks the
    fixed per-action cost (plan + codegen + scheduling, ~0.2-0.9 s
    each) dwarfs the scans (measured 10-15 s for the q74 gate at
    sf0.1). Unioning the per-model 1-row summaries lets one job carry
    all of them; persist the built models first if the shared chain
    prefix is expensive relative to its size.
    """
    legs: list[DataFrame] = []
    for model, cols in NOT_NULL_TESTS.items():
        if model not in built:
            continue
        total_nulls = None
        for c in cols:
            n = F.count(F.when(F.col(c).isNull(), 1))
            total_nulls = n if total_nulls is None else total_nulls + n
        legs.append(
            built[model].agg((total_nulls == 0).alias("passed")).select(
                F.lit(model).alias("model"),
                F.lit("not_null").alias("kind"),
                "passed",
            )
        )
    for model, grain in UNIQUE_GRAIN.items():
        if model not in built:
            continue
        legs.append(
            built[model].groupBy(*grain).count()
            .agg(
                F.coalesce(F.max("count") <= 1, F.lit(True)).alias("passed")
            )
            .select(
                F.lit(model).alias("model"),
                F.lit("unique").alias("kind"),
                "passed",
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def run_assertions(built: dict[str, DataFrame]) -> list[AssertionFailure]:
    """Run every declared assertion against built models; returns the
    failures (empty == the dbt-test stage passes)."""
    failures: list[AssertionFailure] = []
    for model, cols in NOT_NULL_TESTS.items():
        if model in built:
            failures += check_not_null(built[model], model, cols)
    for model, grain in UNIQUE_GRAIN.items():
        if model in built:
            failures += check_unique(built[model], model, grain)
    return failures
