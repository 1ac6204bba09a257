"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``formula1_data_pipeline_spark.queries``
(the operator catalog, one entry per SURVEY.md §2 operator family).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from formula1_data_pipeline_spark.queries import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship composite pipeline (as-of join + window features +
    summary agg — SURVEY.md §7 step 4) on sf0.001."""
    return CATALOG["q40_flagship_pipeline"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in CATALOG.items()
        if spec.oracle is not None
    }
