"""SCD type-2 history — the dbt-snapshot semantics the reference
declares but never exercises.

The reference's third DAG runs ``dbt snapshot`` after tests
(``dags/dbt_dag.py``), but the project defines no snapshot models, so
the step is a verified no-op (SURVEY.md §2.11 M2). This operator
supplies the semantics that step WOULD have: collapse an event stream
into slowly-changing-dimension type-2 rows — one row per contiguous
run of an attribute value per key, with ``valid_from`` / ``valid_to``
interval bounds and an ``is_current`` flag (dbt's
``dbt_valid_from/dbt_valid_to`` columns).

Shape: gaps-and-islands — one window pass to flag changes, a running
sum to number islands, one aggregate per island, one lead() for the
closing bound. Two shuffles on the key (window + agg share the
partitioning; Catalyst reuses the exchange). At 100 TB the windows
partition by the dimension key, so parallelism is key-cardinality;
no global ordering anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 history of ``attr_col`` per ``key_col`` ordered by
    (``ts_col``, ``tiebreak_col``): one output row per contiguous run
    of equal attribute values, with the interval it was valid for.

    Returns (key, attr, valid_from, valid_to, n_events, is_current);
    ``valid_to`` is NULL on each key's current row. Deterministic for
    any tie-broken total order per key.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    flagged = df.select(
        key_col, attr_col, ts_col,
        F.when(
            F.lag(attr_col).over(w).isNull()
            | (F.col(attr_col) != F.lag(attr_col).over(w)),
            1,
        ).otherwise(0).alias("_chg"),
        F.col(tiebreak_col).alias("_tb"),
    ).withColumn(
        "_island",
        F.sum("_chg").over(
            Window.partitionBy(key_col).orderBy(ts_col, "_tb")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = flagged.groupBy(key_col, "_island", attr_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    w_runs = Window.partitionBy(key_col).orderBy("_island")
    return runs.select(
        key_col,
        F.col(attr_col).alias("attr"),
        "valid_from",
        F.lead("valid_from").over(w_runs).alias("valid_to"),
        "n_events",
    ).withColumn("is_current", F.col("valid_to").isNull())
