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
