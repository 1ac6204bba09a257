"""Dataset version diff — row-level added / removed / changed
between two snapshots of a keyed table.

The audit step between corpus versions a training-data pipeline
runs before retraining ("what changed since the last cut?") and the
readable face of the txn layer's time travel (``read_table(...,
version=...)`` gives the two sides; ``txn_delete_keys`` produces
exactly the 'removed' rows this report must show). The shape is the
Delta-Lake change-data-feed question answered engine-side, with no
log requirement: ONE null-safe full outer join on the key, comparing
a content hash per side.

Semantics:

* ``added``   — key present only in ``new``.
* ``removed`` — key present only in ``old``.
* ``changed`` — key in both, content hash differs over
  ``compare_cols`` (default: all shared non-key columns, sorted by
  name so both engines agree on the order).
* unchanged rows are dropped (the report is the delta, not the
  corpus) — at 100 TB the output is |changes|, not |rows|.

Content hash: md5 over '|'-joined columns with NULLs coalesced to a
sentinel BEFORE joining — ``concat_ws`` silently SKIPS nulls, so
("a", NULL, "b") and ("a", "b", NULL) would otherwise collide (the
scaffold fingerprint lives with fixed column sets where that is
safe; a diff cannot assume it). The same expression is DuckDB-
replayable verbatim, so diff reports sit under the full value hash.

Scale shape: one hash-partitioned full outer join on the key — both
sides shuffle once on the join key, the hash is a codegen'd
projection, and the filter drops unchanged rows before any further
stage. No window, no driver state.

Pre-staged round 11 (third session); LANDING ROUTE: rides q75's r12
re-gate (q75 owns time travel + the targeted delete's
before/after legs, r10-gated, due r12) as kind='diff' rows — the
deleted keys MUST surface as status='removed', tying the diff
report to the delete's contract under one gate. Draft:
tests/test_r14_gate_drafts.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: NULL sentinel inside the content hash — printable, identical
#: literal in Spark and DuckDB SQL.
NULL_MARK = "␀"


def content_hash(cols: list[str]) -> F.Column:
    """md5 over the null-coalesced '|'-join of ``cols`` — the
    row-content fingerprint both engines compute identically."""
    return F.md5(F.concat_ws("|", *[
        F.coalesce(F.col(c).cast("string"), F.lit(NULL_MARK))
        for c in cols
    ]))


def content_hash_sql(cols: list[str]) -> str:
    """DuckDB twin of ``content_hash`` (same sentinel, same order)."""
    joined = ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), '{NULL_MARK}')" for c in cols)
    return f"md5(concat_ws('|', {joined}))"


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff report: ``status`` (added / removed / changed)
    + key cols + ``old_hash`` / ``new_hash`` (NULL on the absent
    side). ``compare_cols`` defaults to every column both sides
    share minus the keys, sorted by name."""
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(shared - set(key_cols))
    o = old.select(*key_cols,
                   content_hash(compare_cols).alias("old_hash"))
    n = new.select(*key_cols,
                   content_hash(compare_cols).alias("new_hash"))
    joined = o.join(n, on=key_cols, how="full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"),
              F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select("status", *key_cols, "old_hash", "new_hash")
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n) counts over a ``dataset_diff`` report — the
    one-line health check a pipeline alerts on."""
    return (diff.groupBy("status")
            .agg(F.count("*").cast("long").alias("n")))
