"""Raw-layer sinks — the S4-S8 ingest surface, Spark-first.

The reference lands API JSON into all-VARCHAR Snowflake tables with
batched INSERTs, delete+reload upserts, and drop-recreate schema
recovery (``dags/open_f1_historical.py:111-152``,
``dags/open_f1_realtime.py:108-170``). The Spark-native equivalents:

- **append_raw** (S4+S5): all-string landing + ``mode("append")``
  parquet — Spark batches writes per partition; no 5000-row
  executemany loop needed.
- **replace_by_key** (S6): the delete+reload upsert as an atomic
  partition-scoped replace — only the partitions present in the
  incoming batch are replaced, the exact semantic of
  ``DELETE WHERE session_key = X`` + re-insert, minus the two-step
  race window.
- **merge_upsert** (S6 alt): key-based last-write-wins merge for
  non-partitioned layouts — read, union (schema drift tolerated via
  unionByName/allowMissingColumns, replacing the reference's
  drop-and-recreate S7 destructively losing data), priority-dedup,
  rewrite.
- **skip_loaded** (S8): left-anti join of candidate keys against
  already-landed keys.

Both mutating sinks default to the **manifest commit protocol**
(``sources/txn.py``): immutable data dirs + an atomically-published
single-object manifest, the object-store-safe replacement for the
directory-rename swap (atomic only on POSIX/HDFS) and the dynamic
partition overwrite (non-transactional on S3-class stores). Read the
landed tables back with ``txn.read_table`` — it falls through to a
plain parquet read for non-manifest layouts. ``protocol="rename"`` /
``protocol="overwrite"`` keep the old physical layouts for plain-
parquet consumers.

At 100 TB: raw tables partition by the replace key (session_key here,
date/hour for event feeds), so a realtime refresh touches one
partition's files and incremental loads prune everything else; the
manifest carries untouched partitions forward by reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.functions.cleaning import stringify_all


# one Hadoop-FS access layer for the whole sources package (txn.py owns
# it; duplicating it here invited divergence — r4 review finding)
from formula1_data_pipeline_spark.sources.txn import (  # noqa: E402
    _exists as _path_exists,
    _fs,
)


def _swap_in(spark: SparkSession, staged: str, path: str) -> None:
    """Promote a fully-written staged directory to ``path`` with
    directory renames — atomic on POSIX and HDFS, so a concurrent
    reader sees either the old table or the new one, never a
    half-overwritten mix of both (the failure mode of overwriting the
    live directory in place). The displaced old table is removed only
    after the new one is live; on any earlier failure the live table
    is untouched and only a staged/old dir leaks for manual cleanup.

    Object stores have no atomic rename — there the production path is
    a transactional table format (Delta/Iceberg MERGE, reference
    semantics ``dags/open_f1_realtime.py:153-170``); this rename
    protocol is the strongest dependency-free equivalent.
    """
    import uuid

    jvm = spark._jvm
    fs, hpath = _fs(spark, path)
    hstaged = jvm.org.apache.hadoop.fs.Path(staged)
    hold = jvm.org.apache.hadoop.fs.Path(f"{path}.old-{uuid.uuid4().hex[:8]}")
    if fs.exists(hpath):
        if not fs.rename(hpath, hold):
            raise IOError(f"swap: could not displace live table {path}")
    if not fs.rename(hstaged, hpath):
        # roll the old table back so readers keep a live path
        if fs.exists(hold):
            fs.rename(hold, hpath)
        raise IOError(f"swap: could not promote staged table to {path}")
    if fs.exists(hold):
        fs.delete(hold, True)


def append_raw(df: DataFrame, path: str,
               partition_by: list[str] | None = None) -> None:
    """S4+S5: land as all-string parquet, append-only."""
    w = stringify_all(df).write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def replace_by_key(df: DataFrame, path: str, key: str,
                   protocol: str = "manifest",
                   stats_cols: list[str] | None = None) -> None:
    """S6: atomically replace exactly the ``key`` partitions present in
    ``df`` — the delete+reload upsert.

    ``protocol="manifest"`` (default) commits via txn.py: new partition
    dirs staged invisibly, untouched partitions carried forward by
    reference, one atomic manifest publish — transactional on object
    stores. ``protocol="overwrite"`` is the legacy dynamic partition
    overwrite (plain parquet layout, non-transactional on S3-class
    stores).

    ``stats_cols`` (manifest protocol only): record per-segment
    min/max for these columns so ``txn.read_table(prune=...)`` can
    skip segments — e.g. land sessions with ``stats_cols=
    ["date_start"]`` and season-window reads never list the other
    seasons' files. ``None`` inherits whatever the table already
    records."""
    if protocol == "manifest":
        from formula1_data_pipeline_spark.sources.txn import txn_replace

        txn_replace(df.sparkSession, stringify_all(df), path, key,
                    stats_cols=stats_cols)
        return
    (
        stringify_all(df)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(key)
        .parquet(path)
    )


def merge_upsert(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    keys: list[str],
    order: list[Column],
    order_cols: list[str] | None = None,
    protocol: str = "manifest",
) -> None:
    """S6/S7: last-write-wins merge into a non-partitioned table. New
    columns from schema drift survive as NULLs on old rows (the
    non-destructive upgrade of the reference's drop-recreate).

    ``order_cols`` names plain columns the ``order`` expressions
    reference that a batch may not carry yet (e.g. a ``loaded_at``
    stamp that first appears mid-stream): they are null-filled so the
    priority sort resolves instead of failing analysis — drift in the
    order column gets the same NULL tolerance as any other drifted
    column.

    ``protocol="manifest"`` (default) commits through txn.txn_merge:
    the merge result is staged invisibly and published with one atomic
    put-if-absent manifest — transactional on object stores, and
    concurrent merges retry against the new snapshot instead of losing
    updates. ``protocol="rename"`` keeps the legacy staged-write +
    directory-rename swap (plain parquet layout; atomic on POSIX/HDFS
    only).

    Read-modify-write: fine for dimension-sized tables; big facts
    should use replace_by_key partitioning instead.
    """
    from formula1_data_pipeline_spark.operators.dedup_priority import (
        dedup_by_priority,
    )

    import uuid

    def _ensure_order_cols(frame: DataFrame) -> DataFrame:
        for name in order_cols or []:
            if name not in frame.columns:
                frame = frame.withColumn(name, F.lit(None).cast("string"))
        return frame

    incoming = _ensure_order_cols(stringify_all(df))

    def merge_fn(existing: DataFrame | None) -> DataFrame:
        # A genuinely missing table takes the fresh-write path — which
        # must also enforce key uniqueness, or the landed state would
        # depend on how the first batch was split. A transient/corrupt
        # read error surfaces instead of silently overwriting landed
        # data with the incoming batch alone.
        if existing is None:
            return dedup_by_priority(incoming, keys=keys, order=order)
        return dedup_by_priority(
            incoming.unionByName(_ensure_order_cols(existing),
                                 allowMissingColumns=True),
            keys=keys,
            order=order,
        )

    if protocol == "manifest":
        from formula1_data_pipeline_spark.sources.txn import txn_merge

        txn_merge(spark, path, merge_fn)
        return

    merged = merge_fn(
        spark.read.parquet(path) if _path_exists(spark, path) else None
    )
    staged = f"{path}.staged-{uuid.uuid4().hex[:8]}"
    # the merged plan reads lazily from the live files — fully
    # materialize into the staged dir before touching the table
    merged.write.mode("overwrite").parquet(staged)
    _swap_in(spark, staged, path)


def skip_loaded(candidates: DataFrame, loaded: DataFrame,
                key: str = "session_key") -> DataFrame:
    """S8: drop candidate rows whose key already landed
    (``dags/open_f1_historical.py:226-231``). Broadcast left-anti —
    the loaded-keys side is a DISTINCT projection, always small."""
    return candidates.join(
        F.broadcast(loaded.select(key).distinct()), key, "left_anti"
    )
