"""Persisted incremental IVF-flat vector index — the ANN twin of the
incremental BM25 index (``operators/retrieval.py``).

``similarity.ivf_flat_topk`` quantizes the corpus per query batch; a
production embedding store is APPENDED to continuously and probed far
more often than it changes, so the inverted lists must be LANDED
state, not a per-query computation. The index is two manifest-txn
tables under one directory (the q83/q87/bm25-index ingestion
discipline — landed state read-only, atomic commits, landed ids
skipped):

  centroids/  (cluster, cnorm, d, coef)   the frozen quantizer —
              Lloyd-trained at build time (``train_ivf_centroids``)
              or any offline k-means table
  lists/      (cluster, id, vec, nrm)     the inverted lists,
              PARTITIONED BY cluster (txn key) so a probe's
              ``cluster IN (...)`` filter prunes at the FILE level —
              a query reads ~n_probe/n_centroids of the landed bytes

Append policy (the FAISS/production convention): new vectors are
assigned to the FROZEN quantizer — appending never retrains, so the
index stays queryable and deterministic through ingestion; quantizer
refresh is an explicit offline ``ivf_index_build`` rebuild (monitor
assignment drift with ``operators/quality.drift_report`` over the
cluster column to know when). Because assignment given fixed
centroids is deterministic, build-then-append equals one-shot
indexing of the union — property-tested.

Determinism: trained centroids are float-path (partial-sum order) —
the q92 rule applies: gate index QUALITY with recall bounds, never
value-hash trained floats; gate index MECHANICS (append/skip/prune/
query given fixed centroids) with exact Spark-vs-Spark equivalence,
which is what the draft gates do.

Pre-staged round 10; lands via a due ANN re-gate (q26/q34/q92) per
the CHANGELOG landing-plan rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from formula1_data_pipeline_spark.operators.similarity import (
    _as_double,
    _ivf_assign,
    cosine_from_norms,
    norm,
    train_ivf_centroids,
)

_CENTROIDS, _LISTS, _META = "centroids", "lists", "meta"


def _tables(index_dir: str) -> dict[str, str]:
    return {n: f"{index_dir}/{n}" for n in (_CENTROIDS, _LISTS, _META)}


def _quantizer_id(coefs: DataFrame) -> str:
    """Content hash of a quantizer table — driver-side over the tiny
    (n_centroids x dim) frame, float.hex so equal stored doubles hash
    equal."""
    import hashlib

    rows = sorted(
        (int(r["cluster"]), int(r["d"]),
         float(r["coef"]).hex(), float(r["cnorm"]).hex())
        for r in coefs.select("cluster", "d", "coef", "cnorm").collect()
    )
    return hashlib.md5(repr(rows).encode()).hexdigest()[:16]


def _check_consistent(spark, index_dir: str) -> None:
    """Refuse to read an index whose centroids and lists come from
    different builds. ``ivf_index_build`` lands centroids -> lists ->
    meta (meta LAST, carrying the quantizer's content hash), so a
    crash between any two commits leaves meta absent or stale and
    every subsequent read fails LOUDLY here — instead of silently
    probing lists partitioned under one quantizer with cluster ids
    assigned under another (round-10 review finding)."""
    from formula1_data_pipeline_spark.sources.txn import read_table

    t = _tables(index_dir)
    try:
        meta_id = read_table(spark, t[_META]).collect()[0]["quantizer_id"]
    except Exception as e:  # noqa: BLE001 — any read failure = no marker
        raise RuntimeError(
            f"IVF index at {index_dir} has no readable build marker — "
            "an interrupted ivf_index_build left a partial index; "
            "re-run ivf_index_build"
        ) from e
    landed_id = _quantizer_id(_read_centroids(spark, index_dir))
    if meta_id != landed_id:
        raise RuntimeError(
            f"IVF index at {index_dir} is inconsistent: centroids are "
            f"from build {landed_id} but lists were committed under "
            f"build {meta_id} — an interrupted rebuild; re-run "
            "ivf_index_build"
        )


def _assign_rows(emb: DataFrame, coefs: DataFrame, n_assign: int,
                 id_col: str, vec_col: str) -> DataFrame:
    """(cluster, id, vec, nrm) inverted-list rows for ``emb`` under
    the given quantizer — one explode + broadcast-centroid join +
    per-(id, cluster) SUM, the `_ivf_assign` shape."""
    base = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    ).withColumn("nrm", norm(F.col("vec")))
    # _ivf_assign's empty prefix emits (id, vec, norm, cluster)
    return _ivf_assign(base, coefs, n_assign, "").select(
        "cluster", F.col("id"), F.col("vec"),
        F.col("norm").alias("nrm"),
    )


def ivf_index_build(
    spark,
    emb: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    n_iter: int = 5,
    n_assign: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_coefs: DataFrame | None = None,
) -> None:
    """Train (or accept) the quantizer and land the full index
    atomically: centroids via txn_overwrite, inverted lists via
    txn_overwrite partitioned by cluster. A rebuild supersedes
    everything (auto_vacuum reclaims the old generation)."""
    from formula1_data_pipeline_spark.sources.txn import txn_overwrite

    t = _tables(index_dir)
    coefs = (
        centroid_coefs if centroid_coefs is not None
        else train_ivf_centroids(emb, n_centroids, n_iter,
                                 id_col, vec_col)
    )
    # the quantizer table is tiny (n_centroids x dim rows) but must be
    # exactly reusable — land it before deriving anything from it,
    # then read the LANDED copy so build and later appends assign
    # against byte-identical coefficients
    txn_overwrite(spark, coefs, t[_CENTROIDS], auto_vacuum=True)
    landed = _read_centroids(spark, index_dir)
    rows = _assign_rows(emb.filter(F.col(id_col).isNotNull()), landed,
                        n_assign, id_col, vec_col)
    # id stats in the manifest let appends prune the landed-id skip
    # to segments whose [min, max] id range can intersect the batch —
    # without them the skip's anti-join scans every landed segment,
    # so append cost grows with INDEX size instead of batch size
    # (round-10 verdict finding)
    txn_overwrite(spark, rows, t[_LISTS], key="cluster",
                  auto_vacuum=True, stats_cols=["id"])
    # meta LAST: the build marker carries the landed quantizer's
    # content hash, and readers (_check_consistent) refuse the index
    # until it matches — so a crash between the three commits is a
    # loud partial-build error, never a silent old-lists/new-quantizer
    # mismatch
    meta = spark.createDataFrame(
        [(_quantizer_id(landed),)], "quantizer_id string"
    )
    txn_overwrite(spark, meta, t[_META], auto_vacuum=True)


def _read_centroids(spark, index_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.sources.txn import read_table

    return read_table(spark, _tables(index_dir)[_CENTROIDS]).select(
        F.col("cluster").cast("int").alias("cluster"),
        "cnorm", "d", "coef",
    )


def ivf_index_append(
    spark,
    emb: DataFrame,
    index_dir: str,
    n_assign: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Fold new vectors into the landed index against the FROZEN
    quantizer; returns the number of NEW vectors indexed. Landed ids
    are skipped via one column-pruned anti-join whose landed side is
    MANIFEST-PRUNED to the batch's id range (re-delivered batches
    are idempotent — the S8 discipline): segments whose recorded
    [min, max] id cannot intersect the batch are never scanned, so
    the skip's cost tracks the batch's id locality, not the index
    size — the delta-log invariant the BM25 index pins, closed here
    for the vector index (round-10 verdict finding; under
    monotonically increasing ingestion ids, old segments never
    overlap a new batch and the skip reads ~1 segment however large
    the index has grown). Pruning is fail-open (stats-less segments
    are scanned), so correctness never depends on it. The append
    commits atomically and touches only the new rows' cluster
    partitions."""
    from formula1_data_pipeline_spark.sources.txn import (
        read_table,
        txn_append,
    )

    t = _tables(index_dir)
    _check_consistent(spark, index_dir)
    new = emb.filter(F.col(id_col).isNotNull())
    bounds = new.agg(
        F.min(F.col(id_col).cast("long")).alias("lo"),
        F.max(F.col(id_col).cast("long")).alias("hi"),
    ).collect()[0]
    if bounds["lo"] is None:
        return 0  # empty batch — nothing to skip or index
    landed_ids = read_table(
        spark, t[_LISTS], prune={"id": (bounds["lo"], bounds["hi"])}
    ).select(F.col("id").cast("long").alias(id_col)).distinct()
    new = new.join(landed_ids, id_col, "left_anti")
    rows = _assign_rows(new, _read_centroids(spark, index_dir),
                        n_assign, id_col, vec_col)
    rows = rows.persist()
    try:
        n = rows.select("id").distinct().count()
        if n:
            txn_append(spark, rows, t[_LISTS], key="cluster",
                       stats_cols=["id"])
        return n
    finally:
        rows.unpersist()


def ivf_index_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``k`` per query from the LANDED index: assign each query
    to its ``n_probe`` closest cells under the landed quantizer, read
    ONLY those cells' list files (the cluster partition filter prunes
    at file level — the txn layer lands one directory per cluster
    key), exact 6-dp cosine within. Output schema matches
    ``similarity.cosine_topk`` / ``ivf_flat_topk``; given the same
    centroids the ranking is row-identical to ``ivf_flat_topk``
    (gate-tested), at index cost: no corpus assignment pass, no
    quantizer work, bytes read ~ n_probe/n_centroids of the lists."""
    from formula1_data_pipeline_spark.sources.txn import read_table

    _check_consistent(spark, index_dir)
    coefs = _read_centroids(spark, index_dir)
    base_q = queries.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    ).withColumn("nrm", norm(F.col("vec")))
    q = _ivf_assign(base_q, coefs, n_probe, "q_")
    probed = [r["cluster"]
              for r in q.select("cluster").distinct().collect()]
    lists = read_table(spark, _tables(index_dir)[_LISTS])
    lists = lists.filter(
        F.col("cluster").cast("int").isin(probed or [-1])
    ).select(
        F.col("cluster").cast("int").alias("cluster"),
        F.col("id").cast("long").alias("n_id"),
        F.col("vec").alias("n_vec"),
        F.col("nrm").alias("n_norm"),
    )
    scored = (
        lists.join(F.broadcast(q), "cluster")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id", "n_id",
            F.round(
                cosine_from_norms(F.col("q_vec"), F.col("n_vec"),
                                  F.col("q_norm"), F.col("n_norm")), 6)
            .alias("cos_sim"),
        )
        .distinct()  # multi-assigned rows can meet a query twice
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("n_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
