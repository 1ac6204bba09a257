"""Landed-id Bloom sidecar for the persisted IVF index (round-12
verdict item #2 — the UNCONDITIONAL append-cost bound): under
non-monotonic (random/UUID-style) ingestion ids the id-range manifest
prune degenerates to a full landed-id scan; the Bloom prefilter makes
a fresh batch skip the landed lists entirely under ANY id
distribution, with exact verification only for the (bounded,
deterministic) hit stream."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.vecindex import (
    ivf_index_append,
    ivf_index_build,
    ivf_index_topk,
)

DIM = 8


def _scrambled(spark, n, offset=0):
    """n vectors with RANDOM-looking 60-bit ids (md5-scrambled
    sequence — the adversarial distribution for range pruning)."""
    return spark.range(offset, offset + n).select(
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15),
               16, 10).cast("long").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: (F.pmod(F.xxhash64(F.col("id") * 31 + i), 97)
                       .cast("double") / 97.0),
        ).alias("embedding"),
    )


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vecbloom") / "idx")
    ivf_index_build(spark, _scrambled(spark, 300), d,
                    n_centroids=4, n_iter=2, id_col="vec_id",
                    vec_col="embedding")
    return d


def test_fresh_random_batch_never_reads_landed_lists(spark, idx,
                                                     monkeypatch):
    """An all-new batch of random ids must MISS the Bloom for every
    id and skip the landed lists read entirely — the flat-append
    contract. (A miss is definite: no false negatives.)"""
    import formula1_data_pipeline_spark.sources.txn as T

    reads = []
    orig = T.read_table

    def spy(spark_, table_, **kw):
        reads.append(table_)
        return orig(spark_, table_, **kw)

    monkeypatch.setattr(T, "read_table", spy)
    # fresh ids, disjoint from the built corpus by construction
    n = ivf_index_append(spark, _scrambled(spark, 50, offset=10_000),
                         idx, id_col="vec_id", vec_col="embedding")
    monkeypatch.undo()
    assert n == 50
    lists_reads = [t for t in reads if t.endswith("/lists")]
    assert lists_reads == [], (
        "fresh random-id batch read the landed lists — the Bloom "
        f"skip regressed (reads: {reads})")


def test_redelivered_random_batch_skipped_exactly(spark, idx):
    """Re-delivery under random ids: every id HITS the Bloom, the
    exact verify confirms them landed, zero rows re-indexed — and
    the queryable state equals one-shot indexing of the union."""
    batch = _scrambled(spark, 40, offset=20_000)
    assert ivf_index_append(spark, batch, idx,
                            id_col="vec_id", vec_col="embedding") == 40
    # exact re-delivery must be a no-op
    assert ivf_index_append(spark, batch, idx,
                            id_col="vec_id", vec_col="embedding") == 0
    # partial overlap: only the novel half lands
    half_new = _scrambled(spark, 40, offset=20_020)  # 20 old + 20 new
    assert ivf_index_append(spark, half_new, idx,
                            id_col="vec_id", vec_col="embedding") == 20


def test_index_still_queryable_and_exact_after_bloom_appends(spark,
                                                             idx):
    queries = _scrambled(spark, 3)
    out = ivf_index_topk(spark, idx, queries, k=3, n_probe=2,
                         id_col="vec_id", vec_col="embedding")
    rows = out.collect()
    assert len(rows) == 9
    assert all(r["rank"] in (1, 2, 3) for r in rows)


def test_legacy_index_without_sidecar_falls_back(spark, tmp_path):
    """An index built before the sidecar (simulated by removing the
    idbloom table) must keep appending correctly via the
    batch-range-pruned anti-join — fail-open."""
    import shutil

    d = str(tmp_path / "idx")
    base = _scrambled(spark, 100)
    ivf_index_build(spark, base, d, n_centroids=4, n_iter=2,
                    id_col="vec_id", vec_col="embedding")
    shutil.rmtree(f"{d}/idbloom")
    batch = _scrambled(spark, 30, offset=5_000)
    assert ivf_index_append(spark, batch, d,
                            id_col="vec_id", vec_col="embedding") == 30
    assert ivf_index_append(spark, batch, d,
                            id_col="vec_id", vec_col="embedding") == 0


def test_crashed_sidecar_fold_healed_before_append(spark, tmp_path,
                                                   monkeypatch):
    """Round-12 ADVICE (medium, vecindex.py:170): a sidecar fold that
    crashed between its overwrite's publish and its late-preservation
    append leaves a landed batch's bloom words only in the superseded
    version — reading the sidecar as-is would produce a FALSE
    NEGATIVE ("definitely new") and a re-delivered batch would
    double-insert into the lists. `_landed_id_bloom` now heals from
    the pending-late marker before any read, so the re-delivery is
    skipped in full."""
    import formula1_data_pipeline_spark.operators.vecindex as V
    import formula1_data_pipeline_spark.sources.txn as T
    from formula1_data_pipeline_spark.operators import retrieval as R

    d = str(tmp_path / "idx")
    ivf_index_build(spark, _scrambled(spark, 200), d,
                    n_centroids=4, n_iter=2, id_col="vec_id",
                    vec_col="embedding")
    batch = _scrambled(spark, 40, offset=10_000)
    assert ivf_index_append(spark, batch, d, id_col="vec_id",
                            vec_col="embedding") == 40

    sidecar = V._tables(d)[V._IDBLOOM]
    attempts = {r["attempt"] for r in
                T.read_table(spark, sidecar)
                .select("attempt").distinct().collect()}
    batch_attempt = next(a for a in attempts
                         if not a.startswith("build-"))
    known = sorted(attempts - {batch_attempt})

    # simulate the crashed fold: publish a fold of only the KNOWN
    # attempts, crash before the late-preservation append — the
    # batch's words survive only in the superseded version
    snap = (T.read_table(spark, sidecar)
            .filter(F.col("attempt").isin(known)))
    folded = (snap.groupBy("word_idx")
              .agg(F.bit_or("bits").alias("bits"),
                   F.first("n_bits").alias("n_bits"))
              .select("word_idx", "bits", "n_bits",
                      F.lit("foldcrash").alias("attempt")))
    orig_append = T.txn_append

    def crash(*a, **kw):
        raise RuntimeError("injected crash before late append")

    monkeypatch.setattr(T, "txn_append", crash)
    with pytest.raises(RuntimeError):
        R._overwrite_preserving_late(spark, folded, sidecar,
                                     known + ["foldcrash"])
    monkeypatch.setattr(T, "txn_append", orig_append)
    import os

    assert os.path.exists(R._pending_late_path(sidecar))

    # re-delivery of the crashed-away batch: the heal must restore
    # its bloom words, so every id is recognized as landed
    assert ivf_index_append(spark, batch, d, id_col="vec_id",
                            vec_col="embedding") == 0
    assert not os.path.exists(R._pending_late_path(sidecar))
    n_rows = (T.read_table(spark, V._tables(d)[V._LISTS])
              .join(batch.select(F.col("vec_id").alias("id")), "id")
              .count())
    assert n_rows == 40  # n_assign=1 — no double-insert


def test_heal_skipped_while_fold_holds_lease(spark, tmp_path):
    """Round-13 ADVICE (medium): the sidecar heal in
    `_landed_id_bloom` runs UNDER the compaction lease now — while a
    live fold holds it (having just written its pre-publish marker),
    a concurrent reader must NOT recover-and-clear the marker, or a
    fold crash between publish and late append becomes unrecoverable.
    Contended lease => heal skipped, marker untouched, read proceeds
    on the live sidecar."""
    import os

    import formula1_data_pipeline_spark.operators.vecindex as V
    from formula1_data_pipeline_spark.operators import retrieval as R

    d = str(tmp_path / "idx")
    ivf_index_build(spark, _scrambled(spark, 100), d,
                    n_centroids=4, n_iter=2, id_col="vec_id",
                    vec_col="embedding")
    sidecar = V._tables(d)[V._IDBLOOM]
    # a "live fold": lease held, pre-publish marker on disk
    lease = R.acquire_compaction_lease(sidecar)
    assert lease is not None
    R._write_pending_late(sidecar, 1, ["whatever"])
    try:
        words, n_bits = V._landed_id_bloom(spark, sidecar)
        assert words is not None and n_bits > 0
        # the reader did not steal the heal: marker survives
        assert os.path.exists(R._pending_late_path(sidecar))
    finally:
        R.release_compaction_lease(lease)
    # once the lease is free, the next reader MAY heal; a marker
    # naming the still-live version is a no-op that stays in place
    # (recover_pending_late's version guard — the second defense)
    V._landed_id_bloom(spark, sidecar)
    assert os.path.exists(R._pending_late_path(sidecar))


def test_non_integral_id_raises_loudly(spark, tmp_path):
    """Round-12 ADVICE (vecindex.py:427): the landed-id skip compares
    ids AS BIGINT — a string id would cast to NULL and silently
    disable re-delivery skipping. Both entry points refuse
    non-integral id columns with a mapping hint instead."""
    d = str(tmp_path / "idx")
    string_ids = _scrambled(spark, 10).withColumn(
        "vec_id", F.concat(F.lit("doc-"), F.col("vec_id")))
    with pytest.raises(TypeError, match="integral"):
        ivf_index_build(spark, string_ids, d, n_centroids=2,
                        n_iter=1, id_col="vec_id",
                        vec_col="embedding")
    ivf_index_build(spark, _scrambled(spark, 50), d, n_centroids=2,
                    n_iter=1, id_col="vec_id", vec_col="embedding")
    with pytest.raises(TypeError, match="integral"):
        ivf_index_append(spark, string_ids, d, id_col="vec_id",
                         vec_col="embedding")
