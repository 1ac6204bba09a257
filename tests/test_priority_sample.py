"""Priority sampling (operators/sampling.py::priority_sample, the
Duffield-Lund-Thorup weighted bottom-k) — Python-reference equality
of selection and threshold, reservoir mergeability, estimator
behavior, edge weights, and the TakeOrderedAndProject plan shape."""
from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.sampling import (
    priority_sample,
)

SALT = "priosample-v1"


def _h60(key, salt=SALT) -> int:
    return int(
        hashlib.md5(f"{key}|{salt}".encode()).hexdigest()[:15], 16)


def _ref(rows, k):
    """Literal reference: race key r = float(h+1) / w (one IEEE
    division — bit-identical to the engine on the same operands),
    bottom-k with id tie-break, tau = the (k+1)-th row's
    w * 2^60 / (h+1) in the same association order as the operator,
    0.0 when fewer than k+1 racers."""
    race = sorted(
        ((_h60(i) + 1) / float(w), i, float(w))
        for i, w in rows if w and w > 0
    )
    sel = race[:k]
    if len(race) > k:
        _, i1, w1 = race[k]
        tau = w1 * float(1 << 60) / float(_h60(i1) + 1)
    else:
        tau = 0.0
    return (
        {i: rank + 1 for rank, (_, i, _) in enumerate(sel)},
        tau,
    )


@pytest.fixture(scope="module")
def weighted(spark):
    rows = [(i, float((i * 13) % 37) + 0.5 + (400.0 if i == 7 else 0.0))
            for i in range(1, 81)]
    return rows, spark.createDataFrame(
        rows, "doc_id long, wgt double").cache()


def test_matches_reference(spark, weighted):
    rows, df = weighted
    out = priority_sample(df, F.col("wgt"), 12).collect()
    ranks, tau = _ref(rows, 12)
    assert {r.doc_id: r.prio_rank for r in out} == ranks
    assert all(r.tau == tau for r in out)
    assert all(r.ht_weight == max(r.w, tau) for r in out)


def test_partitioning_invariance(spark, weighted):
    rows, df = weighted
    base = {(r.doc_id, r.prio_rank, r.tau, r.ht_weight)
            for r in priority_sample(df, F.col("wgt"), 10).collect()}
    for n in (1, 7):
        got = {(r.doc_id, r.prio_rank, r.tau, r.ht_weight)
               for r in priority_sample(
                   df.repartition(n), F.col("wgt"), 10).collect()}
        assert got == base, n


def test_reservoir_merge_equals_oneshot(spark, weighted):
    """Bottom-k of a union == bottom-k of the parts' bottom-k's:
    per-shard reservoirs merge without re-reading shard data, and
    the re-selection reproduces the one-shot tau exactly."""
    rows, df = weighted
    a = df.filter(F.col("doc_id") % 2 == 0)
    b = df.filter(F.col("doc_id") % 2 == 1)
    k = 15
    res = priority_sample(a, F.col("wgt"), k + 1).select(
        "doc_id", "wgt").unionByName(
        priority_sample(b, F.col("wgt"), k + 1).select("doc_id", "wgt"))
    merged = priority_sample(res, F.col("wgt"), k).collect()
    one = priority_sample(df, F.col("wgt"), k).collect()
    assert {(r.doc_id, r.prio_rank, r.tau) for r in merged} \
        == {(r.doc_id, r.prio_rank, r.tau) for r in one}


def test_population_smaller_than_k(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, 5.0), (3, 1.0)], "doc_id long, wgt double")
    out = priority_sample(df, F.col("wgt"), 10).collect()
    assert len(out) == 3
    assert all(r.tau == 0.0 and r.ht_weight == r.w for r in out)
    # sample == population -> the subset-sum estimate is exact
    assert sum(r.ht_weight for r in out) == 8.0


def test_zero_and_null_weights_never_sampled(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, None), (3, 4.0), (4, 1.0)],
        "doc_id long, wgt double")
    out = priority_sample(df, F.col("wgt"), 4).collect()
    assert sorted(r.doc_id for r in out) == [3, 4]


def test_negative_weight_raises(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, -1.0)], "doc_id long, wgt double")
    with pytest.raises(Exception, match="negative weight"):
        priority_sample(df, F.col("wgt"), 1).collect()


def test_bad_k_raises(spark, weighted):
    _, df = weighted
    with pytest.raises(ValueError, match="k must be positive"):
        priority_sample(df, F.col("wgt"), 0)


def test_estimator_tracks_total(spark):
    """Horvitz-Thompson subset-sum estimate lands near the true
    total at a moderate k (DLT unbiasedness, loose bound — one
    deterministic draw, not a distributional claim)."""
    rows = [(i, float((i * 29) % 101) + 1.0) for i in range(1, 501)]
    df = spark.createDataFrame(rows, "doc_id long, wgt double")
    total = sum(w for _, w in rows)
    out = priority_sample(df, F.col("wgt"), 100).collect()
    est = sum(r.ht_weight for r in out)
    assert 0.75 * total <= est <= 1.25 * total, (est, total)


def test_plan_is_take_ordered_no_global_sort(spark, weighted):
    """The global bottom-(k+1) must compile to TakeOrderedAndProject
    (per-partition heap + driver merge) — never a global Sort with a
    single-partition Exchange over the corpus."""
    _, df = weighted
    plan = priority_sample(
        df, F.col("wgt"), 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan.replace(
        "TakeOrderedAndProject", "")  # no standalone global sort
