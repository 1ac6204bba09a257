"""Distributed logistic regression — trainer semantics + plan shape.

The trained floats are never value-pinned (q92 rule); what IS pinned:
the trainer separates separable data, the gradient pass is a map-side
partial aggregate (one fused job per iteration), and scoring is a
shuffle-free projection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.classify import (
    predict_proba,
    quality_features,
    train_logreg,
)


def _separable(spark, n=400):
    """y = 1 iff x1 + x2 > 1 (margin ~0.1 kept clear): linearly
    separable, deterministic grid — no RNG."""
    rows = []
    for i in range(n):
        x1 = (i % 20) / 20.0
        x2 = ((i * 7) % 20) / 20.0
        s = x1 + x2
        if abs(s - 1.0) < 0.1:
            continue
        rows.append((i, x1, x2, s > 1.0))
    return spark.createDataFrame(
        rows, "id long, x1 double, x2 double, label boolean"
    )


def test_trains_to_separate_separable_data(spark):
    d = _separable(spark)
    w, b = train_logreg(d, ["x1", "x2"], "label", n_iter=60, lr=5.0)
    acc = d.select(
        ((predict_proba(["x1", "x2"], w, b) >= 0.5) == F.col("label"))
        .cast("double").alias("hit")
    ).agg(F.avg("hit")).collect()[0][0]
    assert acc >= 0.97
    # the separating direction is positive in both features
    assert w[0] > 0 and w[1] > 0


def test_gradient_pass_is_partial_aggregated_single_job(spark):
    d = _separable(spark)
    feats = [F.col(c).cast("double") for c in ("x1", "x2")]
    z = F.lit(0.0)
    for x in feats:
        z = z + F.lit(0.0) * x
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    err = p - F.col("label").cast("double")
    agg = d.agg(F.sum(err * feats[0]).alias("g0"),
                F.sum(err * feats[1]).alias("g1"),
                F.sum(err).alias("gb"),
                F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan or "partial_count" in plan, plan
    assert "Exchange rangepartitioning" not in plan  # no sort anywhere


def test_scoring_is_shuffle_free(spark):
    d = _separable(spark)
    scored = d.select(predict_proba(["x1", "x2"], [1.0, 1.0], -1.0)
                      .alias("p"))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_quality_features_are_bounded_and_nonnull(spark):
    docs = spark.createDataFrame(
        [(0, "the quick brown fox " * 30), (1, "x"), (2, "   ")],
        ["doc_id", "text"],
    )
    cols = quality_features(F.col("text"))
    got = docs.select(*[c.alias(n) for n, c in cols]).collect()
    for r in got:
        for n, _ in cols:
            assert r[n] is not None
            assert 0.0 <= r[n] <= 1.5, (n, r[n])
