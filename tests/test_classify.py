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


def _train_logreg_expr_twin(df, feature_cols, label_col, n_iter, lr):
    """The pre-r14 expression-API gradient pass, kept verbatim as the
    bit-equality reference for the SQL-string pass that replaced it
    (r14 optimization: iteration-invariant codegen source + one-parse
    plan construction). Same multiplies, same left-fold add order —
    the weights must match the production trainer EXACTLY."""
    df = df.na.drop(subset=[*feature_cols, label_col])
    feats = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    w = [0.0] * len(feature_cols)
    b = 0.0
    nf = len(feats)
    for _ in range(n_iter):
        z = F.lit(b)
        for wi, x in zip(w, feats):
            z = z + F.lit(wi) * x
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - y
        base = df.select(
            F.explode(F.array(err)).alias("_e"),
            *[x.alias(f"_x{j}") for j, x in enumerate(feats)],
        )
        aggs = [F.sum(F.col("_e") * F.col(f"_x{j}")).alias(f"g{j}")
                for j in range(nf)]
        aggs.append(F.sum("_e").alias("gb"))
        aggs.append(F.count(F.lit(1)).alias("n"))
        row = base.agg(*aggs).collect()[0]
        n = max(int(row["n"]), 1)
        w = [wi - lr * float(row[f"g{j}"] or 0.0) / n
             for j, wi in enumerate(w)]
        b = b - lr * float(row["gb"] or 0.0) / n
    return w, b


def test_sql_pass_weights_bit_identical_to_expression_twin(spark):
    d = _separable(spark)
    # add a feature whose weight passes through awkward float reprs
    d = d.withColumn("x3", (F.col("x1") * 17.0 + 0.003) / 23.0)
    cols = ["x1", "x2", "x3"]
    w_sql, b_sql = train_logreg(d, cols, "label", n_iter=7, lr=5.0)
    w_ref, b_ref = _train_logreg_expr_twin(d, cols, "label", 7, 5.0)
    assert w_sql == w_ref and b_sql == b_ref


def test_trainer_drops_temp_view(spark):
    d = _separable(spark)
    before = {t.name for t in spark.catalog.listTables()}
    train_logreg(d, ["x1", "x2"], "label", n_iter=1, lr=1.0)
    assert {t.name for t in spark.catalog.listTables()} == before


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
