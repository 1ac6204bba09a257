"""Distributed logistic-regression training — a trained quality
classifier for corpus filtering.

Production pretraining pipelines filter with a TRAINED quality model
(a fastText/logistic classifier fit to exemplar labels), not only
hand-written heuristics: the heuristic (q25) bootstraps labels, the
classifier generalizes them. This module trains the classifier the
same way every iterative trainer in this repo works (the Lloyd /
BPE-trainer shape): model state lives on the driver (n_features + 1
doubles — a bounded scalar), and each iteration is ONE map-side
partial-aggregated pass over the corpus computing the full-batch
gradient — no per-row Python, no MLlib dependency, plan depth
constant per iteration (the weight vector enters the plan as
literals, so each pass is a fresh shallow aggregate).

Gradient math: batch gradient descent on log-loss —
``grad_j = sum_i (sigmoid(w.x_i + b) - y_i) * x_ij`` — all computed
as codegen'd column expressions (one fused aggregate emits every
gradient component plus the loss count in a single job).

Determinism: float partial sums depend on partitioning order, so a
trained model is gated with BOUNDS (holdout accuracy floors, q92
rule), never value-hashed. Deterministic train/test membership comes
from the repo's md5 hash split (``sampling.hash_bucket``), so the
evaluation set is engine-reproducible even though the weights are
not bit-pinned.

Reference parity note: /root/reference has no ML surface; this is
part of the SURVEY §2.12 training-data-pipeline mandate (quality
scoring, trained tier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iter: int = 30,
    lr: float = 1.0,
) -> tuple[list[float], float]:
    """Full-batch gradient-descent logistic regression over
    ``feature_cols`` (numeric, ideally ~[0, 1] scaled) against the
    boolean/0-1 ``label_col``. Returns (weights, bias).

    One aggregation pass per iteration: the current weights are
    baked in as literals, sigmoid + per-feature gradient terms run
    JVM-side, and one job returns n_features + 2 doubles to the
    driver. ``n_iter`` is a fixed bound, not a convergence loop
    (the Lloyd rule: iteration count is a plan-visible constant).

    PRECONDITION: every row must have non-NULL features and label.
    ``sum()`` skips NULL terms while ``n`` counts every row, so a
    NULL feature/label silently shrinks the effective gradient
    instead of erroring (round-8 ADVICE). Callers own the filter
    (q99 derives features from non-null text, so none arise there);
    the in-trainer ``isNotNull`` guard lands with q99's next re-gate
    — adding a Filter node mid-round would change a gated plan
    outside the gate budget."""
    feats = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    w = [0.0] * len(feature_cols)
    b = 0.0
    for _ in range(n_iter):
        z = F.lit(b)
        for wi, x in zip(w, feats):
            z = z + F.lit(wi) * x
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - y
        aggs = [F.sum(err * x).alias(f"g{j}")
                for j, x in enumerate(feats)]
        aggs.append(F.sum(err).alias("gb"))
        aggs.append(F.count(F.lit(1)).alias("n"))
        row = df.agg(*aggs).collect()[0]
        # sum() over zero rows is NULL — an empty training frame
        # (e.g. a split bucket that landed no docs) degrades to a
        # zero gradient, not a float(None) TypeError
        n = max(int(row["n"]), 1)
        w = [wi - lr * float(row[f"g{j}"] or 0.0) / n
             for j, wi in enumerate(w)]
        b = b - lr * float(row["gb"] or 0.0) / n
    return w, b


def predict_proba(feature_cols: list[str], w: list[float],
                  b: float) -> Column:
    """The trained model as a codegen'd column expression — apply to
    any frame carrying the feature columns (scoring a 100 TB corpus
    is one narrow map-side projection, no shuffle)."""
    z = F.lit(b)
    for wi, c in zip(w, feature_cols):
        z = z + F.lit(wi) * F.col(c).cast("double")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def quality_features(text: Column) -> list[tuple[str, Column]]:
    """The q25 heuristic's components as separate model features
    (each already ~[0, 1]): distinct-token ratio, capped length
    ratio, in-range char length flag, plus mean token length / 10 —
    a feature the heuristic does NOT use, so the classifier has
    headroom beyond replaying the label rule."""
    from formula1_data_pipeline_spark.operators.dedup import tokens

    toks = tokens(text)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    return [
        ("f_distinct", F.when(n > 0, nd.cast("double") / n)
         .otherwise(F.lit(0.0))),
        ("f_len", F.least(F.lit(1.0), n.cast("double") / 100.0)),
        ("f_range", F.when((F.length(text) >= 50)
                           & (F.length(text) <= 5000), 1.0)
         .otherwise(0.0)),
        ("f_toklen", F.when(
            n > 0,
            F.length(F.concat_ws("", toks)).cast("double") / n / 10.0,
        ).otherwise(F.lit(0.0))),
    ]
