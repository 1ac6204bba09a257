"""Temporal split with embargo + entity-straddle leakage report
(operators/sampling.py) — boundary exactness, embargo band labeling,
exact-quantile cutoff derivation, and the report's arithmetic."""
from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.sampling import (
    temporal_leakage_report,
    temporal_split,
)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds):
    return T0 + datetime.timedelta(seconds=seconds)


@pytest.fixture(scope="module")
def events(spark):
    rows = [(i, f"u{i % 5}", _ts(i * 10)) for i in range(100)]
    rows.append((1000, "u0", None))
    return spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp").cache()


def test_explicit_cutoff_boundaries_exact(spark, events):
    cut = _ts(500)  # event 50 lands exactly ON the cutoff -> train
    out = {r["event_id"]: r["split"]
           for r in temporal_split(events, "ts", cutoff=cut,
                                   embargo_seconds=100).collect()}
    assert out[50] == "train"          # inclusive boundary
    assert out[51] == "embargo"        # 510 <= 500+100
    assert out[60] == "embargo"        # 600 == 500+100, inclusive
    assert out[61] == "test"           # 610 > 600
    assert out[0] == "train" and out[99] == "test"
    assert out[1000] is None           # NULL ts: no position


def test_derived_cutoff_is_exact_type1_quantile(spark, events):
    # 100 non-null ts, train_frac 0.8 -> rank ceil(80) = 80th value
    # ascending = ts of event 79
    out = temporal_split(events, "ts", train_frac=0.8)
    n_train = out.filter(F.col("split") == "train").count()
    assert n_train == 80
    mx = out.filter(F.col("split") == "train").agg(
        F.max("event_id")).collect()[0][0]
    assert mx == 79


def test_embargo_rows_labeled_not_dropped(spark, events):
    out = temporal_split(events, "ts", cutoff=_ts(500),
                         embargo_seconds=200)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # every input row appears exactly once across the labels
    assert counts["train"] + counts["embargo"] + counts["test"] == 100
    assert counts["embargo"] == 20  # 510..700 inclusive = events 51..70


def test_leakage_report_counts(spark, events):
    # users are round-robin over event ids, so every user straddles
    split = temporal_split(events, "ts", cutoff=_ts(500))
    [r] = temporal_leakage_report(split, "user_id").collect()
    assert r["n_entities"] == 5
    assert r["n_straddling"] == 5
    assert r["straddle_fraction"] == 1.0
    # a user whose events all precede the cutoff is train-only
    extra = spark.createDataFrame(
        [(2000, "u_new", _ts(5))],
        "event_id long, user_id string, ts timestamp")
    split2 = temporal_split(events.unionByName(extra), "ts",
                            cutoff=_ts(500))
    [r2] = temporal_leakage_report(split2, "user_id").collect()
    assert r2["n_entities"] == 6 and r2["n_train_only"] == 1
    assert r2["straddle_fraction"] == round(5 / 6, 6)


def test_bad_train_frac_raises(spark, events):
    with pytest.raises(ValueError, match="train_frac"):
        temporal_split(events, "ts", train_frac=1.0)


def test_leakage_report_empty_split_reports_zero(spark):
    """Review regression: an all-embargo split divided 0/0 and
    returned NULL straddle_fraction; it must report a clean 0.0."""
    df = spark.createDataFrame(
        [(1, "u1", _ts(100)), (2, "u2", _ts(200)), (3, "u3", None)],
        "event_id long, user_id string, ts timestamp",
    )
    split = temporal_split(df, "ts", cutoff=_ts(0),
                           embargo_seconds=10_000)
    [r] = temporal_leakage_report(split, "user_id").collect()
    assert r["n_entities"] == 0
    assert r["straddle_fraction"] == 0.0
