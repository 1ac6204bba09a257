"""grouped_quantiles (operators/quality.py) vs a sorted-list Python
reference of the type-1 (ceil-rank) definition."""

import math

import pytest
from hypothesis import given, settings, strategies as st

from formula1_data_pipeline_spark.operators.quality import grouped_quantiles

_SETTINGS = dict(max_examples=8, deadline=None)
_PROBS = [0.25, 0.5, 0.75, 0.95, 0.99]


def _ref(vals, p):
    s = sorted(vals)
    return s[math.ceil(p * len(s)) - 1]


@settings(**_SETTINGS)
@given(data=st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        # duplicates on purpose: rank math must step over count mass
        st.integers(min_value=-5, max_value=5).map(float),
    ),
    min_size=1, max_size=40,
))
def test_matches_sorted_list_reference(spark, data):
    df = spark.createDataFrame(data, "g string, v double")
    got = {
        r.g: (r.p25, r.p50, r.p75, r.p95, r.p99)
        for r in grouped_quantiles(df, "v", ["g"], _PROBS).collect()
    }
    groups = {}
    for g, v in data:
        groups.setdefault(g, []).append(v)
    exp = {
        g: tuple(_ref(vs, p) for p in _PROBS) for g, vs in groups.items()
    }
    assert got == exp


def test_nulls_excluded_and_all_null_group_dropped(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)],
        "g string, v double",
    )
    rows = grouped_quantiles(df, "v", ["g"], [0.5]).collect()
    assert {r.g: r.p50 for r in rows} == {"a": 1.0}


def test_prob_validation(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="non-empty"):
        grouped_quantiles(df, "v", ["g"], [])
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        grouped_quantiles(df, "v", ["g"], [0.0])
    with pytest.raises(ValueError, match="collide"):
        grouped_quantiles(df, "v", ["g"], [0.5, 0.504])


def test_p100_is_group_max(spark):
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(10)], "g string, v double"
    )
    r = grouped_quantiles(df, "v", ["g"], [1.0]).collect()[0]
    assert r.p100 == 9.0


def test_float_hostile_prob_rank_is_exact(spark):
    """ceil(0.07 * 100) must be 7, not 8: plain double math gives
    7.000000000000001 and overshoots the documented type-1 rank; the
    operator computes the rank in DECIMAL (regression for the
    round-10 review finding)."""
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 101)], "g string, v double"
    )
    r = grouped_quantiles(df, "v", ["g"], [0.07]).collect()[0]
    assert r.p7 == 7.0  # the 7th-ranked value, not the 8th


# --------------------------------------------------------------------
# Mergeable quantile histogram (quality.quantile_histogram /
# histogram_quantiles) — the grouped_quantiles scale seam closed:
# bounded per-group state, deterministic integer buckets, DDSketch
# relative-error bound.

from pyspark.sql import functions as F


def _hist_mod():
    from formula1_data_pipeline_spark.operators import quality as Q
    return Q


def test_histogram_relative_error_bound(spark):
    import random

    Q = _hist_mod()
    rnd = random.Random(7)
    rows = [("g", rnd.lognormvariate(2, 3) - 50.0) for _ in range(4000)]
    df = spark.createDataFrame(rows, "g string, v double")
    probs = [0.25, 0.5, 0.75, 0.95, 0.99]
    hist = Q.quantile_histogram(df, "v", ["g"], scale=6)
    [approx] = Q.histogram_quantiles(hist, ["g"], probs).collect()
    [exact] = Q.grouped_quantiles(
        df.select("g", F.round(F.col("v") * 1e6, 0).cast("long")
                  .alias("vs")), "vs", ["g"], probs).collect()
    for p in probs:
        a = approx[f"p{round(p * 100)}_approx"]
        e = exact[f"p{round(p * 100)}"]
        if abs(e) >= (1 << Q.HIST_SUB_BITS):
            assert abs(a) <= abs(e)
            assert abs(a - e) <= abs(e) / (1 << Q.HIST_SUB_BITS) + 1
        else:
            assert a == e  # singleton buckets below 2^sub_bits


def test_histogram_state_is_bounded_and_merges(spark):
    Q = _hist_mod()
    rows = [("g", float(i) / 7.0) for i in range(1, 20001)]
    df = spark.createDataFrame(rows, "g string, v double")
    hist = Q.quantile_histogram(df, "v", ["g"])
    n_buckets = hist.count()
    assert n_buckets <= 2 * 63 * (1 << Q.HIST_SUB_BITS) + 1
    assert n_buckets < 20000  # collapsed far below distinct values
    # merge: two halves' histograms sum to the one-shot
    a = Q.quantile_histogram(df.filter(F.col("v") < 1000), "v", ["g"])
    b = Q.quantile_histogram(df.filter(F.col("v") >= 1000), "v", ["g"])
    merged = {
        (r["cls"], r["msb"], r["sub"]): r["cnt"]
        for r in a.unionByName(b)
        .groupBy("g", "cls", "msb", "sub", "v_rep_scaled")
        .agg(F.sum("cnt").alias("cnt")).collect()
    }
    oneshot = {(r["cls"], r["msb"], r["sub"]): r["cnt"]
               for r in hist.collect()}
    assert merged == oneshot


def test_histogram_exact_small_magnitudes_and_signs(spark):
    Q = _hist_mod()
    # scale=0: values ARE the scaled ints; everything below 8 exact
    rows = [("g", float(v)) for v in
            [-5, -1, 0, 0, 1, 2, 3, 3, 7, -7]]
    df = spark.createDataFrame(rows, "g string, v double")
    hist = Q.quantile_histogram(df, "v", ["g"], scale=0)
    reps = {r["v_rep_scaled"]: r["cnt"] for r in hist.collect()}
    assert reps == {-7: 1, -5: 1, -1: 1, 0: 2, 1: 1, 2: 1, 3: 2, 7: 1}
    [q] = Q.histogram_quantiles(hist, ["g"], [0.5]).collect()
    # rank ceil(0.5*10)=5 ascending: -7,-5,-1,0,0 -> 0
    assert q["p50_approx"] == 0


def test_histogram_partitioning_invariance(spark):
    Q = _hist_mod()
    rows = [("a" if i % 3 else "b", float(i * i) % 997 - 400)
            for i in range(1, 3000)]
    df = spark.createDataFrame(rows, "g string, v double")
    one = {(r["g"], r["cls"], r["msb"], r["sub"]): r["cnt"]
           for r in Q.quantile_histogram(df, "v", ["g"]).collect()}
    rep = {(r["g"], r["cls"], r["msb"], r["sub"]): r["cnt"]
           for r in Q.quantile_histogram(
               df.repartition(11), "v", ["g"]).collect()}
    assert one == rep


def test_histogram_huge_magnitude_raises_loudly(spark):
    """Review regression: |value|*10^scale past 2^62 used to SATURATE
    the long cast silently in Spark (and error in DuckDB — a gate
    divergence); the guard must name it."""
    Q = _hist_mod()
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 1.0e13)], "g string, v double")
    with pytest.raises(Exception, match="2\\^62"):
        Q.quantile_histogram(df, "v", ["g"], scale=6).collect()
    # and the documented fix works: lower scale
    ok = Q.quantile_histogram(df, "v", ["g"], scale=0).count()
    assert ok == 2
