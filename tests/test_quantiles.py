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
