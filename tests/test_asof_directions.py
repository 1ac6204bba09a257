"""asof_join_directional: direction semantics, tolerance, null guards."""

import datetime as dt

import pyspark.sql.functions as F

from formula1_data_pipeline_spark.operators.asof import (
    asof_join_directional,
    asof_join_sorted,
)


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "k", _t(10)), (2, "k", _t(12)), (3, "k", None), (4, "x", _t(9))],
        "lid: long, key: string, lts: timestamp",
    )
    right = spark.createDataFrame(
        [("k", _t(9), 90.0), ("k", _t(11), 110.0), ("k", _t(14), 140.0),
         ("k", None, -1.0)],
        "key: string, rts: timestamp, rval: double",
    )
    return left, right


def _run(spark, direction, tolerance=None):
    left, right = _frames(spark)
    got = asof_join_directional(
        left, right, on=["key"], left_ts="lts", right_ts="rts",
        payload=["rval"], direction=direction, tolerance=tolerance,
    )
    return {r["lid"]: (r["rts_asof"], r["rval"]) for r in got.collect()}


def test_backward_matches_sorted_strategy(spark):
    left, right = _frames(spark)
    a = asof_join_directional(left, right, ["key"], "lts", "rts", ["rval"],
                              direction="backward")
    b = asof_join_sorted(left, right, ["key"], "lts", "rts", ["rval"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_backward(spark):
    got = _run(spark, "backward")
    assert got[1] == (_t(9), 90.0)     # latest at-or-before 10:00
    assert got[2] == (_t(11), 110.0)
    assert got[3] == (None, None)      # null left ts matches nothing
    assert got[4] == (None, None)      # no right rows for key x


def test_forward(spark):
    got = _run(spark, "forward")
    assert got[1] == (_t(11), 110.0)   # earliest at-or-after 10:00
    assert got[2] == (_t(14), 140.0)
    assert got[3] == (None, None)
    assert got[4] == (None, None)


def test_nearest_prefers_closer_then_backward(spark):
    got = _run(spark, "nearest")
    assert got[1] == (_t(9), 90.0)     # 9:00 is 1h away, 11:00 is 1h: tie -> backward
    assert got[2] == (_t(11), 110.0)   # 1h back vs 2h fwd
    assert got[3] == (None, None)


def test_tolerance_masks_far_matches(spark):
    got = _run(spark, "backward", tolerance=F.expr("INTERVAL 30 MINUTES"))
    assert got[1] == (None, None)      # 9:00 is 1h before 10:00 -> out
    got = _run(spark, "forward", tolerance=F.expr("INTERVAL 90 MINUTES"))
    assert got[1] == (_t(11), 110.0)   # 1h ahead, inside 90m
    assert got[2] == (None, None)      # 14:00 is 2h ahead -> out


def test_exact_match_included_both_directions(spark):
    left, right = _frames(spark)
    left2 = left.withColumn("lts", F.lit(_t(11)).cast("timestamp"))
    for direction in ("backward", "forward", "nearest"):
        got = asof_join_directional(
            left2, right, ["key"], "lts", "rts", ["rval"],
            direction=direction,
        )
        vals = {r["lid"]: r["rval"] for r in got.collect() if r["key"] == "k"}
        assert all(v == 110.0 for v in vals.values()), (direction, vals)


def test_sorted_path_under_heavy_key_skew(spark):
    """VERDICT r3 item 6: one hot key holding ~50% of both sides — the
    skew 100x data will have. The single-shuffle union-sort path must
    (a) keep its one-Exchange plan, (b) finish in sane wall time, and
    (c) agree row-for-row with the reference join+rank shape."""
    import time

    n_left, n_right = 40_000, 20_000
    # ~50% of rows land on key 'hot'; the rest spread over 100 keys
    key = F.when(F.col("id") % 2 == 0, F.lit("hot")).otherwise(
        F.concat(F.lit("k"), (F.col("id") % 100).cast("string"))
    )
    ts = F.timestamp_micros((F.col("id") * 37 % 1_000_003) * 1_000_000)
    left = spark.range(n_left).select(
        F.col("id").alias("lid"), key.alias("key"), ts.alias("lts")
    )
    right = spark.range(n_right).select(
        key.alias("key"),
        F.timestamp_micros((F.col("id") * 91 % 999_983) * 1_000_000)
        .alias("rts"),
        (F.col("id").cast("double") / 7).alias("rval"),
    )

    sorted_df = asof_join_sorted(
        left, right, on=["key"], left_ts="lts", right_ts="rts",
        payload=["rval"],
    )
    # (a) plan: exactly one Exchange — the window's hash partitioning
    # on the equi key; skew must not tempt a second shuffle in
    plan = sorted_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    # (b) wall time: linear union-sort over 60k rows, generous cap
    t0 = time.monotonic()
    got = sorted_df.collect()
    elapsed = time.monotonic() - t0
    assert elapsed < 30, f"skewed as-of took {elapsed:.1f}s"
    assert len(got) == n_left

    from formula1_data_pipeline_spark.operators.asof import (
        asof_join_reference,
    )

    ref = asof_join_reference(
        left, right, on=["key"], left_ts="lts", right_ts="rts",
        payload=["rval"], right_tiebreak=["rval"],
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))
