"""point_in_interval_join: bounds, bin spanning, null handling."""

import datetime as dt

from formula1_data_pipeline_spark.operators.rangejoin import (
    point_in_interval_join,
)


def _t(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_bounds_inclusive_and_bin_spanning(spark):
    pts = spark.createDataFrame(
        [(1, "k", _t(10)), (2, "k", _t(12)), (3, "k", _t(12, 0, 1)),
         (4, "k", _t(9, 59, 59)), (5, "k", None)],
        "pid: long, key: string, pts_ts: timestamp",
    )
    iv = spark.createDataFrame(
        [(100, "k", _t(10), _t(12)), (200, "k", _t(23), None)],
        "ivid: long, key: string, s: timestamp, e: timestamp",
    )
    got = point_in_interval_join(
        pts, iv, on=["key"], point_ts="pts_ts", start="s", end="e",
        # 1s bins: the 2h interval spans 7201 bins, exercising explode
        bin_seconds=1,
    )
    pairs = {(r["pid"], r["ivid"]) for r in got.collect()}
    # both boundary points included; outside-point, null-ts point, and
    # null-end interval excluded
    assert pairs == {(1, 100), (2, 100)}


def test_multiple_matches_no_dup(spark):
    pts = spark.createDataFrame(
        [(1, "k", _t(11))], "pid: long, key: string, pts_ts: timestamp"
    )
    iv = spark.createDataFrame(
        [(100, "k", _t(10), _t(12)), (200, "k", _t(10, 30), _t(11, 30))],
        "ivid: long, key: string, s: timestamp, e: timestamp",
    )
    got = point_in_interval_join(pts, iv, ["key"], "pts_ts", "s", "e",
                                 bin_seconds=60)
    rows = [(r["pid"], r["ivid"]) for r in got.collect()]
    # overlapping intervals both match, and exactly once each despite
    # spanning many bins
    assert sorted(rows) == [(1, 100), (1, 200)]
