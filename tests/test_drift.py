"""Two-snapshot distribution drift (`operators/quality.py` round-9
additions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.quality import (
    drift_report,
    drift_summary,
    value_counts_long,
)


def test_value_counts_long_one_pass_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", 2), (None, 2)],
        "x string, y int",
    )
    got = {(r["column"], r["value"]): r["cnt"]
           for r in value_counts_long(df, ["x", "y"]).collect()}
    assert got == {
        ("x", "a"): 2, ("x", "b"): 1, ("x", None): 1,
        ("y", "1"): 1, ("y", "2"): 2, ("y", None): 1,
    }
    # one exchange: single groupBy over the exploded pairs
    plan = value_counts_long(df, ["x", "y"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_drift_report_and_summary_exact(spark):
    old = spark.createDataFrame(
        [("en",)] * 6 + [("fr",)] * 4, "lang string")
    new = spark.createDataFrame(
        [("en",)] * 2 + [("fr",)] * 2 + [("de",)] * 4, "lang string")
    rep = {r["value"]: (r["cnt_old"], r["cnt_new"], r["share_old"],
                        r["share_new"], r["abs_delta"])
           for r in drift_report(old, new, ["lang"]).collect()}
    assert rep["en"] == (6, 2, 0.6, 0.25, 0.35)
    assert rep["fr"] == (4, 2, 0.4, 0.25, 0.15)
    # de exists only in the new snapshot: zero-count bucket survives
    assert rep["de"] == (0, 4, 0.0, 0.5, 0.5)
    s = drift_summary(drift_report(old, new, ["lang"])).collect()[0]
    assert s["column"] == "lang" and s["n_values"] == 3
    assert s["tv_distance"] == 0.5  # (0.35+0.15+0.5)/2
    # identical snapshots -> zero drift
    z = drift_summary(drift_report(old, old, ["lang"])).collect()[0]
    assert z["tv_distance"] == 0.0


def test_drift_oracle_parity(spark):
    """The intended gate shape (rides q79's due re-gate): snapshots
    = deterministic doc_id halves of documents; drift over lang and
    source replays exactly in DuckDB."""
    import duckdb

    from formula1_data_pipeline_spark.queries import load

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")["documents"]
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    got = sorted(
        tuple(r) for r in
        drift_report(old, new, ["lang", "source"]).collect()
    )
    got_sum = sorted(
        tuple(r) for r in drift_summary(
            drift_report(old, new, ["lang", "source"])).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    n1, n2 = old.count(), new.count()
    oracle = f"""
    WITH o AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
    n AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
    oc AS (
        SELECT "column", value, count(*) AS cnt_old FROM (
            SELECT 'lang' AS "column", CAST(lang AS VARCHAR) AS value
            FROM o
            UNION ALL
            SELECT 'source', CAST(source AS VARCHAR) FROM o
        ) GROUP BY 1, 2
    ), nc AS (
        SELECT "column", value, count(*) AS cnt_new FROM (
            SELECT 'lang' AS "column", CAST(lang AS VARCHAR) AS value
            FROM n
            UNION ALL
            SELECT 'source', CAST(source AS VARCHAR) FROM n
        ) GROUP BY 1, 2
    ), j AS (
        SELECT coalesce(oc."column", nc."column") AS "column",
               coalesce(oc.value, nc.value) AS value,
               coalesce(cnt_old, 0) AS cnt_old,
               coalesce(cnt_new, 0) AS cnt_new,
               round(coalesce(cnt_old, 0) / CAST({n1} AS DOUBLE), 6)
                   AS share_old,
               round(coalesce(cnt_new, 0) / CAST({n2} AS DOUBLE), 6)
                   AS share_new
        FROM oc FULL OUTER JOIN nc
          ON oc."column" = nc."column"
          AND oc.value IS NOT DISTINCT FROM nc.value
    )
    SELECT "column", value, cnt_old, cnt_new, share_old, share_new,
           round(abs(share_old - share_new), 6) AS abs_delta
    FROM j
    """
    want = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert got == want
    want_sum = sorted(tuple(r) for r in con.execute(f"""
    WITH rep AS ({oracle})
    SELECT "column", count(*) AS n_values,
           CAST(sum(CAST(abs_delta AS DECIMAL(18,6))) AS DOUBLE) / 2.0
               AS tv_distance
    FROM rep GROUP BY "column"
    """).fetchall())
    assert got_sum == want_sum
    # non-degenerate: both columns produce buckets, drift is small
    # but measured on a random-ish split
    assert {c for c, *_ in got} == {"lang", "source"}


from hypothesis import given, settings, strategies as st  # noqa: E402

_VALS = st.lists(
    st.sampled_from(["a", "b", "c", "d", None]),
    min_size=0, max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(old_vals=_VALS, new_vals=_VALS)
def test_drift_property_vs_python_reference(spark, old_vals, new_vals):
    """Random categorical snapshots (incl. empties and NULL buckets):
    report and TV summary always equal the plain-Python reference."""
    from collections import Counter

    old = spark.createDataFrame(
        [(v,) for v in old_vals] or [(None,)], "x string"
    ).limit(len(old_vals))
    new = spark.createDataFrame(
        [(v,) for v in new_vals] or [(None,)], "x string"
    ).limit(len(new_vals))
    rep = drift_report(old, new, ["x"])
    got = {r["value"]: (r["cnt_old"], r["cnt_new"], r["abs_delta"])
           for r in rep.collect()}
    c1, c2 = Counter(old_vals), Counter(new_vals)
    n1, n2 = max(len(old_vals), 1), max(len(new_vals), 1)
    want = {}
    for v in set(c1) | set(c2):
        so = round(c1.get(v, 0) / n1, 6)
        sn = round(c2.get(v, 0) / n2, 6)
        want[v] = (c1.get(v, 0), c2.get(v, 0), round(abs(so - sn), 6))
    assert got == want
    if want:
        s = drift_summary(rep).collect()[0]
        from decimal import Decimal

        tv = float(sum(Decimal(f"{d:.6f}")
                       for _, _, d in want.values())) / 2.0
        assert abs(s["tv_distance"] - tv) < 1e-12
