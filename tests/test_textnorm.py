"""Text normalization (`functions/textnorm.py`): semantics + exact
DuckDB parity via the single-sourced SQL twin."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.functions.textnorm import (
    collapse_hspace,
    normalize_text,
    sql_normalize,
    strip_control,
    unify_punct,
)

CASES = [
    "plain text stays",
    "tab\tand  double  space",
    "curly ‘quotes’ and “double” ones",
    "dash – en — em ― horiz",
    "ellipsis… here",
    "nbsp and zero​width",
    "ctrl\x01chars\x1fgone\x7f",
    "  edges trimmed  ",
    "line one  \n  line two\nline three",
    "",
]


def test_normalize_text_semantics(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "i long, t string"
    )
    got = {r["i"]: r["n"] for r in df.select(
        "i", normalize_text(F.col("t")).alias("n")).collect()}
    assert got[0] == "plain text stays"
    assert got[1] == "tab and double space"
    assert got[2] == "curly 'quotes' and \"double\" ones"
    assert got[3] == "dash - en - em - horiz"
    assert got[4] == "ellipsis... here"
    assert got[5] == "nbsp and zerowidth"
    assert got[6] == "ctrlcharsgone"
    assert got[7] == "edges trimmed"
    # newlines survive; per-line edges trimmed
    assert got[8] == "line one\nline two\nline three"
    assert got[9] == ""
    # lowercase option
    low = df.filter("i = 2").select(
        normalize_text(F.col("t"), lowercase=True).alias("n")
    ).collect()[0]["n"]
    assert low == "curly 'quotes' and \"double\" ones".lower()


def test_stage_functions_compose(spark):
    df = spark.range(1).select(
        strip_control(F.lit("a\x01b")).alias("c"),
        unify_punct(F.lit("‘x’")).alias("q"),
        collapse_hspace(F.lit("a \t b\n c")).alias("w"),
    )
    r = df.collect()[0]
    assert r["c"] == "ab"
    assert r["q"] == "'x'"
    assert r["w"] == "a b\nc"


def test_normalize_duckdb_parity(spark):
    """The sql_normalize twin replays normalize_text byte-for-byte —
    including on the augmented multi-line documents corpus (the
    curation chain's stage-0 shape)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "i long, t string"
    )
    got = sorted(
        (r["i"], r["n"], r["nl"]) for r in df.select(
            "i",
            normalize_text(F.col("t")).alias("n"),
            normalize_text(F.col("t"), lowercase=True).alias("nl"),
        ).collect()
    )
    con = duckdb.connect()
    values = ", ".join(
        "(%d, '%s')" % (i, t.replace("'", "''"))
        for i, t in enumerate(CASES)
    )
    want = sorted(tuple(r) for r in con.execute(f"""
        WITH v(i, t) AS (VALUES {values})
        SELECT i, {sql_normalize('t')} AS n,
               {sql_normalize('t', lowercase=True)} AS nl
        FROM v
    """).fetchall())
    assert got == want

    from formula1_data_pipeline_spark.queries import load

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")["documents"]
    got2 = sorted(
        (r["doc_id"], r["n"]) for r in docs.select(
            "doc_id",
            F.md5(normalize_text(F.col("text"))).alias("n"),
        ).collect()
    )
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM "
                 f"'{sf}/documents.parquet'")
    want2 = sorted(tuple(r) for r in con2.execute(f"""
        SELECT doc_id, md5({sql_normalize('text')}) AS n
        FROM documents
    """).fetchall())
    assert got2 == want2
