"""Perceptual image hashing (operators/phash.py): hand-computed
reference hashes, gradient/brightness behavior, near-dup pairing via
the shared hamming machinery, plan shape, and DuckDB oracle parity.
"""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators import phash as P

SF = "/root/testdata/sf0.001"


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows],
        "media_id long, payload binary",
    )


def _ref_hash(data: bytes, kind: str) -> int:
    """Pure-python reference of the hash definitions."""
    h = len(data) // P.SRC_W
    assert h >= 1
    if kind == "ahash":
        n_cols = P.GRID_COLS
        px = [
            data[((i * h) // P.GRID_ROWS) * P.SRC_W
                 + (j * P.SRC_W) // n_cols]
            for i in range(P.GRID_ROWS) for j in range(n_cols)
        ]
        total = sum(px)
        n = len(px)
        return sum(
            (1 << k) for k, b in enumerate(px) if n * b > total)
    n_cols = P.GRID_COLS + 1
    out = 0
    for i in range(P.GRID_ROWS):
        for j in range(P.GRID_COLS):
            a = data[((i * h) // P.GRID_ROWS) * P.SRC_W
                     + (j * P.SRC_W) // n_cols]
            b = data[((i * h) // P.GRID_ROWS) * P.SRC_W
                     + ((j + 1) * P.SRC_W) // n_cols]
            if a > b:
                out |= 1 << (i * P.GRID_COLS + j)
    return out


@pytest.mark.parametrize("kind", ["ahash", "dhash"])
def test_matches_python_reference(spark, kind):
    import hashlib

    rows = [
        (1, bytes(range(256))[:160]),                  # gradient image
        (2, b"\x80" * 160),                            # constant image
        (3, hashlib.sha256(b"img3").digest() * 5),     # noise image
        (4, b"tooshort"),                              # height 0: drop
    ]
    got = {r["media_id"]: r["phash"]
           for r in P.phash_df(_media(spark, rows), kind).collect()}
    assert set(got) == {1, 2, 3}
    for mid, data in rows[:3]:
        assert got[mid] == _ref_hash(bytes(data), kind), (kind, mid)
    # constant image: no pixel exceeds the mean / its neighbor
    assert got[2] == 0
    # all hashes fit in 60 bits (sign-safe in both engines)
    assert all(0 <= v < (1 << 60) for v in got.values())


def test_near_identical_images_pair_up(spark):
    """One flipped byte far from most sample points -> small hamming
    distance; an unrelated noise image -> no pair."""
    import hashlib

    base = bytes(range(256))[:160]
    tweaked = bytearray(base)
    tweaked[0] ^= 0xFF  # perturb one sampled corner pixel
    noise = hashlib.sha256(b"other").digest() * 5
    media = _media(spark, [(1, base), (2, bytes(tweaked)), (3, noise)])
    pairs = P.phash_neardup_pairs(media, "ahash", max_distance=8,
                                  n_slices=10,
                                  bits_per_slice=6).collect()
    ids = {(r["a_canonical_id"], r["b_canonical_id"]) for r in pairs}
    flat = {x for t in ids for x in t}
    assert flat == {1, 2}
    assert all(1 <= r["hamming"] <= 8 for r in pairs)


def test_exact_duplicate_images_group(spark):
    media = _media(spark, [(1, bytes(range(160))),
                           (2, bytes(range(160))),
                           (3, bytes(reversed(range(160))))])
    groups = {r["canonical_id"]: r["n_docs"]
              for r in P.phash_groups(media, "dhash").collect()}
    assert groups[1] == 2 and groups[3] == 1


@pytest.mark.parametrize("kind", ["ahash", "dhash"])
def test_oracle_parity_over_documents(spark, kind):
    """Full value parity vs DuckDB over the corpus media table — the
    exact check the q55 r13 rider promotes."""
    from formula1_data_pipeline_spark.operators.multimodal import (
        to_media_table,
    )
    from formula1_data_pipeline_spark.queries import load

    docs = load(spark, SF, "documents")["documents"]
    got = {r["media_id"]: r["phash"]
           for r in P.phash_df(to_media_table(docs), kind).collect()}
    expr = {"ahash": P.ahash_expr, "dhash": P.dhash_expr}[kind](
        "hx", "h", duck=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = {r[0]: r[1] for r in con.execute(f"""
        WITH m AS (
            SELECT doc_id AS media_id, to_hex(encode(text)) AS hx,
                   octet_length(encode(text)) // {P.SRC_W} AS h
            FROM documents
        )
        SELECT media_id, {expr} AS phash FROM m WHERE h >= 1
    """).fetchall()}
    assert got == exp and len(got) > 400


def test_plan_is_shuffle_free(spark):
    media = _media(spark, [(1, bytes(range(160)))])
    plan = (P.phash_df(media, "ahash")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_column_form_matches_one_expression_spec(spark):
    """r14 optimization guard: phash_df now stages pixel columns; the
    one-expression builders stay the semantic spec — both forms must
    hash every payload identically (including the h >= 1 edge)."""
    from pyspark.sql import functions as F

    from formula1_data_pipeline_spark.operators.phash import (
        SRC_W,
        ahash_expr,
        dhash_expr,
        phash_df,
    )

    rows = [(i, bytes((i * 37 + j * 11) % 256 for j in range(n)))
            for i, n in enumerate([16, 96, 40, 15, 256, 33])]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    for kind, expr_fn in (("ahash", ahash_expr), ("dhash", dhash_expr)):
        spec = (
            media.select(
                "media_id",
                F.hex("payload").alias("hx"),
                F.expr(f"CAST(length(payload) AS BIGINT) div {SRC_W}")
                .alias("h"),
            )
            .filter(F.col("h") >= 1)
            .select("media_id", F.expr(expr_fn("hx", "h")).alias("phash"))
        )
        got = {r["media_id"]: r["phash"]
               for r in phash_df(media, kind).collect()}
        want = {r["media_id"]: r["phash"] for r in spec.collect()}
        assert got == want, kind
