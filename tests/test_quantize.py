"""Int8 scalar quantization (operators/quantize.py): exact
cross-engine code parity, the reconstruction bound, zero-scale and
NULL handling, code range, quantized-space cosine ordering sanity,
and the shuffle-free encode plan."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.quantize import (
    sq8_decode,
    sq8_encode,
    sq8_encode_sql,
    sq8_scales,
    sq8_scales_sql,
)

SF = "/root/testdata/sf0.001"
D = 64


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def scales(emb):
    return sq8_scales(emb, "embedding", D)


def test_codes_bit_identical_to_oracle(spark, emb, scales):
    import duckdb

    got = {r["vec_id"]: list(r["sq8"]) for r in
           sq8_encode(emb, "embedding", scales)
           .select("vec_id", "sq8").collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS "
            f"SELECT * FROM '{SF}/embeddings.parquet'")
    vec = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    rows = con.sql(f"""
        WITH scales AS ({sq8_scales_sql(vec, "embeddings", D)})
        SELECT vec_id, {sq8_encode_sql(vec)} AS sq8
        FROM embeddings, scales
    """).fetchall()
    assert len(rows) == len(got)
    for vid, codes in rows:
        assert got[vid] == list(codes)


def test_codes_in_range_and_scales_positive(spark, emb, scales):
    rng = sq8_encode(emb, "embedding", scales).select(
        F.min(F.array_min("sq8")).alias("lo"),
        F.max(F.array_max("sq8")).alias("hi"),
    ).first()
    assert -127 <= rng["lo"] and rng["hi"] <= 127
    assert all(s >= 0 for s in scales)


def test_reconstruction_within_bound(spark, emb, scales):
    dec = sq8_decode(sq8_encode(emb, "embedding", scales),
                     "sq8", scales)
    for r in dec.select("embedding", "deq").limit(100).collect():
        v = np.array(r["embedding"], dtype=np.float64)
        q = np.array(r["deq"])
        for i in range(D):
            if scales[i] > 0:
                # round-half interval + 1-ulp slack
                assert abs(v[i] - q[i]) <= scales[i] / 254.0 * 1.0001


def test_zero_scale_dimension_encodes_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.5, 0.0]), (2, [-0.25, 0.0])],
        "id long, v array<double>")
    scales = sq8_scales(df, "v", 2)
    assert scales[1] == 0.0
    codes = {r["id"]: list(r["sq8"]) for r in
             sq8_encode(df, "v", scales).collect()}
    assert codes[1][1] == 0 and codes[2][1] == 0
    assert codes[1][0] == 127  # 0.5 is this dim's max

def test_quantized_cosine_preserves_ordering(spark, emb, scales):
    """SQ8 is a candidate-generation tier: top-5 by cosine over the
    DEQUANTIZED vectors should recover most exact top-5 neighbors."""
    from formula1_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    dec = sq8_decode(sq8_encode(emb, "embedding", scales),
                     "sq8", scales).select("vec_id", "deq")
    queries_q = dec.filter(F.col("vec_id") < 10)
    approx = cosine_topk(dec, queries_q, k=5, vec_col="deq").collect()
    exact = cosine_topk(emb, emb.filter(F.col("vec_id") < 10),
                        k=5).collect()
    exact_pairs = {(r["q_id"], r["n_id"]) for r in exact}
    hit = sum((r["q_id"], r["n_id"]) in exact_pairs for r in approx)
    assert hit / len(exact_pairs) >= 0.9


def test_encode_plan_is_shuffle_free(spark, emb, scales):
    plan = (sq8_encode(emb, "embedding", scales)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_out_of_scale_batch_clamps_to_int8_range(spark):
    """Round-12 ADVICE: encoding a NEW batch against LANDED scales
    can exceed them — codes must saturate at +/-127 (both engines),
    never escape int8 range."""
    import duckdb

    from formula1_data_pipeline_spark.operators.quantize import (
        sq8_encode,
        sq8_encode_sql,
    )

    batch = spark.createDataFrame(
        [(1, [2.0, -3.0, 0.5]), (2, [0.5, 0.5, -0.5])],
        "vec_id int, embedding array<double>",
    )
    scales = [1.0, 1.0, 1.0]  # landed scales the batch exceeds
    got = {r["vec_id"]: r["sq8"] for r in
           sq8_encode(batch, "embedding", scales).collect()}
    assert got[1] == [127, -127, 64]
    assert got[2] == [64, 64, -64]
    expr = sq8_encode_sql("v")
    exp = duckdb.connect().execute(
        f"SELECT {expr} FROM (SELECT [2.0, -3.0, 0.5] AS v, "
        "[1.0, 1.0, 1.0] AS s)"
    ).fetchone()[0]
    assert exp == [127, -127, 64]
