"""Round-9 gate drafts — full cross-engine oracle parity for the two
operators built (and unit-tested) in round 8 whose catalog entries
were deferred for gate-budget reasons: ``sampling.resample_by_weight``
and ``packing.chunk_token_stream``. LANDED in round 9 as
q18_importance_resample and q19_token_chunks (queries_datapipe.py);
these drafts stay as independent row-for-row replays (dict-compare
rather than the harness's sorted value hash), exercising sf0.001
alongside the catalog gate's sf0.01.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR}/documents.parquet'"
    )
    return con


def test_resample_by_weight_oracle_parity(spark):
    """The intended r9 gate: q93's importance weights -> deterministic
    acceptance. The decimal mean makes the normalizer k identical in
    both engines (exact sum, one IEEE divide on equal operands), so
    per-row kept booleans replay bit-for-bit."""
    import formula1_data_pipeline_spark.queries  # noqa: F401
    from formula1_data_pipeline_spark.operators.sampling import (
        importance_weights,
        resample_by_weight,
    )
    from formula1_data_pipeline_spark.operators.text import quality_score
    from formula1_data_pipeline_spark.queries import load

    docs = load(spark, SF_DIR, "documents")["documents"]
    iw = importance_weights(docs, quality_score(F.col("text")) >= 0.7)
    weighted = iw.select(
        "doc_id", F.coalesce("importance", F.lit(0.0)).alias("w"))
    got = {
        r["doc_id"]: r["kept"]
        for r in resample_by_weight(weighted, F.col("w"), 0.5).collect()
    }

    from formula1_data_pipeline_spark.queries import CATALOG

    q93_sql = CATALOG["q93_importance_weights"].oracle
    oracle = f"""
    WITH iw AS ({q93_sql}),
    weighted AS (
        SELECT doc_id, coalesce(importance, 0.0) AS w FROM iw
    ), stats AS (
        SELECT CAST(sum(CAST(w AS DECIMAL(28,10))) AS DOUBLE) AS s,
               count(*) AS n
        FROM weighted
    )
    SELECT doc_id,
           (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                || '|' || 'resample-v1'), 1, 15)) AS BIGINT)
            / CAST(1152921504606846976 AS DOUBLE))
           < w * (0.5 / (s / n)) AS kept
    FROM weighted, stats
    """
    want = {r[0]: r[1] for r in _con().execute(oracle).fetchall()}
    assert got == want
    # non-degenerate: both kept and dropped rows exist
    assert any(got.values()) and not all(got.values())


def test_chunk_token_stream_oracle_parity(spark):
    """The intended r9 gate: whitespace-token stream -> global offset
    -> fixed-length sequences, replayed by DuckDB's flat prefix sum
    (the single-task formulation the operator's two-level version
    avoids at scale)."""
    from formula1_data_pipeline_spark.operators.dedup import tokens
    from formula1_data_pipeline_spark.operators.packing import (
        chunk_token_stream,
    )
    from formula1_data_pipeline_spark.queries import load

    docs = load(spark, SF_DIR, "documents")["documents"]
    toks = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "t"))
    got = {
        (r["doc_id"], r["pos"]): (r["global_pos"], r["seq_id"], r["seq_pos"])
        for r in chunk_token_stream(toks, seq_len=512).collect()
    }

    oracle = r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)),
                           '\s+'), x -> x <> '') AS toks
        FROM documents
    ), c AS (
        SELECT doc_id, len(toks) AS n,
               COALESCE(SUM(len(toks)) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS doc_start
        FROM t
    ), tok AS (
        SELECT t.doc_id, generate_subscripts(t.toks, 1) - 1 AS pos,
               unnest(t.toks) AS tk
        FROM t
    )
    SELECT tok.doc_id, tok.pos,
           c.doc_start + tok.pos AS global_pos,
           CAST((c.doc_start + tok.pos) // 512 AS BIGINT) AS seq_id,
           CAST((c.doc_start + tok.pos) % 512 AS BIGINT) AS seq_pos
    FROM tok JOIN c USING (doc_id)
    """
    want = {(r[0], r[1]): (r[2], r[3], r[4])
            for r in _con().execute(oracle).fetchall()}
    assert got == want
    # non-degenerate: multiple sequences, all-but-last exactly full
    from collections import Counter

    sizes = Counter(v[1] for v in got.values())
    assert len(sizes) > 2
    last = max(sizes)
    assert all(sizes[s] == 512 for s in sizes if s != last)
