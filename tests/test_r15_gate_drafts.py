"""Round-13-tier gate drafts — operators pre-staged in round 12 whose
catalog landings ride CHANGED extensions of queries due in r13 (file
named r15 for the fallback window: if an r13 host's window is tight,
the target re-gates again in r15). The catalog is at the 100-entry /
50-row alternation ceiling: zero free rows, riders only.

  * perceptual image hashing + hamming near-dup
    (``operators/phash.py``: aHash / dHash as ONE codegen'd SQL
    expression each over the multimodal binary column's hex — 60-bit
    fingerprints feeding the SAME pigeonhole-blocked hamming pair
    machinery as text simhash). LANDING ROUTE: rides q55's r13
    re-gate (q55 owns the multimodal transform surface; r11-gated,
    due r13) as kind='ahash'/'dhash' fingerprint rows plus
    kind='apair' hamming-pair rows over a deterministic near-dup
    augmentation (docs with doc_id % 5 == 0 re-encoded with their
    first character replaced — a one-pixel perturbation of the fake
    byte image, exactly the re-encode noise perceptual hashes
    exist to survive).

The draft runs the full driver-style compare (schema + rows +
order-insensitive canonical values) at sf0.001 and sf0.01 — the
exact acceptance r13 promotes into __spark_entry__.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark import queries  # noqa: F401
from formula1_data_pipeline_spark.operators import phash as P
from tests.oracle_compare import canon, run_oracle

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

#: the q55 rider's near-dup augmentation: every doc_id % 5 == 0 doc
#: also lands as a copy (media_id + 10^9) with its first character
#: replaced — one perturbed pixel in the fake byte image
_AUG_OFFSET = 1_000_000_000


def _compare(spark_df, oracle_sql: str, sf_dir: str):
    sdf = spark_df.toPandas()
    odf = run_oracle(oracle_sql, sf_dir)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    a, b = canon(sdf), canon(odf)
    assert a == b, [(x, y) for x, y in zip(a, b) if x != y][:3]


def _aug_media(spark, sf_dir):
    from formula1_data_pipeline_spark.operators.multimodal import (
        to_media_table,
    )
    from formula1_data_pipeline_spark.queries import load

    docs = load(spark, sf_dir, "documents")["documents"]
    mutated = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + _AUG_OFFSET).alias("doc_id"),
            F.concat(F.lit("X"), F.expr("substring(text, 2)"))
            .alias("text"),
        )
    )
    return to_media_table(docs.select("doc_id", "text")
                          .unionByName(mutated))


def _hash_leg_sql(kind: str) -> str:
    expr = {"ahash": P.ahash_expr, "dhash": P.dhash_expr}[kind](
        "hx", "h", duck=True)
    return f"""
        SELECT media_id, '{kind}' AS kind, CAST(-1 AS BIGINT) AS i,
               CAST(-1 AS BIGINT) AS j,
               CAST({expr} AS VARCHAR) AS val
        FROM mm WHERE h >= 1
    """


_MEDIA_CTE = f"""
    mm AS (
        SELECT media_id, to_hex(encode(text)) AS hx,
               octet_length(encode(text)) // {P.SRC_W} AS h
        FROM (
            SELECT doc_id AS media_id, text FROM documents
            UNION ALL
            SELECT doc_id + {_AUG_OFFSET},
                   'X' || substring(text, 2)
            FROM documents WHERE doc_id % 5 = 0
        )
    )
"""

_PAIR_SQL = f"""
    , hp AS (
        SELECT media_id,
               {{AHASH}} AS phash
        FROM mm WHERE h >= 1
    ), g AS (
        SELECT phash, min(media_id) AS cid,
               CAST(count(*) AS BIGINT) AS nd
        FROM hp GROUP BY 1
    ), sl AS (
        SELECT phash, cid, nd, s.x AS sidx,
               (phash >> (15 * s.x)) & 32767 AS skey
        FROM g CROSS JOIN (SELECT unnest(range(0, 4)) AS x) s
    ), pr AS (
        SELECT DISTINCT a.phash AS ap, b.phash AS bp,
               bit_count(xor(a.phash, b.phash)) AS hamming,
               a.cid AS acid, b.cid AS bcid, a.nd * b.nd AS npd
        FROM sl a JOIN sl b
          ON a.sidx = b.sidx AND a.skey = b.skey
         AND a.phash < b.phash
    )
    SELECT acid AS media_id, 'apair' AS kind,
           CAST(hamming AS BIGINT) AS i, CAST(bcid AS BIGINT) AS j,
           CAST(npd AS VARCHAR) AS val
    FROM pr WHERE hamming BETWEEN 1 AND 8
"""


def _q55_rider_oracle() -> str:
    ah = P.ahash_expr("hx", "h", duck=True)
    return ("WITH " + _MEDIA_CTE
            + _PAIR_SQL.replace("{AHASH}", ah)
            + " UNION ALL " + _hash_leg_sql("ahash")
            + " UNION ALL " + _hash_leg_sql("dhash"))


def _q55_rider_spark(spark, sf_dir):
    media = _aug_media(spark, sf_dir)
    legs = []
    for kind in ("ahash", "dhash"):
        legs.append(P.phash_df(media, kind).select(
            "media_id",
            F.lit(kind).alias("kind"),
            F.lit(-1).cast("long").alias("i"),
            F.lit(-1).cast("long").alias("j"),
            F.col("phash").cast("string").alias("val"),
        ))
    pairs = P.phash_neardup_pairs(media, "ahash", max_distance=8) \
        .select(
            F.col("a_canonical_id").alias("media_id"),
            F.lit("apair").alias("kind"),
            F.col("hamming").cast("long").alias("i"),
            F.col("b_canonical_id").cast("long").alias("j"),
            F.col("n_pair_docs").cast("string").alias("val"),
        )
    out = legs[0]
    for leg in legs[1:] + [pairs]:
        out = out.unionByName(leg)
    return out


@pytest.mark.parametrize("sf_dir", SFS)
def test_draft_phash_kinds(spark, sf_dir):
    out = _q55_rider_spark(spark, sf_dir)
    _compare(out, _q55_rider_oracle(), sf_dir)
    # non-degenerate: the augmentation must actually produce hamming
    # pairs (the perceptual point), and both fingerprint legs rows
    from collections import Counter

    kinds = Counter(r["kind"] for r in out.collect())
    assert kinds["apair"] >= 1
    assert kinds["ahash"] == kinds["dhash"] > 500
