"""Extended PII tier (`functions/pii.py`): Luhn-validated card
detection + IPv4, cross-engine parity included (integer-only math)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.functions.pii import (
    CARD_RE,
    luhn_valid,
    redact_cards,
    redact_ipv4,
    valid_cards,
)

# Luhn-valid test numbers (public test-card corpus) and off-by-one
# invalid twins
VALID = ["4111111111111111", "4532015112830366", "5500005555555559"]
INVALID = ["4111111111111112", "4532015112830367", "1234567890123"]


def test_luhn_valid_known_vectors(spark):
    rows = [(d, True) for d in VALID] + [(d, False) for d in INVALID]
    df = spark.createDataFrame(rows, "d string, want boolean")
    got = df.select("d", "want", luhn_valid(F.col("d")).alias("ok")) \
        .collect()
    for r in got:
        assert r["ok"] == r["want"], r["d"]
    # degenerate: empty string is not a card
    assert not spark.range(1).select(
        luhn_valid(F.lit("")).alias("ok")).collect()[0]["ok"]


def test_card_detection_and_redaction(spark):
    text = (
        "pay 4111 1111 1111 1111 or 4532-0151-1283-0366, "
        "bogus 4111111111111112, order 12345 at 10.0.0.1 "
        "and 999.1.1.1 stays"
    )
    df = spark.range(1).select(F.lit(text).alias("t"))
    row = df.select(
        valid_cards(F.col("t")).alias("valid"),
        redact_cards(F.col("t")).alias("red"),
        redact_ipv4(redact_cards(F.col("t"))).alias("red2"),
    ).collect()[0]
    # two Luhn-valid cards; the bogus 16-digit run is card-SHAPED but
    # not valid
    assert row["valid"] == ["4111 1111 1111 1111", "4532-0151-1283-0366"]
    # every card-shaped run is scrubbed, short digit runs stay
    assert row["red"].count("<CARD>") == 3
    assert "12345" in row["red"]
    # IPv4 scrub hits the valid dotted quad only
    assert "<IP>" in row["red2"] and "999.1.1.1" in row["red2"]


def test_card_parity_with_duckdb(spark):
    """The q44-extension discipline: Java regex and RE2 agree on the
    candidate set, and the Luhn fold replays exactly in DuckDB."""
    texts = [
        (1, "a 4111 1111 1111 1111 b"),
        (2, "x 4111111111111112 y 5500005555555559"),
        (3, "no cards, just 123-456 and 1.2.3.4"),
        (4, "edge 4532-0151-1283-0366."),
    ]
    df = spark.createDataFrame(texts, "id long, t string")
    got = sorted(
        (r["id"], r["red"], list(r["valid"]))
        for r in df.select(
            "id",
            redact_cards(F.col("t")).alias("red"),
            valid_cards(F.col("t")).alias("valid"),
        ).collect()
    )
    con = duckdb.connect()
    values = ", ".join(
        f"({i}, '{t}')" for i, t in texts
    )
    # DuckDB forbids subqueries inside lambdas, so the normalized
    # digit string is inlined everywhere the Luhn fold needs it
    nd = "regexp_replace(c, '[ -]', '', 'g')"
    luhn = (
        f"list_sum(list_transform(range(1, len({nd}) + 1), i -> CASE "
        f"WHEN i % 2 = 0 THEN CASE "
        f"  WHEN 2 * CAST(substr(reverse({nd}), i, 1) AS INT) > 9 "
        f"  THEN 2 * CAST(substr(reverse({nd}), i, 1) AS INT) - 9 "
        f"  ELSE 2 * CAST(substr(reverse({nd}), i, 1) AS INT) END "
        f"ELSE CAST(substr(reverse({nd}), i, 1) AS INT) END)) % 10 = 0"
    )
    want = sorted(
        (r[0], r[1], list(r[2]))
        for r in con.execute(f"""
        WITH v(id, t) AS (VALUES {values}),
        red AS (
            SELECT id, regexp_replace(t, '{CARD_RE}', '<CARD>', 'g')
                       AS red,
                   regexp_extract_all(t, '{CARD_RE}', 0) AS cands
            FROM v
        )
        SELECT id, red,
               list_filter(cands, c -> {luhn}) AS valid
        FROM red ORDER BY id
        """).fetchall()
    )
    assert got == want
