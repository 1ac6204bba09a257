"""Extended PII detection/redaction — payment-card numbers with a
pure-expression Luhn check, and IPv4 literals.

The q44 gate covers the regex tier (email/phone). Card numbers need
more than a regex: 13-19 digit runs are common in clean text (ids,
timestamps), so production scrubbers validate the Luhn checksum
(ISO/IEC 7812) before counting a hit. The check here is a codegen'd
column expression — digit transform + integer fold, no UDF — so
card screening of a 100 TB corpus stays a shuffle-free projection,
and the integer-only math replays exactly in DuckDB (the redacted
string and the valid-hit count both value-hash-gate).

Pattern notes: separators inside a candidate are single ' ' or '-'
(the common card formattings); both Java regex (Spark) and RE2
(DuckDB) interpret the pattern identically — the q44 gate's
cross-engine regex discipline. Redaction replaces every CANDIDATE
(card-shaped run), valid or not — the conservative scrub — while
``n_valid_cards`` counts only Luhn-valid ones, so downstream policy
can distinguish "looked like a card" from "was a card".

Pre-staged for q44's round-10 re-gate (the CHANGELOG landing plan:
q44 is r8-gated and due in round 10, so extending it costs zero
budget rows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 13-19 digits with optional single space/dash separators, anchored
#: on word boundaries (identical semantics in Java regex and RE2)
CARD_RE = r"\b\d(?:[ -]?\d){11,17}\d\b"

#: dotted-quad IPv4 (0-255 per octet, no leading-zero pedantry —
#: the scrubbing tier, not a validator)
IPV4_RE = (
    r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"
)


def luhn_valid(digits: Column) -> Column:
    """True iff ``digits`` (a string of ASCII digits) passes the Luhn
    checksum. Pure integer expression: reverse, double every second
    digit (subtracting 9 when it overflows), fold the sum, mod 10.
    DuckDB twin (same shape, exact):

        list_sum(list_transform(range(1, len(d) + 1), i -> CASE
            WHEN i % 2 = 0 THEN
                CASE WHEN 2 * CAST(substr(reverse(d), i, 1) AS INT) > 9
                     THEN 2 * CAST(substr(reverse(d), i, 1) AS INT) - 9
                     ELSE 2 * CAST(substr(reverse(d), i, 1) AS INT) END
            ELSE CAST(substr(reverse(d), i, 1) AS INT) END)) % 10 = 0
    """
    rev = F.reverse(digits)
    terms = F.transform(
        F.sequence(F.lit(1), F.length(rev)),
        lambda i: F.when(
            i % 2 == 0,
            F.when(
                F.substring(rev, i, F.lit(1)).cast("int") * 2 > 9,
                F.substring(rev, i, F.lit(1)).cast("int") * 2 - 9,
            ).otherwise(F.substring(rev, i, F.lit(1)).cast("int") * 2),
        ).otherwise(F.substring(rev, i, F.lit(1)).cast("int")),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    return (F.length(digits) > 0) & (total % 10 == 0)


def card_candidates(text: Column) -> Column:
    """All card-shaped runs in ``text`` (array<string>, with their
    separators)."""
    return F.regexp_extract_all(text, F.lit(CARD_RE), 0)


def valid_cards(text: Column) -> Column:
    """Only the Luhn-valid candidates (array<string>)."""
    return F.filter(
        card_candidates(text),
        lambda c: luhn_valid(F.regexp_replace(c, r"[ -]", "")),
    )


def redact_cards(text: Column, token: str = "<CARD>") -> Column:
    """Replace every card-shaped run (conservative scrub)."""
    return F.regexp_replace(text, CARD_RE, token)


def redact_ipv4(text: Column, token: str = "<IP>") -> Column:
    return F.regexp_replace(text, IPV4_RE, token)
