"""Text normalization — the pre-dedup cleanup pass.

Exact-match dedup (lines, shingles, fingerprints) is only as good as
its normalization: the same paragraph with a curly quote, an NBSP,
or a doubled space is a different string to every hash downstream.
This module is the deterministic normalize stage a C4/CCNet-shaped
pipeline runs FIRST, as codegen'd column expressions.

Cross-engine regex discipline (the q44 rule): patterns use explicit
character classes only — no named POSIX/Java classes, which Java
regex (Spark) and RE2 (DuckDB) spell differently — so every
function's output replays exactly in an oracle. Structural
whitespace (\\n) is preserved: line-level dedup owns line
boundaries, this stage must not invent or destroy them.

Pre-staged round 9; rides the curation composite (q100's stage-0
augment step is the natural host) or a due cleaning gate later, per
the CHANGELOG landing-plan rules.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: C0 controls except \t \n \r, plus DEL — explicit ranges, never
#: \p{Cntrl} (Java) / [[:cntrl:]] (RE2)
CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"

#: horizontal whitespace runs (space, tab, NBSP)
HSPACE_RE = "[ \\t\\u00a0]+"

#: zero-width characters (ZWSP, ZWNJ, ZWJ, BOM) — these render as
#: NOTHING, so normalization deletes them rather than inventing a
#: visible space
ZEROWIDTH_RE = "[\\u200b\\u200c\\u200d\\ufeff]"

#: (pattern, replacement) pairs for typographic punctuation — each a
#: literal character class, identical in both engines
_PUNCT = (
    ("[\\u2018\\u2019\\u201a\\u201b]", "'"),
    ("[\\u201c\\u201d\\u201e\\u201f]", '"'),
    ("[\\u2013\\u2014\\u2015]", "-"),
    ("\\u2026", "..."),
)


def strip_control(col: Column) -> Column:
    """Drop C0 control characters (keeping \\t \\n \\r), DEL, and
    zero-width characters."""
    return F.regexp_replace(
        F.regexp_replace(col, CONTROL_RE, ""), ZEROWIDTH_RE, "")


def unify_punct(col: Column) -> Column:
    """Map typographic quotes/dashes/ellipsis to their ASCII forms."""
    for pat, rep in _PUNCT:
        col = F.regexp_replace(col, pat, rep)
    return col


def collapse_hspace(col: Column) -> Column:
    """Collapse horizontal whitespace runs (space, tab, NBSP) to
    one space and trim each LINE's edges —
    newlines survive untouched (line structure belongs to the
    line-dedup stage)."""
    one = F.regexp_replace(col, HSPACE_RE, " ")
    return F.regexp_replace(one, " ?\\n ?", "\n")


def normalize_text(col: Column, lowercase: bool = False) -> Column:
    """The composed pass: strip controls -> unify punctuation ->
    collapse/trim horizontal whitespace (-> optional lowercase).
    Deterministic, shuffle-free, one codegen'd projection."""
    out = F.trim(collapse_hspace(unify_punct(strip_control(col))))
    return F.lower(out) if lowercase else out


#: DuckDB twins of every pattern above (RE2 accepts the same
#: explicit classes; \uXXXX literals become their UTF-8 characters
#: in the SQL string) — exported so oracles stay single-sourced
def sql_normalize(expr: str, lowercase: bool = False) -> str:
    """The exact DuckDB replay of :func:`normalize_text` over the SQL
    expression ``expr``."""
    out = f"regexp_replace({expr}, '{CONTROL_RE}', '', 'g')"
    zw = ZEROWIDTH_RE.encode().decode("unicode_escape")
    out = f"regexp_replace({out}, '{zw}', '', 'g')"
    for pat, rep in _PUNCT:
        lit = pat.encode().decode("unicode_escape")
        rlit = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{lit}', '{rlit}', 'g')"
    hs = HSPACE_RE.encode().decode("unicode_escape")
    out = f"regexp_replace({out}, '{hs}', ' ', 'g')"
    # replacement is a REAL newline character in the SQL literal —
    # RE2 replacement strings treat backslash escapes as literals,
    # so '\n' there would emit the letter n
    out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
    out = f"trim({out})"
    return f"lower({out})" if lowercase else out
