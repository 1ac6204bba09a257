"""Corpus-curation composite chains.

Composite #1 (:func:`curation_chain`, REGISTERED as q100 in round
10): the CCNet-shaped curation pipeline (Wenzek et al. 2019) in ONE
hash-gated query, composing four operators:

    text normalization (stage 0, ``functions/textnorm.py``)
        -> line-level dedup (C4 policy, ``operators/lines.py``)
        -> bigram-LM quality scoring (``operators/lm.py``)
        -> token-budget selection (``operators/selection.py``)

Composite #2 (:func:`diversity_downsample`, pre-staged for ROUND
11): k-center exemplar cells -> nearest-exemplar assignment ->
per-cell md5 quota — cap-every-region diversity downsampling over
the embeddings table.

Why a composite: the driver's correctness gate has a 50-row budget
and the 100-entry catalog fills it as a strict 2-round alternation —
round 10 had exactly ONE free row (49 r8-stale re-gates + this).
The q97 lesson: batching a pipeline behind one gate whose oracle
composes each stage's EXACT standalone CTE builder keeps every stage
under the value-hash microscope without spending a row per stage.

Determinism: stages 0-1 are exact string work; stage 2 is integer
sums with one 6-dp divide per score; stage 3 quantizes the score
through DECIMAL(18,6) and runs integer prefix sums — the whole chain
replays bit-for-bit in DuckDB. The reference slice for LM training
is an md5-bucket of doc_id (engine-reproducible, no RNG). The
augmentation injects NBSP/zero-width/typographic-punctuation
artifacts so stage 0 is value-pinned, not a no-op: the NBSP chrome
variants only merge with their plain-space twins — and so only go
corpus-hot — if normalization actually ran.

Scale: each stage keeps its own documented shape — normalization's
shuffle-free codegen projection, line dedup's map-side
partial-aggregated doc-frequency counting, LM scoring's
join-against-distributed-count-tables, selection's budget-pruned
two-level prefix sum. Composition adds no new shuffle class; the
cleaned corpus flows doc-keyed between stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.functions.textnorm import (
    normalize_text,
    sql_normalize,
)
from formula1_data_pipeline_spark.operators.dedup import tokens
from formula1_data_pipeline_spark.operators.lines import dedup_lines
from formula1_data_pipeline_spark.operators.lm import (
    score_hit_rate,
    train_ngram_lm,
)
from formula1_data_pipeline_spark.operators.sampling import hash_bucket
from formula1_data_pipeline_spark.operators.selection import (
    select_token_budget,
)
from formula1_data_pipeline_spark.queries import register

#: token budget for the selection stage — binding (selects a strict
#: prefix) from sf0.001 up, since the augmented corpus carries
#: >20k post-cleaning tokens at every committed scale factor
BUDGET = 20_000

#: md5 bucket share of doc_ids that trains the bigram LM (the
#: CCNet "clean reference corpus" side)
REF_PCT = 40


#: raw scraped-text artifacts the stage-0 normalize pass must clean
#: (NBSP inside the chrome lines, a zero-width space, typographic
#: quotes + em-dash wrapper lines) — after :func:`normalize_text`
#: the NBSP variants MERGE with their plain-space twins, so the hot-
#: line detection below only fires corpus-wide if stage 0 actually
#: ran, and every cleaned doc's md5 pins the punctuation mapping
_HDR_RAW = "  SUBSCRIBE\u00a0TO OUR NEWSLETTER \u200b"
_COOKIE_RAW = "cookie\u00a0policy\u00a0notice"
_QUOTE_OPEN = "\u201c"
_QUOTE_CLOSE = "\u201d \u2014 fin"


def _augment(docs: DataFrame) -> DataFrame:
    """Deterministic multi-line augmentation (the q44 pattern —
    testdata docs are single-line, so line-level dedup would be
    degenerate on the raw table): ' scan ' separators become
    newlines; doc_id%4 injects boilerplate chrome the C4 policy must
    strip — a newsletter header (+ an NBSP/case/whitespace variant
    that only stage-0 normalization folds onto the same line), a
    cookie footer (+ its NBSP variant), and curly-quote/em-dash
    wrapper lines for the punctuation-mapping probe."""
    base = F.replace(F.col("text"), F.lit(" scan "), F.lit("\n"))
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("Subscribe to our newsletter\n"),
                base,
                F.lit("\ncookie policy notice"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit(_HDR_RAW + "\n"), base),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(base, F.lit("\n\n" + _COOKIE_RAW)),
        )
        .otherwise(
            F.concat(
                F.lit(_QUOTE_OPEN + "\n"), base,
                F.lit("\n" + _QUOTE_CLOSE),
            )
        )
        .alias("text"),
    )


def curation_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full chain. Output one row per SELECTED doc:
    (doc_id, score_q, n_tokens, cum_before, clean_md5) — clean_md5
    pins stage 1's exact cleaned text under the hash gate, the other
    columns pin stages 2-3 (quantized LM hit_rate ordering + exact
    selected-token offsets)."""
    from formula1_data_pipeline_spark.queries import load

    raw = load(spark, sf_dir, "documents")["documents"]
    # stage 0: deterministic text normalization (strip controls /
    # zero-width, unify typographic punctuation, collapse NBSP+
    # hspace runs, trim line edges) — the pre-dedup cleanup pass a
    # C4/CCNet pipeline runs FIRST; a shuffle-free codegen projection
    aug = _augment(raw).select(
        "doc_id", normalize_text(F.col("text")).alias("text")
    )

    cleaned = dedup_lines(aug, min_docs=2, keep="none").select(
        "doc_id", F.col("text_clean").alias("text")
    )

    model = train_ngram_lm(
        cleaned, hash_bucket(F.col("doc_id"), "cur-ref", 100) < REF_PCT
    )
    # hit-rate-only scoring path: the chain needs just the CCNet
    # bucket signal, and the general score_ngram_lm's two unigram
    # left-joins cannot be pruned by Catalyst (non-declared-unique
    # join key) — score_hit_rate is value-identical on hit_rate
    # with one join instead of three
    scored = score_hit_rate(cleaned, model).select(
        "doc_id",
        # <2-token docs score NULL -> rank at 0.0 (kept only if the
        # budget survives every scored doc; ties break by doc_id)
        F.coalesce(F.col("hit_rate"), F.lit(0.0)).alias("lm_score"),
    )

    sel = select_token_budget(
        scored.join(cleaned, "doc_id").select(
            "doc_id", "lm_score",
            F.size(tokens(F.col("text"))).alias("n_toks"),
        ),
        score=F.col("lm_score"),
        n_tokens=F.col("n_toks"),
        budget=BUDGET,
    )
    return (
        sel.join(cleaned, "doc_id")
        .select(
            "doc_id", "score_q", "n_tokens", "cum_before",
            F.md5(F.col("text")).alias("clean_md5"),
        )
    )


# --------------------------------------------------------------------------
# Oracle — composed from each stage's exact standalone CTE text
# --------------------------------------------------------------------------

_SQL_TOKS_CLEAN = (
    r"list_filter(regexp_split_to_array(trim(lower(text_clean)), "
    r"'\s+'), x -> x <> '')"
)

#: stage 0+1: augmentation + normalize (textnorm's exact SQL twin) +
#: line explode + hot lines + C4 drop-all rebuild — the exact SQL
#: the standalone line-dedup / textnorm gates use
_SQL_CLEANED = f"""
    aug0 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 4 = 0 THEN
                        'Subscribe to our newsletter' || chr(10) || base
                        || chr(10) || 'cookie policy notice'
                    WHEN doc_id % 4 = 1 THEN
                        '{_HDR_RAW}' || chr(10) || base
                    WHEN doc_id % 4 = 2 THEN
                        base || chr(10) || chr(10) || '{_COOKIE_RAW}'
                    ELSE '{_QUOTE_OPEN}' || chr(10) || base || chr(10)
                         || '{_QUOTE_CLOSE}' END AS text
        FROM (SELECT doc_id, replace(text, ' scan ', chr(10)) AS base
              FROM documents)
    ), aug AS (
        SELECT doc_id, {sql_normalize('text')} AS text FROM aug0
    ), lin AS (
        SELECT doc_id, i - 1 AS pos, parts[i] AS line,
               trim(lower(parts[i])) AS nline
        FROM (SELECT doc_id, string_split(text, chr(10)) AS parts,
                     unnest(range(1, len(string_split(text, chr(10))) + 1))
                         AS i
              FROM aug)
    ), hot AS (
        SELECT nline FROM (
            SELECT nline, count(DISTINCT doc_id) AS line_df
            FROM lin WHERE nline <> '' GROUP BY 1
        ) WHERE line_df >= 2
    ), kept AS (
        SELECT * FROM lin
        WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.nline = lin.nline)
    ), cleaned AS (
        SELECT a.doc_id,
               coalesce(r.text_clean, '') AS text_clean
        FROM aug a
        LEFT JOIN (
            SELECT doc_id, string_agg(line, chr(10) ORDER BY pos)
                       AS text_clean
            FROM kept GROUP BY 1
        ) r USING (doc_id)
    )
"""

#: stage 2: bigram-LM training on the md5-bucket reference slice of
#: the cleaned corpus + hit_rate scoring — the standalone LM gate's
#: CTE text with (documents, text) -> (cleaned, text_clean)
_SQL_LM_SCORE = f"""
    t AS (
        SELECT doc_id, {_SQL_TOKS_CLEAN} AS toks FROM cleaned
    ), flagged AS (
        SELECT doc_id, toks,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                    || '|cur-ref'), 1, 15)) AS BIGINT) % 100 < {REF_PCT}
                   AS is_ref
        FROM t
    ), ref_tok AS (
        SELECT unnest(toks) AS w FROM flagged WHERE is_ref
    ), uni AS (
        SELECT w, count(*) AS c1 FROM ref_tok GROUP BY 1
    ), idx AS (
        SELECT doc_id, is_ref, toks,
               unnest(range(2, len(toks) + 1)) AS i
        FROM flagged
    ), pairs AS (
        SELECT doc_id, is_ref, toks[i - 1] AS w1, toks[i] AS w2 FROM idx
    ), big AS (
        SELECT w1, w2, count(*) AS c2 FROM pairs WHERE is_ref GROUP BY 1, 2
    ), joined AS (
        SELECT p.doc_id, b.c2
        FROM pairs p
        LEFT JOIN big b USING (w1, w2)
    ), agg AS (
        SELECT doc_id,
               count(*) AS n_bigrams,
               sum(CASE WHEN c2 IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
        FROM joined GROUP BY 1
    ), scored AS (
        SELECT c.doc_id,
               coalesce(round(CAST(a.n_hits AS DOUBLE)
                   / CAST(nullif(a.n_bigrams, 0) AS DOUBLE), 6), 0.0)
                   AS lm_score,
               len({_SQL_TOKS_CLEAN.replace("text_clean", "c.text_clean")})
                   AS n_toks
        FROM cleaned c LEFT JOIN agg a USING (doc_id)
    )
"""

#: stage 3: the standalone selection gate's ordered-window CTE
_SQL_SELECT = f"""
    quant AS (
        SELECT doc_id,
               CAST(CAST(lm_score AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                   AS score_q,
               CAST(n_toks AS BIGINT) AS n_tokens
        FROM scored
    ), ordered AS (
        SELECT doc_id, score_q, n_tokens,
               -- window SUM(BIGINT) is HUGEINT in DuckDB, which
               -- pandas renders as float — cast back to the Spark
               -- side's BIGINT so the value-hash canon matches
               CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY score_q DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before
        FROM quant
    )
"""


def curation_chain_oracle() -> str:
    """The composed chain oracle (DuckDB ANSI SQL)."""
    return f"""
    WITH {_SQL_CLEANED}, {_SQL_LM_SCORE}, {_SQL_SELECT}
    SELECT o.doc_id, o.score_q, o.n_tokens, o.cum_before,
           md5(c.text_clean) AS clean_md5
    FROM ordered o JOIN cleaned c USING (doc_id)
    WHERE o.cum_before < {BUDGET}
    """


register(
    "q100_curation_chain",
    curation_chain_oracle(),
    doc="CCNet-shaped curation composite (§2.12, the round-10 gate "
        "row): normalize (stage 0, textnorm's codegen projection) -> "
        "line-level dedup (C4 drop-all over lines hot in >=2 docs, "
        "map-side partial-agg doc-frequency counting) -> bigram-LM "
        "hit-rate scoring (count tables stay distributed; integer "
        "ratio-of-sums, one 6-dp divide) -> token-budget selection "
        "(budget-pruned two-level prefix sum — the window touches "
        "~budget tokens of rows however large the corpus). The "
        "oracle composes each stage's exact standalone CTE text (the "
        "q97 discipline), so all four operators sit under one "
        "value-hash gate; clean_md5 pins the full cleaned text of "
        "every selected doc",
)(curation_chain)



# --------------------------------------------------------------------------
# Composite #2: diversity-balanced downsampling — lives in
# curation_diversity.py (registration-free) so q27's kind-union gate
# in queries_llm can compose its oracle without a module cycle;
# re-exported here as the composite's public home.
# --------------------------------------------------------------------------

from formula1_data_pipeline_spark.curation_diversity import (  # noqa: E402,F401
    DIVERSITY_K,
    DIVERSITY_SALT,
    PER_CELL,
    diversity_cte_body,
    diversity_downsample,
    diversity_downsample_oracle,
)
