"""Lexical-diversity tier (operators/text.py::lexical_diversity_df /
token_entropy_df) — hand-computed values, zero-token retention,
degenerate distributions, and the entropy/Simpson relationship."""
from __future__ import annotations

import math

from pyspark.sql import functions as F  # noqa: F401

from formula1_data_pipeline_spark.operators.text import (
    lexical_diversity_df,
    token_entropy_df,
)


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, "a a a b"),          # n=4 types=2 c2=10 max=3
            (2, "x y z w"),          # uniform: simpson = 1 - 4/16
            (3, "only"),             # single token
            (4, "   "),              # zero tokens after trim
            (5, "rep rep rep rep"),  # fully degenerate
        ],
        "doc_id long, text string",
    )


def test_hand_computed_values(spark):
    out = {r.doc_id: r for r in lexical_diversity_df(_frame(spark)).collect()}
    r1 = out[1]
    assert (r1.n_tokens_lex, r1.n_types) == (4, 2)
    assert r1.ttr == 0.5
    assert r1.simpson_diversity == 1.0 - 10.0 / 16.0
    assert r1.top_token_ratio == 0.75
    assert out[2].simpson_diversity == 0.75
    assert out[2].ttr == 1.0
    assert out[3].simpson_diversity == 0.0 and out[3].ttr == 1.0
    assert out[5].simpson_diversity == 0.0
    assert out[5].top_token_ratio == 1.0


def test_zero_token_doc_is_kept(spark):
    out = {r.doc_id: r for r in lexical_diversity_df(_frame(spark)).collect()}
    assert 4 in out
    r = out[4]
    assert (r.n_tokens_lex, r.n_types) == (0, 0)
    assert (r.ttr, r.simpson_diversity, r.top_token_ratio) == (0.0, 0.0, 0.0)


def test_entropy_matches_math(spark):
    """token_entropy is the libm path (never gated) — pytest pins it
    against the direct formula instead."""
    ent = {r.doc_id: r.token_entropy
           for r in token_entropy_df(_frame(spark)).collect()}
    expect1 = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert abs(ent[1] - expect1) < 1e-12
    assert abs(ent[2] - 2.0) < 1e-12       # uniform over 4 -> 2 bits
    assert ent[3] == 0.0 and ent[5] == 0.0
    assert 4 not in ent                    # zero-token: no distribution


def test_diversity_orders_agree(spark):
    """Simpson (gate-safe) and Shannon (libm) must rank these docs
    identically — the substitution argument for the no-libm gate."""
    docs = _frame(spark)
    lex = {r.doc_id: r.simpson_diversity
           for r in lexical_diversity_df(docs).collect()}
    ent = {r.doc_id: r.token_entropy
           for r in token_entropy_df(docs).collect()}
    ids = sorted(ent)  # docs with a distribution
    assert sorted(ids, key=lambda i: lex[i]) == sorted(
        ids, key=lambda i: ent[i])
