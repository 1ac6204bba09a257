"""Unit tests for operators/lines.py — line-level corpus dedup
(CCNet paragraph dedup / C4 boilerplate removal). Cross-engine oracle
parity for the r10 gate lives in test_r10_gate_drafts.py; these pin
the operator semantics on hand-built corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.lines import (
    dedup_lines,
    top_boilerplate_lines,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "Subscribe Now\nalpha bravo\ncharlie delta"),
    (2, "  SUBSCRIBE NOW  \necho foxtrot"),  # edge-space/case variant
    (3, "golf hotel\nsubscribe now\nindia juliet"),
    (4, "kilo lima\n\nmike november"),  # blank separator line
    (5, "Subscribe Now"),  # becomes empty under keep='none'
]


def test_dedup_lines_drop_all(spark):
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup_lines(_docs(spark, CORPUS), min_docs=2).collect()
    }
    assert out[1]["text_clean"] == "alpha bravo\ncharlie delta"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    assert out[2]["text_clean"] == "echo foxtrot"
    assert out[3]["text_clean"] == "golf hotel\nindia juliet"
    # blank line is never counted, never removed
    assert out[4]["text_clean"] == "kilo lima\n\nmike november"
    assert out[4]["n_removed"] == 0
    # fully-boilerplate doc keeps its row with empty text
    assert out[5]["text_clean"] == "" and out[5]["n_kept"] == 0


def test_dedup_lines_keep_first(spark):
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup_lines(
            _docs(spark, CORPUS), min_docs=2, keep="first"
        ).collect()
    }
    # the (1, pos 0) occurrence is the corpus-wide minimum and survives
    assert out[1]["text_clean"] == (
        "Subscribe Now\nalpha bravo\ncharlie delta"
    )
    assert out[2]["text_clean"] == "echo foxtrot"
    assert out[3]["text_clean"] == "golf hotel\nindia juliet"
    assert out[5]["text_clean"] == ""


def test_dedup_lines_null_and_empty_text(spark):
    rows = [(1, None), (2, ""), (3, "only line")]
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup_lines(_docs(spark, rows), min_docs=2).collect()
    }
    assert out[1]["text_clean"] is None
    assert out[1]["n_lines"] == 0 and out[1]["n_removed"] == 0
    # empty text is ONE empty line, kept verbatim
    assert out[2]["text_clean"] == "" and out[2]["n_lines"] == 1
    assert out[2]["n_kept"] == 1
    assert out[3]["text_clean"] == "only line"


def test_dedup_lines_threshold(spark):
    out = {
        r["doc_id"]: r["text_clean"]
        for r in dedup_lines(_docs(spark, CORPUS), min_docs=5).collect()
    }
    # only 4 docs carry the boilerplate — below min_docs=5, all kept
    assert out[1] == "Subscribe Now\nalpha bravo\ncharlie delta"
    assert out[5] == "Subscribe Now"


def test_dedup_lines_bad_keep(spark):
    with pytest.raises(ValueError, match="keep"):
        dedup_lines(_docs(spark, CORPUS), keep="last")


def test_top_boilerplate_lines(spark):
    rows = CORPUS + [(6, "golf hotel\ngolf hotel")]  # intra-doc repeat
    got = top_boilerplate_lines(_docs(spark, rows), k=2).collect()
    assert [(r["line"], r["line_df"], r["n_occurrences"], r["rank"])
            for r in got] == [
        ("subscribe now", 4, 4, 1),
        ("golf hotel", 2, 3, 2),
    ]
