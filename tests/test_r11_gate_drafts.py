"""Round-11 gate drafts — operators pre-staged in round 10 whose
catalog landings are deferred for gate-budget reasons (the catalog
sits AT the 100-entry / 50-row alternation ceiling: zero free rows
from round 11 on, so every new operator rides a CHANGED extension of
a query due in its landing round):

  * incremental BM25 index maintenance (``operators/retrieval.py``:
    ``bm25_index_append`` / ``bm25_index_compact`` /
    ``bm25_index_topk``) — the continuous-ingestion retrieval story:
    four manifest-txn tables (postings / doclen / df-delta-log /
    stats-delta-log), batches tokenize once and commit atomically,
    already-landed ids skip via one anti-join, query time is
    index-shaped (driver-known probe terms push into the parquet
    scans as IN-lists + manifest term-range pruning). LANDING ROUTE:
    rides q39's round-12 re-gate (q39 owns the BM25 surface and is
    r10-gated, due r12) as a third kind ('bm25_idx') whose rows must
    equal the live-scan kind's — or earlier via any due retrieval-
    adjacent query if the window allows.

Also already parity-proven and catalog-deferred from round 9 (their
drafts live in tests/test_r10_gate_drafts.py, kept green there):
``queries_curation.diversity_downsample`` (Composite #2 — rides a
due embeddings re-gate in r11: q27 or q89) and the standalone
lm/lines/selection/boilerplate-audit gates (their composites pin
them meanwhile).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

BM25_QUERIES = [
    ("q_scan", "scan column window"),
    ("q_join", "join merge hash sort"),
    ("q_miss", "zzznotaterm"),
]


def _index_from_batches(spark, docs, tmp):
    """Build the maintained index from three id-ranged batches, with
    batch 2 RE-DELIVERING half of batch 1 (the idempotence probe —
    re-delivered docs must be skipped, not double-counted)."""
    from formula1_data_pipeline_spark.operators.retrieval import (
        bm25_index_append,
    )

    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    b1, b2 = mx // 3, (2 * mx) // 3
    n1 = bm25_index_append(
        spark, docs.filter(F.col("doc_id") <= b1), tmp)
    # overlap: re-delivers (b1/2, b1] along with the new (b1, b2]
    n2 = bm25_index_append(
        spark,
        docs.filter((F.col("doc_id") > b1 // 2)
                    & (F.col("doc_id") <= b2)),
        tmp,
    )
    n3 = bm25_index_append(
        spark, docs.filter(F.col("doc_id") > b2), tmp)
    total = docs.filter(F.col("doc_id").isNotNull()).count()
    assert n1 + n2 + n3 == total, (n1, n2, n3, total)
    return tmp


def test_bm25_index_equals_live_scan_and_oracle(spark, tmp_path):
    """The maintained-index path must rank row-for-row identically to
    the live-scan bm25_topk over the same landed corpus (shared
    _rank_candidates math), and both must match the DuckDB BM25
    oracle — the exact SQL the q39 gate runs."""
    from formula1_data_pipeline_spark.operators.retrieval import (
        bm25_index_topk,
        bm25_topk,
    )
    from formula1_data_pipeline_spark.queries import load

    docs = load(spark, SF_DIR, "documents")["documents"]
    idx = _index_from_batches(spark, docs, str(tmp_path / "bm25idx"))
    qdf = spark.createDataFrame(BM25_QUERIES, ["query_id", "query_text"])

    got_idx = sorted(
        tuple(r) for r in bm25_index_topk(spark, idx, qdf, k=10).collect()
    )
    got_live = sorted(
        tuple(r) for r in bm25_topk(docs, qdf, k=10).collect()
    )
    assert got_idx == got_live

    values = ", ".join(f"('{q}', '{t}')" for q, t in BM25_QUERIES)
    toks = (r"list_filter(regexp_split_to_array(trim(lower(text)), "
            r"'\s+'), x -> x <> '')")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    oracle = f"""
    WITH t AS (
        SELECT doc_id, {toks} AS toks FROM documents
    ), tok AS (
        SELECT doc_id, unnest(toks) AS term FROM t
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
    ), dfreq AS (
        SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), stats AS (
        SELECT count(*) AS n_docs, sum(dl) AS n_tokens FROM dl
    ), q(query_id, query_text) AS (
        VALUES {values}
    ), qt AS (
        SELECT query_id,
               unnest(list_distinct(list_filter(
                   regexp_split_to_array(trim(lower(query_text)), '\\s+'),
                   x -> x <> ''))) AS term
        FROM q
    ), cand AS (
        SELECT qt.query_id, tf.doc_id, tf.tf, dfreq.df, dl.dl,
               s.n_docs, s.n_tokens
        FROM tf JOIN qt USING (term) JOIN dfreq USING (term)
        JOIN dl USING (doc_id) CROSS JOIN stats s
    ), scored AS (
        SELECT query_id, doc_id,
               CAST(count(*) AS BIGINT) AS n_terms_matched,
               sum(CAST(round(
                   (CAST(2 * n_docs - 2 * df + 1 AS DOUBLE)
                    * CAST(44 * tf * n_tokens AS DOUBLE))
                   / (CAST(2 * df + 1 AS DOUBLE)
                      * CAST(20 * tf * n_tokens + 18 * dl * n_docs
                             + 6 * n_tokens AS DOUBLE)),
                   6) AS DECIMAL(18,6))) AS score_dec
        FROM cand GROUP BY 1, 2
    )
    SELECT query_id, doc_id, n_terms_matched,
           CAST(score_dec AS DOUBLE) AS score,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score_dec DESC, doc_id
           ) AS INT) AS rank
    FROM scored QUALIFY rank <= 10
    """
    want = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert got_idx == want
    # non-degenerate: full pages for the real probes, none for q_miss
    from collections import Counter

    per_q = Counter(q for q, *_ in got_idx)
    assert per_q["q_scan"] == 10 and per_q["q_join"] == 10
    assert "q_miss" not in per_q


def test_bm25_index_compaction_invariant(spark, tmp_path):
    """Folding the delta logs must not change any ranking — readers
    always sum the deltas, compaction only bounds the log length."""
    from formula1_data_pipeline_spark.operators.retrieval import (
        bm25_index_compact,
        bm25_index_topk,
    )
    from formula1_data_pipeline_spark.queries import load
    from formula1_data_pipeline_spark.sources.txn import read_table

    docs = load(spark, SF_DIR, "documents")["documents"]
    idx = _index_from_batches(spark, docs, str(tmp_path / "bm25idx"))
    qdf = spark.createDataFrame(BM25_QUERIES, ["query_id", "query_text"])
    before = sorted(
        tuple(r) for r in bm25_index_topk(spark, idx, qdf, k=10).collect()
    )
    bm25_index_compact(spark, idx)
    after = sorted(
        tuple(r) for r in bm25_index_topk(spark, idx, qdf, k=10).collect()
    )
    assert before == after
    # the df log really folded: exactly one row per term now
    dfd = read_table(spark, f"{idx}/dfdelta")
    assert dfd.count() == dfd.select("term").distinct().count()
    # ... and the stats log folded to one row
    assert read_table(spark, f"{idx}/statsdelta").count() == 1


def test_bm25_index_query_scan_is_pruned(spark, tmp_path):
    """Query-time cost must be index-shaped: the probe terms reach
    the postings parquet scan as a pushed IN predicate (PushedFilters
    In(term, ...)), so only the probed terms' rows move."""
    from formula1_data_pipeline_spark.operators.retrieval import (
        bm25_index_topk,
    )
    from formula1_data_pipeline_spark.queries import load

    docs = load(spark, SF_DIR, "documents")["documents"]
    idx = _index_from_batches(spark, docs, str(tmp_path / "bm25idx"))
    qdf = spark.createDataFrame(BM25_QUERIES, ["query_id", "query_text"])
    df = bm25_index_topk(spark, idx, qdf, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term, [" in plan, plan


def test_bm25_index_empty_queries(spark, tmp_path):
    from formula1_data_pipeline_spark.operators.retrieval import (
        bm25_index_topk,
    )
    from formula1_data_pipeline_spark.queries import load

    docs = load(spark, SF_DIR, "documents")["documents"]
    idx = _index_from_batches(spark, docs, str(tmp_path / "bm25idx"))
    qdf = spark.createDataFrame(
        [("q_empty", "   ")], ["query_id", "query_text"])
    assert bm25_index_topk(spark, idx, qdf, k=10).count() == 0


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_TEXTS = ["scan column window", "join merge hash", "window scan",
          "merge sort spill", "scan scan scan column", ""]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(0, len(_TEXTS) - 1), min_size=4,
                max_size=12),
       st.integers(2, 4), st.data())
def test_bm25_index_split_invariance(spark, tmp_path_factory, idxs,
                                     n_batches, data):
    """Property: however the corpus is split into append batches —
    arbitrary membership, arbitrary batch order, arbitrary
    re-deliveries — the maintained index ranks identically to the
    live scan over the full corpus."""
    from formula1_data_pipeline_spark.operators.retrieval import (
        bm25_index_append,
        bm25_index_topk,
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [(i, _TEXTS[t]) for i, t in enumerate(idxs)],
        "doc_id long, text string",
    )
    assign = [data.draw(st.integers(0, n_batches - 1))
              for _ in idxs]
    idx = str(tmp_path_factory.mktemp("bm25prop") / "idx")
    order = data.draw(st.permutations(list(range(n_batches))))
    for b in order:
        ids = [i for i, a in enumerate(assign) if a == b]
        batch = docs.filter(docs.doc_id.isin(ids or [-1]))
        bm25_index_append(spark, batch, idx)
        if data.draw(st.booleans()):  # re-deliver: must be a no-op
            assert bm25_index_append(spark, batch, idx) == 0
    qdf = spark.createDataFrame(
        [("q1", "scan window"), ("q2", "merge")],
        ["query_id", "query_text"],
    )
    got = sorted(tuple(r) for r in
                 bm25_index_topk(spark, idx, qdf, k=5).collect())
    want = sorted(tuple(r) for r in
                  bm25_topk(docs, qdf, k=5).collect())
    assert got == want
