"""connected_components operator: convergence, determinism, shapes."""

import pyspark.sql.functions as F
import pytest

from formula1_data_pipeline_spark.operators.cluster import (
    connected_components,
    neardup_clusters,
)


def _cc(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id: long")
    edges = spark.createDataFrame(
        edge_pairs or [(None, None)], "src: long, dst: long"
    )
    if not edge_pairs:
        edges = edges.filter(F.col("src").isNotNull())
    got = connected_components(nodes, edges)
    return {r["id"]: r["comp"] for r in got.collect()}


def test_chain_collapses_to_min(spark):
    # path graph 1-2-3-4-5-6-7-8: diameter 7, but pointer jumping should
    # still converge; every node labels to 1
    comp = _cc(spark, range(1, 9), [(i, i + 1) for i in range(1, 8)])
    assert comp == {i: 1 for i in range(1, 9)}


def test_components_and_singletons(spark):
    comp = _cc(spark, [1, 2, 3, 10, 11, 99], [(2, 1), (2, 3), (11, 10)])
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_edges_to_unlisted_nodes_dont_add_rows(spark):
    # labels come from the nodes frame; edge endpoints outside it can
    # still conduct (7 bridges 1 and 2) but don't appear in the output
    comp = _cc(spark, [1, 2], [(1, 7), (7, 2)])
    assert comp == {1: 1, 2: 1}


def test_conductor_fanout_does_not_fool_sum_probe(spark):
    """Regression (round-5 advice): with edge endpoints outside
    ``nodes`` the label table used to GROW between rounds, breaking the
    'sum strictly decreases until fixpoint' invariant behind the
    integral-id convergence probe — a chain 1-2-3-4-5 plus 7
    out-of-node neighbors of node 1 summed equal across two
    non-fixpoint rounds and returned nodes 4,5 labeled 2,3. Labels are
    now seeded with node ids UNION all edge endpoints so the set is
    fixed from round 0."""
    comp = _cc(
        spark,
        range(1, 6),
        [(i, i + 1) for i in range(1, 5)]
        + [(1, 100 + k) for k in range(1, 8)],
    )
    assert comp == {i: 1 for i in range(1, 6)}


def test_neardup_clusters_covers_all_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
            (3, "alpha beta gamma delta epsilon eta"),   # near dup
            (4, "totally different words entirely here now"),
        ],
        "doc_id: long, text: string",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in neardup_clusters(docs).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    # exact dups always share a cluster; doc 4 is alone
    assert got[1] == got[2]
    assert got[4][1] == 1 and got[4][0] == 4


def test_nonconvergence_raises(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "id: long")
    edges = spark.createDataFrame([(1, 2)], "src: long, dst: long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=0)


def test_deep_chain_converges_in_log_rounds(spark):
    """A 400-node path graph has diameter 399: plain min-label
    propagation needs ~400 rounds, pointer jumping ~log2(400)+c. Capping
    max_iter at 24 proves the doubling actually happens (regressing to
    plain propagation raises the non-convergence error), and the result
    is checked against a Python union-find on the same edges plus a
    random-graph overlay."""
    import random

    rnd = random.Random(20260814)
    n = 400
    edges = [(i, i + 1) for i in range(n - 1)]  # the deep chain
    extra = [(rnd.randrange(n, 2 * n), rnd.randrange(n, 2 * n))
             for _ in range(300)]  # random overlay on disjoint ids
    node_ids = list(range(2 * n))
    all_edges = edges + extra

    parent = list(range(2 * n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in all_edges:
        union(a, b)
    roots = {}
    for x in node_ids:
        roots.setdefault(find(x), []).append(x)
    expect = {x: min(members)
              for members in roots.values() for x in members}

    nodes = spark.createDataFrame([(i,) for i in node_ids], "id: long")
    e = spark.createDataFrame(all_edges, "src: long, dst: long")
    got = {
        r["id"]: r["comp"]
        for r in connected_components(nodes, e, max_iter=24).collect()
    }
    assert got == expect


def test_string_ids_converge_exactly(spark):
    """Regression (round-5 review): the numeric label-sum convergence
    probe is meaningless for string ids (non-ANSI cast -> NULL sum), so
    string-keyed graphs must use the exact changed-count path. A chain
    deep enough to need several propagation rounds proves the loop
    doesn't stop early with half-propagated labels."""
    ids = [f"doc-{i:02d}" for i in range(12)]
    nodes = spark.createDataFrame([(i,) for i in ids], "id: string")
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(11)], "src: string, dst: string"
    )
    got = {r["id"]: r["comp"]
           for r in connected_components(nodes, edges).collect()}
    assert got == {i: "doc-00" for i in ids}


def test_fractional_ids_converge_exactly(spark):
    """Regression (round-5 review): double ids route to the exact
    changed-count path — the decimal(38,0) sum probe ROUNDS fractional
    labels, and two different label states can sum equal (reproduced:
    a 4-node double-id chain converged one round early with a wrong
    label)."""
    ids = [2.5, 2.8, 3.1, 3.3]
    nodes = spark.createDataFrame([(i,) for i in ids], "id: double")
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(3)], "src: double, dst: double"
    )
    got = {r["id"]: r["comp"]
           for r in connected_components(nodes, edges).collect()}
    assert got == {i: 2.5 for i in ids}
