"""Connected components — duplicate-cluster resolution over a pair graph.

Pairwise near-dup operators (MinHash-LSH ``dedup.minhash_lsh_candidates``,
SimHash ``dedup.simhash_neardup_pairs``) emit *edges*; a real dedup
pipeline must then resolve their transitive closure into clusters and
pick one canonical document per cluster. The reference has no graph
surface (its dedup is single-hop ``row_number`` priority,
``dbt/models/intermediate/int_openf1_laps_all.sql:55-63``); this is part
of the mandated LLM-pipeline extension surface (SURVEY.md §2.12).

Algorithm: iterative **min-label propagation with pointer jumping**.
Each round every node takes the minimum label over itself and its
neighbors (one join + one groupBy = one shuffle each), then labels are
compressed by one pointer-jump (``comp <- label(comp)``), which is what
turns O(diameter) convergence into O(log n) rounds — the same doubling
trick as the Hash-to-Min / large-star-small-star family used for
web-scale clustering. State per round is one (id, comp) pair per node;
``localCheckpoint`` truncates lineage so plans don't grow with the
round count. At 100 TB: rounds are data-parallel shuffles on the node
id, the driver only evaluates the 1-row convergence probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    iter_shuffle_partitions: int | None = None,
) -> DataFrame:
    """Label every node with the minimum node id reachable through
    ``edges`` (undirected). Returns (id, comp); singleton nodes keep
    ``comp == id``. Deterministic: the fixpoint is the per-component
    minimum regardless of iteration order.

    ``iter_shuffle_partitions`` scopes the shuffle width of the
    iteration only: the label table is one (id, comp) pair per node —
    usually orders of magnitude smaller than the data that produced
    the edges — so its shuffles should be sized to the GRAPH, not to
    the session's data-scale default (32 partitions of a 4k-node
    table is pure task overhead; at 100 TB with billions of nodes the
    right number is large and this knob is how you set it).
    """
    from formula1_data_pipeline_spark.streaming.confs import (
        scoped_shuffle_partitions,
    )

    spark = nodes.sparkSession
    with scoped_shuffle_partitions(spark, iter_shuffle_partitions):
        sym = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .union(
                edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        node_ids = nodes.select(F.col(id_col).alias("id")).distinct()
        # Seed labels with node ids UNION all edge endpoints: endpoints
        # outside ``nodes`` ("conductors") still carry labels through the
        # graph, and seeding them up front FIXES the label set from round
        # 0. Without this the label table grows while conductors join via
        # the neighbor scatter, and the sum-convergence probe below is
        # unsound — a growing set can sum equal across two non-fixpoint
        # rounds (reproduced: chain 1-2-3-4-5 plus 7 out-of-node
        # neighbors of node 1 declared convergence with nodes 4,5 still
        # labeled 2,3). Conductors are dropped from the answer by the
        # final left_semi join against ``node_ids``.
        labels = (
            node_ids.union(sym.select(F.col("a").alias("id")))
            .distinct()
            .withColumn("comp", F.col("id"))
            .localCheckpoint(eager=False)
        )

        def step(lbl: DataFrame) -> DataFrame:
            # each node gathers its neighbors' current labels ...
            nbr = (
                sym.alias("e")
                .join(lbl.alias("l"), F.col("e.b") == F.col("l.id"))
                .select(
                    F.col("e.a").alias("id"), F.col("l.comp").alias("comp")
                )
            )
            # ... and keeps the minimum over {self} ∪ neighbors
            new = (
                lbl.select("id", "comp")
                .union(nbr)
                .groupBy("id")
                .agg(F.min("comp").alias("comp"))
            )
            # pointer jumping: follow the label's own label one step,
            # so label chains halve every round (O(log n) total rounds)
            return (
                new.alias("x")
                .join(
                    new.select(
                        F.col("id").alias("comp"),
                        F.col("comp").alias("comp2"),
                    ).alias("y"),
                    "comp",
                    "left",
                )
                .select(
                    "id",
                    F.coalesce(F.col("comp2"), F.col("comp")).alias("comp"),
                )
            )

        # Convergence scalar: labels only ever shrink (comp(x) <= x by
        # induction, and every update takes a min), so SUM(comp) strictly
        # decreases until the fixpoint and is constant exactly there.
        # Tracking it replaces the old per-round prev-label join + changed
        # count with a plain aggregate; decimal keeps the sum exact at any
        # node count / id magnitude. ONLY valid for INTEGRAL ids: a
        # string comp casts to NULL under the session's non-ANSI policy
        # (NULL == NULL would declare convergence after one step), and
        # fractional ids ROUND into decimal(38,0), so two different
        # label states can sum equal (observed: double ids converge one
        # round early with wrong labels). Everything non-integral keeps
        # the exact changed-row count against the previous labels (one
        # extra join per round, the pre-round-5 shape).
        # One step per driver round-trip either way: the step self-joins
        # its input (pointer jump), so chaining two steps lazily would
        # square the unresolved plan tree per trip — the Catalyst
        # analysis cost dwarfs the saved driver latency (measured: 17 s
        # vs 10 s cold for the q37 pipeline).
        from pyspark.sql.types import IntegralType

        integral_ids = isinstance(
            node_ids.schema["id"].dataType, IntegralType
        )
        if integral_ids:
            def probe_sum(lbl: DataFrame):
                return lbl.agg(
                    F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
                ).collect()[0]["s"]

            prev_sum = probe_sum(labels)  # also materializes the ckpt
            for _ in range(max_iter):
                # lazy checkpoint: the convergence probe right below is
                # the first action, so ONE job both materializes this
                # round's labels and computes the sum (an eager
                # checkpoint + separate probe costs a second job launch
                # per round)
                labels = step(labels).localCheckpoint(eager=False)
                cur_sum = probe_sum(labels)
                if cur_sum == prev_sum:
                    # edge endpoints outside ``nodes`` conduct labels
                    # through the graph but are not part of the answer
                    return labels.join(node_ids, "id", "left_semi")
                prev_sum = cur_sum
        else:
            for _ in range(max_iter):
                stepped = (
                    step(labels)
                    .join(
                        labels.select(
                            "id", F.col("comp").alias("prev_comp")
                        ),
                        "id", "left",
                    )
                    .select(
                        "id", "comp",
                        (
                            F.col("prev_comp").isNull()
                            | (F.col("comp") != F.col("prev_comp"))
                        ).alias("chg"),
                    )
                    .localCheckpoint(eager=False)
                )
                changed = (
                    stepped.agg(F.sum(F.col("chg").cast("int")).alias("n"))
                    .collect()[0]["n"] or 0
                )
                labels = stepped.drop("chg")
                if changed == 0:
                    return labels.join(node_ids, "id", "left_semi")
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def neardup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_distance: int = 3,
    iter_shuffle_partitions: int | None = 8,
) -> DataFrame:
    """End-to-end near-dup clustering: SimHash sketches → pigeonhole
    candidate pairs (hamming ≤ ``max_distance``) → connected components
    over {doc → its sketch-group canonical} ∪ {canonical ↔ canonical}
    edges. Returns (doc_id, cluster_id, cluster_size) where
    ``cluster_id`` is the minimum doc_id of the cluster — the canonical
    document a keep-one dedup would retain.
    """
    from formula1_data_pipeline_spark.operators.dedup import (
        simhash_df,
        simhash_group_pairs,
    )

    # sketch once (localCheckpoint: the 60-aggregate tree is the
    # expensive part, and both the group table and the doc mapping
    # read it), then run CC over the *canonical group graph* only —
    # nodes are distinct sketches, orders of magnitude fewer than docs
    # on a duplicate-heavy corpus; docs rejoin through their canonical.
    sim = simhash_df(docs, text_col, id_col).localCheckpoint()
    groups = (
        sim.groupBy("simhash")
        .agg(F.min("id").alias("canonical_id"), F.count("*").alias("n_docs"))
        .localCheckpoint()
    )
    pair = simhash_group_pairs(groups, max_distance=max_distance).select(
        F.col("a_canonical_id").alias("src"),
        F.col("b_canonical_id").alias("dst"),
    )
    # iteration shuffles are sized to the canonical-group graph (a few
    # thousand nodes locally), not the corpus — see connected_components
    cc = connected_components(
        groups.select(F.col("canonical_id").alias("id")),
        pair,
        iter_shuffle_partitions=iter_shuffle_partitions,
    )
    # min doc id of a cluster == min over its canonicals (each canonical
    # is already the min of its sketch group), so comp is the cluster id
    docmap = sim.join(groups.select("simhash", "canonical_id"), "simhash")
    return (
        docmap.join(
            cc.withColumnRenamed("id", "canonical_id"), "canonical_id"
        )
        .select(
            F.col("id").alias(id_col),
            F.col("comp").alias("cluster_id"),
        )
        .withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("cluster_id")),
        )
    )
