"""Model registry + topological executor — the dbt DAG, Spark-first.

The reference's pipeline is a dbt project: models are SQL files whose
``ref()`` edges form a DAG; staging/intermediate are views (inlined at
query time), marts are tables (materialized CTAS). See reference
``dags/formula1_elt_dag.py:40-58`` (run -> test -> snapshot) and
``dbt_project.yml:16-19``.

Spark equivalent implemented here:
- a *model* is a pure function ``dict[str, DataFrame] -> DataFrame``
  receiving its resolved refs/sources by name;
- ``materialized='view'`` == returning the lazy DataFrame (logical-plan
  composition; Catalyst inlines exactly like Snowflake inlined views);
- ``materialized='table'`` == the executor optionally persists the
  DataFrame and re-reads it, cutting the lineage — committed through
  the manifest protocol (``sources.txn``), so a mart rebuild publishes
  atomically and its manifest carries per-segment stats for
  ``read_table(prune=...)`` data skipping;
- execution order is a topo-sort over declared refs, mirroring
  ``dbt run``; assertions (``plans.assertions``) mirror ``dbt test``.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession

ModelFn = Callable[[Mapping[str, DataFrame]], DataFrame]


@dataclass(frozen=True)
class Model:
    name: str
    fn: ModelFn
    refs: tuple[str, ...] = ()        # upstream models
    sources: tuple[str, ...] = ()     # raw inputs (resolved externally)
    materialized: str = "view"        # 'view' | 'table' | 'incremental'
    incremental_key: str | None = None  # partition key for 'incremental'
    partition_key: str | None = None  # storage partitioning for 'table'
    stats_cols: tuple[str, ...] = ()  # manifest min/max stats ('table')


@dataclass
class ModelRegistry:
    """Holds models, resolves the DAG, executes in dependency order."""

    models: dict[str, Model] = field(default_factory=dict)

    def register(
        self,
        name: str,
        refs: tuple[str, ...] = (),
        sources: tuple[str, ...] = (),
        materialized: str = "view",
        incremental_key: str | None = None,
        partition_key: str | None = None,
        stats_cols: tuple[str, ...] = (),
    ) -> Callable[[ModelFn], ModelFn]:
        if materialized == "incremental" and not incremental_key:
            raise ValueError(
                f"incremental model {name!r} needs incremental_key"
            )

        def deco(fn: ModelFn) -> ModelFn:
            if name in self.models:
                raise ValueError(f"duplicate model {name!r}")
            self.models[name] = Model(name, fn, refs, sources, materialized,
                                      incremental_key, partition_key,
                                      stats_cols)
            return fn

        return deco

    def topo_order(self, targets: list[str] | None = None) -> list[str]:
        """Dependency-first order of the requested models (all by default)."""
        wanted = set(targets or self.models)
        # pull in transitive refs
        stack = list(wanted)
        while stack:
            m = self.models[stack.pop()]
            for r in m.refs:
                if r not in wanted:
                    wanted.add(r)
                    stack.append(r)
        ts = TopologicalSorter(
            {n: set(self.models[n].refs) for n in wanted}
        )
        return list(ts.static_order())

    def _build_one(
        self,
        spark: SparkSession,
        name: str,
        built: Mapping[str, DataFrame],
        materialize_to: str | None,
        materialize_all: bool,
    ) -> DataFrame:
        """Build (and optionally persist) one model from its resolved
        parents. Reads ``built`` only — safe to call from a worker
        thread once every ref/source entry is present."""
        model = self.models[name]
        missing = [s for s in model.sources if s not in built]
        if missing:
            raise KeyError(f"model {name!r} missing sources {missing}")
        df = model.fn(built)
        if materialize_to and model.materialized == "incremental":
            # dbt-incremental semantics, delete+insert strategy: the
            # caller feeds this run's source window; only the
            # incremental_key partitions present in the new batch
            # are replaced (txn_replace carries the rest forward by
            # reference), so repeated loads converge to the
            # full-rebuild state and re-running a window is
            # idempotent. Committed via the manifest protocol —
            # readers see each load atomically.
            from formula1_data_pipeline_spark.sources.txn import (
                read_table,
                txn_replace,
            )

            path = f"{materialize_to}/{name}"
            txn_replace(spark, df, path, key=model.incremental_key)
            df = read_table(spark, path)
        elif materialize_to and (
            materialize_all or model.materialized == "table"
        ):
            # Table marts commit through the manifest protocol, like
            # the incremental path above: publication is atomic (a
            # dashboard reading mid-rebuild sees the old mart or the
            # new one, never a mix — plain overwrite deletes then
            # rewrites in place), and the manifest carries per-segment
            # min/max stats for the model's declared ``stats_cols``,
            # so session/date-scoped consumer reads can skip segments
            # via ``read_table(prune=...)`` on top of the season
            # partition pruning.
            from formula1_data_pipeline_spark.sources.txn import (
                read_table,
                txn_overwrite,
            )

            path = f"{materialize_to}/{name}"
            cols = df.columns
            pk = model.partition_key
            pk_type = dict(df.dtypes).get(pk)
            scols = [c for c in model.stats_cols if c in cols] or None
            # Full overwrite, not txn_replace: a rebuild's output must
            # equal the build exactly — replace-by-key would carry
            # forward partitions (seasons) the new build no longer
            # produces (round-6 review finding). Keyed marts stay
            # storage-partitioned (SURVEY §4: marts by season_year),
            # so per-season consumer reads prune to one partition's
            # segments instead of scanning the table; read-back
            # restores the declared column order (the partition key
            # rides last otherwise), so materialized and lazy runs
            # expose identical schemas.
            # auto_vacuum: every rebuild supersedes the whole previous
            # mart, so without reclamation each REGISTRY.run leaves a
            # full extra copy on disk forever (round-6 ADVICE); the
            # AUTO_VACUUM_* age floor still protects concurrent
            # readers and recent time-travel.
            txn_overwrite(
                spark, df, path,
                key=pk if pk and pk in cols else None,
                stats_cols=scols,
                auto_vacuum=True,
            )
            out = read_table(spark, path)
            if pk and pk in cols:
                # read_table restores partition values as strings
                # (all-VARCHAR landing policy); marts keep the model's
                # declared type
                from pyspark.sql import functions as F

                out = out.withColumn(pk, F.col(pk).cast(pk_type))
            df = out.select(*cols)
        return df

    def run(
        self,
        spark: SparkSession,
        sources: Mapping[str, DataFrame],
        targets: list[str] | None = None,
        materialize_to: str | None = None,
        materialize_all: bool = False,
        register_views: bool = False,
        threads: int = 4,
    ) -> dict[str, DataFrame]:
        """Build every model (or the listed targets + upstreams).

        ``materialize_to``: optional directory; models declared
        ``materialized='table'`` are written there as parquet and read
        back (lineage cut == dbt CTAS). When None everything stays lazy,
        which is what tests and the oracle gate want.

        ``materialize_all``: with ``materialize_to``, persist EVERY
        model, not just the 'table' marts — each model then builds on
        its parents' parquet instead of their logical plans. Use when
        many downstream consumers will each trigger the DAG (e.g. the
        assertion runner's one-job-per-model checks), which would
        otherwise recompute the shared chain prefix per consumer.

        ``register_views``: opt-in ``createOrReplaceTempView(name)`` for
        each built model so ``spark.sql()`` users see the DAG. Off by
        default — it mutates session-global temp-view state and would
        silently clobber same-named views.

        ``threads``: concurrency for *materializing* runs, matching the
        reference's dbt ``threads: 4`` (``dbt/profiles.yml:13``) —
        independent DAG branches (the three staging->int legs, the
        three marts) persist concurrently; Spark's scheduler accepts
        jobs from multiple threads and runs them against the same
        executor pool. Lazy runs (``materialize_to=None``) only compose
        logical plans — no jobs to overlap — so they always take the
        serial path and are byte-identical to previous behavior.
        """
        built: dict[str, DataFrame] = dict(sources)
        order = self.topo_order(targets)

        if materialize_to is None or threads <= 1:
            for name in order:
                df = self._build_one(spark, name, built,
                                     materialize_to, materialize_all)
                built[name] = df
                if register_views:
                    df.createOrReplaceTempView(name)
            return {n: built[n] for n in order}

        ts = TopologicalSorter({n: set(self.models[n].refs) for n in order})
        ts.prepare()
        with ThreadPoolExecutor(max_workers=threads) as pool:
            running = {}
            while ts.is_active():
                for name in ts.get_ready():
                    running[pool.submit(
                        self._build_one, spark, name, built,
                        materialize_to, materialize_all,
                    )] = name
                done, _ = wait(running, return_when=FIRST_COMPLETED)
                for fut in done:
                    name = running.pop(fut)
                    df = fut.result()  # first failure propagates here
                    # only this coordinator thread mutates `built`;
                    # workers see their parents' entries via the
                    # happens-before of submit()
                    built[name] = df
                    if register_views:
                        df.createOrReplaceTempView(name)
                    ts.done(name)
        return {n: built[n] for n in order}
