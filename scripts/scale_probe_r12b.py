"""Round-12 shared-scan A/B (verdict item #3): the kind-union gate
queries q65/q64/q84/q18 read the documents/events base more than once
(one read per kind leg). Measure the status quo against a shared
eager localCheckpoint of the base table across legs.

Mechanism for the B arm: `queries.load` is wrapped so the SAME
(sf_dir, table) frame is localCheckpointed once and reused by every
leg — exactly what an explicit persist inside the query would do,
without forking the query code for the experiment. Checkpoint
storage is released between queries.

Run fresh-process per arm (the bench discipline):
    python scripts/scale_probe_r12b.py A   # status quo
    python scripts/scale_probe_r12b.py B   # shared checkpoint
Numbers land in SCALE.md round-12 section; the cheaper form ships.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

QUERIES = ["q65_repetition_filter", "q64_sequence_packing",
           "q84_document_chunking", "q18_importance_resample"]
SF = "/root/testdata/sf0.1"


def main() -> None:
    arm = sys.argv[1] if len(sys.argv) > 1 else "A"
    from formula1_data_pipeline_spark import get_spark
    from formula1_data_pipeline_spark import queries as Q

    spark = get_spark()
    if arm == "B":
        orig_load = Q.load
        cache: dict = {}

        def shared_load(spark_, sf_dir, *tables):
            out = {}
            for t in tables:
                key = (sf_dir, t)
                if key not in cache:
                    cache[key] = orig_load(spark_, sf_dir, t)[t] \
                        .localCheckpoint(eager=True)
                out[t] = cache[key]
            return out

        Q.load = shared_load
        for mod in ("queries_datapipe", "queries_llm",
                    "queries_analytics", "queries_curation"):
            m = __import__(f"formula1_data_pipeline_spark.{mod}",
                           fromlist=["load"])
            if hasattr(m, "load"):
                m.load = shared_load

    # warm the generic machinery once, untimed
    spark.range(10).groupBy().count().collect()
    for name in QUERIES:
        t0 = time.perf_counter()
        Q.CATALOG[name].fn(spark, SF).write.format("noop") \
            .mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{arm} {name}: {dt:6.2f}s", flush=True)
        if arm == "B":
            for df in list(cache.values()):
                df.unpersist()
            cache.clear()


if __name__ == "__main__":
    main()
