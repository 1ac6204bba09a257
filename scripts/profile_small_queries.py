"""Round-9 drift attribution probe (verdict item 2): decompose the
wall time of the small queries that drifted r7->r8 driver-to-driver
(q02 1.28->1.66, q03 0.78->1.07, q09 1.13->2.13, q14 2.77->4.07,
q31 1.88->2.52 s) into

  build   — Python-side DataFrame construction (py4j plan assembly,
            lazy operator imports on first call)
  exec1   — first noop execution (analysis + Janino compile + run)
  exec2   — second noop execution of a FRESH identical plan (warm
            JVM: codegen cache hits, interned plan machinery)

run under THE bench.py warmup (the function itself is imported from
bench.py, so the regimes cannot drift), in a fresh process.
exec1-exec2 approximates the per-plan cold cost (compile); exec2
approximates steady-state execution. Usage:

    python scripts/profile_small_queries.py [qNN ...]

DEFAULT = the queries the round-8 verdict flagged as drifted
(q02/q03/q09/q14/q31) plus q12 as a small always-fast control.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import warmup  # noqa: E402
from formula1_data_pipeline_spark.queries import CATALOG  # noqa: E402
from formula1_data_pipeline_spark.session import get_spark  # noqa: E402

DEFAULT = ["q02_union_dedup_priority", "q03_asof_join",
           "q09_sentinel_parse", "q12_window_filter",
           "q14_ingest_write_path", "q31_stream_windowed_agg"]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    picks = sys.argv[1:] or DEFAULT
    names = [n for n in sorted(CATALOG)
             if any(n.startswith(p.split("_")[0]) for p in picks)]
    try:
        load1 = round(os.getloadavg()[0], 2)
    except (OSError, AttributeError):
        load1 = None
    spark = get_spark(app_name="profile-small")
    warmup(spark, sf_dir)
    print(f"# loadavg={load1} sf_dir={sf_dir}")
    print(f"{'query':34s} {'build':>7s} {'exec1':>7s} {'exec2':>7s} "
          f"{'total1':>7s}")
    for name in names:
        spec = CATALOG[name]
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        # fresh identical plan: rebuilding isolates JVM-side caching
        # from Python-side construction
        df2 = spec.fn(spark, sf_dir)
        t3 = time.perf_counter()
        df2.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        print(f"{name:34s} {t1-t0:7.3f} {t2-t1:7.3f} {t4-t3:7.3f} "
              f"{t2-t0:7.3f}  (build2 {t3-t2:.3f})")


if __name__ == "__main__":
    main()
