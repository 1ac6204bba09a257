"""Probe: run the 10 queries missing from CORRECTNESS_r02.json at
sf0.01 under the driver-style harness, timing each, to find out why
the driver dropped them (slow vs erroring)."""
from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from formula1_data_pipeline_spark.session import get_spark
from tests.oracle_compare import compare_query

MISSING = [
    "q30_multimodal_features",
    "q31_stream_windowed_agg",
    "q32_sessionization",
    "q35_stream_stateful_dedup",
    "q36_stream_merge_upsert",
    "q54_stream_static_join",
    "q55_multimodal_transform",
    "q60_levenshtein_pairs",
    "q61_quality_report",
    "q62_stream_stream_join",
]

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="gate_probe")
    t_all = time.time()
    for name in MISSING:
        t0 = time.time()
        try:
            res = compare_query(spark, name, sf_dir)
            print(f"{name}: {time.time()-t0:.2f}s ok={res['ok']} "
                  f"{res['detail'][:100]}", flush=True)
        except Exception:
            print(f"{name}: {time.time()-t0:.2f}s EXCEPTION", flush=True)
            traceback.print_exc()
    print(f"total {time.time()-t_all:.1f}s")
