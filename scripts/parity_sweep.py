"""Full-catalog oracle-parity sweep at a given SF dir.

Runs every catalog query through the driver-style compare
(tests/oracle_compare.compare_query) and writes a JSON report:

    python scripts/parity_sweep.py /root/testdata/sf0.01 parity_sf001_r11.json
"""
from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from formula1_data_pipeline_spark.session import get_spark
import __spark_entry__ as entry
from tests.oracle_compare import compare_query

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "parity_sweep.json"
    spark = get_spark(app_name="parity_sweep")
    names = list(entry.queries().keys())
    report: dict[str, dict] = {}
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            res = compare_query(spark, name, sf_dir)
            report[name] = {
                "ok": bool(res["ok"]),
                "detail": res["detail"][:200],
                "sec": round(time.time() - t0, 2),
            }
            print(f"{name}: ok={res['ok']} {time.time()-t0:.1f}s", flush=True)
        except Exception as exc:  # keep sweeping; record the failure
            report[name] = {
                "ok": False,
                "detail": f"EXCEPTION {exc!r}"[:200],
                "sec": round(time.time() - t0, 2),
            }
            traceback.print_exc()
    n_ok = sum(1 for r in report.values() if r["ok"])
    report["_summary"] = {
        "ok": n_ok,
        "total": len(names),
        "sec": round(time.time() - t_all, 1),
        "sf_dir": sf_dir,
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(f"SWEEP {n_ok}/{len(names)} green in {time.time()-t_all:.0f}s -> {out_path}", flush=True)
