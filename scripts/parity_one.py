"""Targeted oracle-parity check for a few queries at one or more SFs.

Round-14 optimization loop tooling: every optimized query re-proves
driver-style parity (rows+schema+hash) at sf0.001 and sf0.01 before
its change is kept — the full-sweep script re-runs all 100, this one
re-runs just the touched set.

    python scripts/parity_one.py q24 q39 [--sf /root/testdata/sf0.01]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from formula1_data_pipeline_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402
from tests.oracle_compare import compare_query  # noqa: E402

if __name__ == "__main__":
    args = sys.argv[1:]
    sfs = []
    picks = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sfs.append(next(it))
        else:
            picks.append(a)
    sfs = sfs or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark(app_name="parity_one")
    names = [n for n in entry.queries()
             if any(n.startswith(p.split("_")[0]) for p in picks)]
    bad = 0
    for sf_dir in sfs:
        for name in names:
            t0 = time.time()
            res = compare_query(spark, name, sf_dir)
            ok = bool(res["ok"])
            bad += (not ok)
            print(f"{sf_dir.rsplit('/', 1)[-1]} {name}: ok={ok} "
                  f"{time.time()-t0:.1f}s  {res['detail'][:120]}",
                  flush=True)
    sys.exit(1 if bad else 0)
