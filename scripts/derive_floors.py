"""Round-9 floor re-derivation: rebuild bench_baseline.json from the
committed bench_full.json, which (as of round 9) records ONLY
fresh-process runs. Floor = per-query minimum across the recorded
runs. Refuses to run on a pre-round-9 sidecar (no fresh_process
regime marker) — warm-JVM repeat minima are banned as floor sources
(round-8 verdict item 1).

Usage: python scripts/derive_floors.py [--write]
Without --write, prints the would-be floors and the per-run spread.
"""
from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    with open(os.path.join(ROOT, "bench_full.json")) as f:
        full = json.load(f)
    if full.get("regime") != "fresh_process":
        sys.exit("bench_full.json is not a fresh_process record — "
                 "re-run bench.py (round-9 regime) first")
    runs = full["runs"]
    names = sorted({n for r in runs for n in r["queries"]})
    floors = {}
    print(f"# {len(runs)} fresh-process runs, loadavgs "
          f"{[r['loadavg_at_start'] for r in runs]}")
    print(f"{'query':36s} {'floor':>7s} {'max':>7s} {'max/floor':>9s}")
    worst = 0.0
    for n in names:
        ts = [r["queries"][n] for r in runs if n in r["queries"]]
        floors[n] = min(ts)
        ratio = max(ts) / min(ts) if min(ts) > 0 else float("inf")
        worst = max(worst, ratio)
        flag = "  <-- spread >2x" if ratio > 2 else ""
        print(f"{n:36s} {min(ts):7.3f} {max(ts):7.3f} {ratio:9.2f}{flag}")
    total_floor = sum(floors.values())
    print(f"\nsum(floors) = {total_floor:.1f}s; per-run totals "
          f"{[r['value'] for r in runs]}; worst per-query spread "
          f"{worst:.2f}x")
    if "--write" not in sys.argv:
        print("\n(dry run — pass --write to update bench_baseline.json)")
        return
    base_path = os.path.join(ROOT, "bench_baseline.json")
    with open(base_path) as f:
        base = json.load(f)
    base["queries"] = {n: floors[n] for n in names}
    with open(base_path, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(f"wrote {len(floors)} floors to bench_baseline.json "
          "(edit _comment to document the re-base)")


if __name__ == "__main__":
    main()
