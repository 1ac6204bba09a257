"""Floor re-derivation: rebuild bench_baseline.json's per-query
floors from the committed fresh-process floor-provenance record.

Floor = per-query minimum across the recorded runs. Only
``regime == "fresh_process"`` records are accepted — warm-JVM repeat
minima are banned as floor sources (round-8 verdict item 1: runs
2..N inside one warm session measured cached-plan cost a fresh
driver run can never reach, arming ten false 2x breaches).

Provenance lives in ``bench_floor_provenance.json`` (round-9 split):
``bench_full.json`` is rewritten by EVERY plain full-catalog
``bench.py`` invocation — including the driver's own per-round run —
so the auditable record backing the committed floors cannot live in
a file the harness clobbers. bench_full.json is the latest-run
scratch sidecar; the provenance file changes only through this
script.

Usage: python scripts/derive_floors.py [--absorb] [--write]
  --absorb  fold bench_full.json's current run set into the
            provenance file first (refuses non-fresh records)
  --write   update bench_baseline.json floors from the provenance
Without flags, prints the would-be floors and the per-run spread.
"""
from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROV = os.path.join(ROOT, "bench_floor_provenance.json")


def _load(path):
    with open(path) as f:
        full = json.load(f)
    if full.get("regime") != "fresh_process":
        sys.exit(f"{os.path.basename(path)} is not a fresh_process "
                 "record — warm-JVM minima are banned as floor sources")
    return full


def main():
    prov = _load(PROV)
    if "--absorb" in sys.argv:
        latest = _load(os.path.join(ROOT, "bench_full.json"))
        known = {json.dumps(r, sort_keys=True) for r in prov["runs"]}
        new = [r for r in latest["runs"]
               if json.dumps(r, sort_keys=True) not in known]
        prov["runs"].extend(new)
        with open(PROV, "w") as f:
            json.dump(prov, f, indent=1, sort_keys=True)
        print(f"absorbed {len(new)} new run(s) into "
              f"bench_floor_provenance.json ({len(prov['runs'])} total)")
    runs = prov["runs"]
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
