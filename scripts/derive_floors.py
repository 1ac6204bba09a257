"""Floor re-derivation: rebuild bench_baseline.json's per-query
floors from the committed fresh-process floor-provenance record.

Floor statistic (round 10): per-query MINIMUM across the recorded
runs when the run-to-run spread is small, per-query MEDIAN when the
spread exceeds ``SPREAD_CUTOFF`` (max/min > 1.8 across provenance
runs). Rationale (round-9 verdict, q91 adjudication): a minimum is
biased low exactly for the highest-variance queries — the deepest
shuffle chains swing 3.6-9.7 s on identical code purely by host
state, so gating a single driver sample at 2x of a lucky minimum
arms a tripwire no typical run can pass. The median of fresh-process
runs is the honest "reproducible capability" for those queries; the
minimum stays the statistic everywhere variance is low (most of the
catalog spreads < 1.3x).

Only ``regime == "fresh_process"`` records are accepted — warm-JVM
repeat minima are banned as floor sources (round-8 verdict item 1:
runs 2..N inside one warm session measured cached-plan cost a fresh
driver run can never reach, arming ten false 2x breaches).

Provenance lives in ``bench_floor_provenance.json`` (round-9 split):
``bench_full.json`` is rewritten by EVERY plain full-catalog
``bench.py`` invocation — including the driver's own per-round run —
so the auditable record backing the committed floors cannot live in
a file the harness clobbers. bench_full.json is the latest-run
scratch sidecar; the provenance file changes only through this
script.

Usage: python scripts/derive_floors.py [--retire a,b] [--absorb]
                                       [--write]
  --retire q1,q2  drop the named queries' samples from the EXISTING
                  provenance runs first — required when a query's
                  implementation changed (its old samples measured
                  different work; a floor min'd across them would be
                  falsely low for grown queries). Recorded in the
                  provenance's retired_log.
  --absorb        fold bench_full.json's current run set into the
                  provenance file. Refuses non-fresh records, and
                  (round-9 ADVICE) VALIDATES each absorbed run
                  against the provenance: same sf, same metric/unit,
                  and a query-name set covering every name the
                  provenance knows (catalog growth adds names — ok,
                  noted; a filtered/subset run is refused).
  --write         update bench_baseline.json floors from the
                  provenance
Without flags, prints the would-be floors and the per-run spread.
"""
from __future__ import annotations

import hashlib
import json
import os
import statistics
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROV = os.path.join(ROOT, "bench_floor_provenance.json")

#: max/min spread across provenance runs beyond which the floor
#: statistic switches from min to median (see module docstring)
SPREAD_CUTOFF = 1.8


def _load(path):
    with open(path) as f:
        full = json.load(f)
    if full.get("regime") != "fresh_process":
        sys.exit(f"{os.path.basename(path)} is not a fresh_process "
                 "record — warm-JVM minima are banned as floor sources")
    return full


def _arg_value(flag: str) -> str | None:
    for i, a in enumerate(sys.argv):
        if a == flag and i + 1 < len(sys.argv):
            return sys.argv[i + 1]
        if a.startswith(flag + "="):
            return a.split("=", 1)[1]
    return None


def _run_id(r) -> str:
    """Stable identity of a provenance run: md5 of its content at
    ABSORB time, stored on the record. Dedup by this id, not by exact
    JSON — --retire mutates absorbed runs' query maps, and a
    content-equality check would then re-absorb the ORIGINAL record
    from a stale bench_full.json, resurrecting the very samples
    retirement dropped and double-counting the run (round-10 review
    finding). Legacy runs absorbed before ids existed get one
    backfilled from current content; a legacy run retired BEFORE the
    backfill cannot be matched to its original — the residual hazard
    is only stale pre-id bench_full.json files, noted in the absorb
    output."""
    rr = {k: v for k, v in r.items() if k != "run_id"}
    return hashlib.md5(
        json.dumps(rr, sort_keys=True).encode()
    ).hexdigest()[:12]


def _validate_absorb(prov, latest) -> None:
    """Round-9 ADVICE: an absorbed run set from a different scale
    factor, metric, or a filtered catalog would silently skew the
    per-query floors — refuse instead."""
    for field in ("sf", "metric", "unit"):
        if latest.get(field) != prov.get(field):
            sys.exit(f"refusing --absorb: bench_full.json {field}="
                     f"{latest.get(field)!r} != provenance "
                     f"{field}={prov.get(field)!r}")
    known = {n for r in prov["runs"] for n in r["queries"]}
    for i, r in enumerate(latest["runs"]):
        names = set(r["queries"])
        missing = known - names
        if missing:
            sys.exit(f"refusing --absorb: run {i} is missing "
                     f"{len(missing)} provenance queries (filtered/"
                     f"subset run?): {sorted(missing)[:5]}...")
        extra = names - known
        if extra:
            print(f"note: run {i} adds {len(extra)} new quer"
                  f"{'y' if len(extra) == 1 else 'ies'} to the "
                  f"provenance: {sorted(extra)}")


def main():
    prov = _load(PROV)

    retire = _arg_value("--retire")
    if retire:
        names = [n.strip() for n in retire.split(",") if n.strip()]
        dropped = 0
        for r in prov["runs"]:
            for n in names:
                if n in r["queries"]:
                    del r["queries"][n]
                    dropped += 1
        prov.setdefault("retired_log", []).append({
            "queries": names, "samples_dropped": dropped,
        })
        # runs left with no samples carry no information
        prov["runs"] = [r for r in prov["runs"] if r["queries"]]
        with open(PROV, "w") as f:
            json.dump(prov, f, indent=1, sort_keys=True)
        print(f"retired {dropped} sample(s) of {names} from the "
              "provenance (old samples measured different work)")

    if "--absorb" in sys.argv:
        latest = _load(os.path.join(ROOT, "bench_full.json"))
        _validate_absorb(prov, latest)
        for r in prov["runs"]:  # backfill ids on legacy records
            r.setdefault("run_id", _run_id(r))
        known_ids = {r["run_id"] for r in prov["runs"]}
        new = []
        for r in latest["runs"]:
            rid = _run_id(r)
            if rid in known_ids:
                continue
            new.append({**r, "run_id": rid})
            known_ids.add(rid)
        prov["runs"].extend(new)
        with open(PROV, "w") as f:
            json.dump(prov, f, indent=1, sort_keys=True)
        print(f"absorbed {len(new)} new run(s) into "
              f"bench_floor_provenance.json ({len(prov['runs'])} "
              "total; dedup is by run_id, so a previously absorbed "
              "run stays out even after --retire edited its samples)")

    runs = prov["runs"]
    names = sorted({n for r in runs for n in r["queries"]})
    floors = {}
    print(f"# {len(runs)} fresh-process runs, loadavgs "
          f"{[r['loadavg_at_start'] for r in runs]}")
    print(f"{'query':36s} {'floor':>7s} {'min':>7s} {'max':>7s} "
          f"{'spread':>7s} {'stat':>6s} {'n':>3s}")
    worst = 0.0
    for n in names:
        ts = [r["queries"][n] for r in runs if n in r["queries"]]
        ratio = max(ts) / min(ts) if min(ts) > 0 else float("inf")
        worst = max(worst, ratio)
        if ratio > SPREAD_CUTOFF and len(ts) >= 3:
            floors[n] = round(statistics.median(ts), 3)
            stat = "median"
        else:
            floors[n] = min(ts)
            stat = "min"
        flag = "  <-- spread >2x" if ratio > 2 else ""
        print(f"{n:36s} {floors[n]:7.3f} {min(ts):7.3f} {max(ts):7.3f} "
              f"{ratio:7.2f} {stat:>6s} {len(ts):3d}{flag}")
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
