"""derive_floors.py retire/absorb interaction: a run absorbed, then
partially retired, must NOT be re-absorbed from a stale
bench_full.json (the resurrection hazard from the round-10 review)."""

import importlib.util
import json
import os
import sys


def _load_module():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "derive_floors.py",
    )
    spec = importlib.util.spec_from_file_location("derive_floors", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(value, q34, q35):
    return {
        "value": value,
        "loadavg_at_start": 0.1,
        "queries": {"q34_x": q34, "q35_y": q35},
    }


def _write(path, runs):
    json.dump(
        {
            "regime": "fresh_process",
            "sf": 0.1,
            "metric": "catalog_wall_seconds",
            "unit": "sec",
            "runs": runs,
        },
        open(path, "w"),
    )


def test_retire_then_absorb_does_not_resurrect(tmp_path, monkeypatch):
    mod = _load_module()
    prov = tmp_path / "bench_floor_provenance.json"
    full = tmp_path / "bench_full.json"
    monkeypatch.setattr(mod, "PROV", str(prov))
    monkeypatch.setattr(mod, "ROOT", str(tmp_path))

    run_a = _run(3.0, 1.0, 2.0)
    _write(prov, [run_a])
    _write(full, [run_a, _run(3.5, 1.2, 2.3)])

    # absorb once: run_a dedups (same content), the second run lands
    monkeypatch.setattr(sys, "argv", ["derive_floors.py", "--absorb"])
    mod.main()
    p = json.load(open(prov))
    assert len(p["runs"]) == 2
    assert all("run_id" in r for r in p["runs"])

    # retire q34 (its samples measured old work) ...
    monkeypatch.setattr(
        sys, "argv", ["derive_floors.py", "--retire", "q34_x"]
    )
    mod.main()
    p = json.load(open(prov))
    assert all("q34_x" not in r["queries"] for r in p["runs"])

    # ... then absorb the SAME stale bench_full.json again: the
    # mutated provenance copies no longer content-match, but the
    # run_id dedup must keep both originals out
    monkeypatch.setattr(sys, "argv", ["derive_floors.py", "--absorb"])
    mod.main()
    p = json.load(open(prov))
    assert len(p["runs"]) == 2, "retired runs were resurrected"
    assert all("q34_x" not in r["queries"] for r in p["runs"])
