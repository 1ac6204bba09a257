"""Shared scale-probe harness (the SCALE.md method): warm-plan
best-of-N timing and the 10x union-with-shifted-ids corpus blowup.
One definition so the rep count and the id-shift constant cannot
drift between probe scripts."""
from __future__ import annotations

import time

from pyspark.sql import functions as F

ID_SHIFT = 10_000_000


def timed(label, fn, reps=2):
    best = None
    for _ in range(reps):  # warm-plan second pass is the number
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:52s} {best:7.2f}s (warm best of {reps})")
    return best


def blowup_10x(df, id_col: str = "doc_id"):
    """df unioned 10x with shifted ids — cache + count both sides
    yourself (probes cache 1x and 10x independently)."""
    out = df
    for i in range(9):
        out = out.unionByName(
            df.withColumn(
                id_col, F.col(id_col) + F.lit((i + 1) * ID_SHIFT))
        )
    return out
