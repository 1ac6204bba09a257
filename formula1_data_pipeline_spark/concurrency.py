"""Driver-thread overlap for independent gate legs (guide §2.6).

Several catalog gates build more than one independent artifact before
returning their lazy result frame (a batch-maintained index AND a
stream-maintained one; three unrelated streaming replays; two txn
table layouts). Each build is a chain of small sequential Spark jobs
— at bounded-replay scale the cluster is mostly idle while the
driver round-trips — so running the independent chains from a small
thread pool lets the scheduler back-fill: wall time drops from the
sum of the legs to roughly the max. Spark's scheduler is explicitly
multi-job-safe (FIFO across concurrently submitted jobs), q71/q92/
q96 have gated this shape since round 11, and the one piece of
session-global state the streaming legs touch (the scoped
shuffle-partition override) is reference-counted for exactly this
(streaming/confs.py).

``overlap`` is deliberately tiny: run the thunks, keep result order,
re-raise the first failure (after every thunk finished — a gate must
not leave a half-built index behind a raised exception, or a live
foreachBatch stream racing the test harness's scratch cleanup).
Each thunk gets a job-description label so the UI attributes jobs to
legs (guide §1.5; descriptions are thread-local).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Sequence

from pyspark.sql import SparkSession


def overlap(spark: SparkSession,
            legs: Sequence[tuple[str, Callable[[], Any]]]) -> list[Any]:
    """Run ``(label, thunk)`` legs concurrently; return results in
    input order. Raises the first leg's exception only after every
    leg has settled."""
    sc = spark.sparkContext

    def run(label: str, thunk: Callable[[], Any]) -> Any:
        sc.setJobDescription(label)
        try:
            return thunk()
        finally:
            sc.setJobDescription(None)

    with ThreadPoolExecutor(max_workers=max(1, len(legs))) as pool:
        futures = [pool.submit(run, label, thunk) for label, thunk in legs]
        results: list[Any] = []
        first_exc: BaseException | None = None
        for (label, _), f in zip(legs, futures):
            try:
                results.append(f.result())
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                results.append(None)
                if first_exc is None:
                    first_exc = exc
                else:
                    # secondary leg failures must not vanish — the
                    # root-cause leg may be a later one (round-14
                    # ADVICE); notes ride the raised exception
                    first_exc.add_note(
                        f"overlap: leg {label!r} also failed: "
                        f"{type(exc).__name__}: {exc}")
        if first_exc is not None:
            raise first_exc
    return results
