"""Shared dtype guards — one definition so operators that require
integral inputs cannot drift on what counts as integral (two inline
copies appeared in round 10; a future widening, e.g. decimal(p,0),
now happens in exactly one place)."""

from __future__ import annotations

from pyspark.sql import DataFrame

INTEGRAL_DTYPES = {"tinyint", "smallint", "int", "bigint"}


def require_integral(df: DataFrame, cols: list[str], op: str,
                     hint: str = "") -> None:
    """Raise loudly when any of ``cols`` is missing or non-integral —
    the operators using this (bit interleaving, long-carrying folds)
    would otherwise silently truncate fractional values."""
    dts = dict(df.dtypes)
    for c in cols:
        if c not in dts:
            raise TypeError(f"{op}: column {c!r} not in {df.columns}")
        if dts[c] not in INTEGRAL_DTYPES:
            raise TypeError(
                f"{op}: column {c!r} must be an integral type "
                f"(got {dts[c]})" + (f"; {hint}" if hint else ""))
