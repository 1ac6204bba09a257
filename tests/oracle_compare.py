"""Local clone of the driver's DuckDB-oracle correctness gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count + column names +
order-insensitive canonical values — a strictly tougher check than any
reasonable hash, so passing here should pass the driver.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import numpy as np
import pandas as pd

from formula1_data_pipeline_spark.queries import CATALOG, TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def _cell(x) -> str:
    if x is None:
        return "␀"
    if isinstance(x, (np.floating, float)):
        f = float(x)
        return "␀" if math.isnan(f) else repr(f)
    if isinstance(x, (np.integer, int)) and not isinstance(x, bool):
        return str(int(x))
    if isinstance(x, (np.bool_, bool)):
        return str(bool(x))
    if isinstance(x, pd.Timestamp):
        return "␀" if pd.isna(x) else x.isoformat()
    if isinstance(x, (_dt.datetime, _dt.date)):
        return x.isoformat()
    if isinstance(x, bytes):
        return x.hex()
    if isinstance(x, (list, np.ndarray)):
        return "[" + ",".join(_cell(v) for v in x) + "]"
    if x is pd.NaT:
        return "␀"
    return str(x)


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(
        tuple(_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )


def driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    """The DRIVER's canonicalization shape: a raw pandas
    ``sort_values`` over every column, NO cell stringification —
    which factorizes object columns and THROWS ``TypeError:
    unhashable type`` on list/array/dict cells. Round 12's only red
    gate row (q24) was exactly this: the values matched under
    ``canon`` (which stringifies cells) while the driver's sort
    errored on a top-level ``array<double>`` column. Every catalog
    query's Spark output must survive this, so ``compare_query``
    probes it and the whole-catalog parity test inherits the check —
    no future rider can reintroduce a non-scalar gate column
    silently. (Gate rule: emit arrays as exploded scalar rows or a
    fixed-format string.)"""
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns))


def compare_query(spark, name: str, sf_dir: str) -> dict:
    """Returns {'ok': bool, 'detail': str} for one catalog entry."""
    spec = CATALOG[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    try:
        driver_canon(sdf)
    except TypeError as e:
        return {
            "ok": False,
            "detail": f"driver-canon unsafe (non-scalar column): {e}",
        }
    if spec.oracle is None:
        ok = len(sdf) >= 0  # rows-only check, mirrors the driver
        return {"ok": ok, "detail": f"rows-only: {len(sdf)} rows"}
    odf = run_oracle(spec.oracle, sf_dir)

    if sorted(sdf.columns) != sorted(odf.columns):
        return {
            "ok": False,
            "detail": f"schema mismatch: spark={sorted(sdf.columns)} "
                      f"oracle={sorted(odf.columns)}",
        }
    if len(sdf) != len(odf):
        return {"ok": False,
                "detail": f"row count: spark={len(sdf)} oracle={len(odf)}"}
    a, b = canon(sdf), canon(odf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return {"ok": False, "detail": f"value mismatch, first diffs: {diffs}"}
    return {"ok": True, "detail": f"{len(sdf)} rows match"}
