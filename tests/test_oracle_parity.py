"""Every catalog query must match its DuckDB oracle — the local clone
of the driver's t2 correctness gate (sf0.001 for speed; set
ORACLE_SF=0.01 to run at the driver's scale)."""

from __future__ import annotations

import os

import pytest

from formula1_data_pipeline_spark.queries import CATALOG
from tests.oracle_compare import compare_query

SF_DIR = f"/root/testdata/sf{os.environ.get('ORACLE_SF', '0.001')}"


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(spark, name):
    res = compare_query(spark, name, SF_DIR)
    assert res["ok"], f"{name}: {res['detail']}"
