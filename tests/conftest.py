from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from formula1_data_pipeline_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def raw_tables(spark):
    from tests.fixtures_openf1 import build_raw_tables

    return build_raw_tables(spark)


@pytest.fixture(scope="session")
def built_models(spark, raw_tables):
    from formula1_data_pipeline_spark.plans.models import REGISTRY

    return REGISTRY.run(spark, raw_tables)


def sf_dir(sf: str = "0.001") -> str:
    return f"/root/testdata/sf{sf}"
