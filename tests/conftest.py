from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_DRIVER_MEM", "4g")


@pytest.fixture(scope="session")
def spark():
    from etl_jetro_spark.session import get_spark

    s = get_spark(app_name="etl-jetro-tests", shuffle_partitions=4)
    yield s


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def rows(df, *cols):
    """Collect to a sorted list of tuples for order-insensitive assertions."""
    sel = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in sel.collect())
