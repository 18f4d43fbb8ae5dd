from __future__ import annotations

import pytest

from zip_to_parquet_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("zip-to-parquet-spark-tests")
    yield s
    # Leave the session running for the whole pytest process; stopping and
    # restarting a JVM per test module costs ~10s each.


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
