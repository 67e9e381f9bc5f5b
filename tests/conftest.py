from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from pymfe_spark import get_spark

    s = get_spark(app_name="pymfe_spark_tests", cpus=16)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    from pymfe_spark.testing import duckdb_connect

    return duckdb_connect(SF_SMOKE)
