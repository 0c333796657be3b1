from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("UPFLOW_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from upflow_spark.session import get_spark

    s = get_spark("upflow-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def con(sf_dir):
    from tests.harness import duckdb_connect

    c = duckdb_connect(sf_dir)
    yield c
    c.close()
