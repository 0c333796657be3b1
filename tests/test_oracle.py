"""Mirror of the driver's t2 gate: every registered key vs its DuckDB oracle.

Parametrized over the live registry so newly registered operators are
covered automatically; keys without oracle SQL get a rows-only smoke run.
"""

from __future__ import annotations

import pytest

import upflow_spark  # noqa: F401

from tests.harness import run_key
from upflow_spark.registry import QUERIES


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_oracle_parity(spark, con, sf_dir, key):
    run_key(spark, con, key, sf_dir)
