"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``upflow_spark.registry``: every operator from SURVEY.md §2
registers its Spark implementation and (where SQL-expressible) its DuckDB
oracle there; this file just re-exports the dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import upflow_spark  # noqa: F401 - triggers registry.load_all_modules()
from upflow_spark.registry import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["agg_groupby"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per key; omitted keys are rows-only ops."""
    return dict(ORACLE)
