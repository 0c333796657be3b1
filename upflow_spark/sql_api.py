"""SQL-text entry point (SURVEY §3 EP2): run ANSI SQL over the fixture
tables. Views and DataFrame code converge at the analyzer, so operators can
be used from either surface interchangeably.

``register_views`` is idempotent per (session, sf_dir); views are plain temp
views over the loader DataFrames, so the events-ts normalization and session
fixups apply to SQL users too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from upflow_spark.io import TABLES, load


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)
