"""upflow-spark: PySpark-native analytics engine (SURVEY.md §2 contract)."""

from upflow_spark import registry
from upflow_spark.io import load, load_all
from upflow_spark.session import ensure_conf, get_spark

registry.load_all_modules()

QUERIES = registry.QUERIES
ORACLE = registry.ORACLE

__all__ = ["QUERIES", "ORACLE", "ensure_conf", "get_spark", "load", "load_all", "registry"]
