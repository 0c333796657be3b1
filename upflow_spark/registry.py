"""Query/oracle registry — the single source of the graded surface.

Every operator from SURVEY.md §2 registers here via the :func:`query`
decorator: the Spark implementation (``(spark, sf_dir) -> DataFrame``) and,
unless the op is genuinely non-SQL-expressible, the equivalent DuckDB ANSI
SQL. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
these dicts, and ``tests/test_oracle.py`` mirrors the driver's comparison
over the same registry.

Parity conventions enforced by convention in every registered pair
(SURVEY.md §2 header): identical aliases on both sides, float aggregates
rounded to 4dp on both sides, events timestamps compared at µs precision.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a graded query; ``oracle=None`` ⇒ driver does rows-only."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE[key] = oracle
        return fn

    return deco


def load_all_modules() -> None:
    """Import every operator module so registration side effects run."""
    # local import to avoid cycles at package import time
    import upflow_spark.functions.arrays  # noqa: F401
    import upflow_spark.functions.breadth  # noqa: F401
    import upflow_spark.functions.breadth2  # noqa: F401
    import upflow_spark.functions.breadth3  # noqa: F401
    import upflow_spark.functions.breadth4  # noqa: F401
    import upflow_spark.functions.breadth5  # noqa: F401
    import upflow_spark.functions.datetime  # noqa: F401
    import upflow_spark.functions.json_props  # noqa: F401
    import upflow_spark.functions.math  # noqa: F401
    import upflow_spark.functions.modern  # noqa: F401
    import upflow_spark.functions.scalar_ext  # noqa: F401
    import upflow_spark.functions.strings  # noqa: F401
    import upflow_spark.operators.aggregates  # noqa: F401
    import upflow_spark.operators.events_ext  # noqa: F401
    import upflow_spark.operators.analytics  # noqa: F401
    import upflow_spark.operators.geo  # noqa: F401
    import upflow_spark.operators.grouped_pandas  # noqa: F401
    import upflow_spark.operators.grouping_ext  # noqa: F401
    import upflow_spark.operators.joins  # noqa: F401
    import upflow_spark.operators.mining  # noqa: F401
    import upflow_spark.operators.misc_surfaces  # noqa: F401
    import upflow_spark.operators.projection  # noqa: F401
    import upflow_spark.operators.quantiles2  # noqa: F401
    import upflow_spark.operators.reshape  # noqa: F401
    import upflow_spark.operators.scale_patterns  # noqa: F401
    import upflow_spark.operators.setops  # noqa: F401
    import upflow_spark.operators.sortlimit  # noqa: F401
    import upflow_spark.operators.sql_surfaces  # noqa: F401
    import upflow_spark.operators.stats_ext  # noqa: F401
    import upflow_spark.operators.timeseries2  # noqa: F401
    import upflow_spark.operators.tpch_shapes  # noqa: F401
    import upflow_spark.operators.tpch_shapes2  # noqa: F401
    import upflow_spark.operators.upsert  # noqa: F401
    import upflow_spark.operators.windows  # noqa: F401
    import upflow_spark.pipeline.ann_ivf  # noqa: F401
    import upflow_spark.pipeline.billing  # noqa: F401
    import upflow_spark.pipeline.bpe  # noqa: F401
    import upflow_spark.pipeline.chunking  # noqa: F401
    import upflow_spark.pipeline.cluster  # noqa: F401
    import upflow_spark.pipeline.pca  # noqa: F401
    import upflow_spark.pipeline.curation  # noqa: F401
    import upflow_spark.pipeline.curation2  # noqa: F401
    import upflow_spark.pipeline.dedup  # noqa: F401
    import upflow_spark.pipeline.entity  # noqa: F401
    import upflow_spark.pipeline.graph  # noqa: F401
    import upflow_spark.pipeline.llmprep  # noqa: F401
    import upflow_spark.pipeline.retrieval  # noqa: F401
    import upflow_spark.pipeline.minhash_sql  # noqa: F401
    import upflow_spark.pipeline.multimodal  # noqa: F401
    import upflow_spark.pipeline.sampling  # noqa: F401
    import upflow_spark.pipeline.similarity  # noqa: F401
    import upflow_spark.pipeline.substring  # noqa: F401
    import upflow_spark.pipeline.text  # noqa: F401
    import upflow_spark.pipeline.textstats  # noqa: F401
    import upflow_spark.pipeline.unigram  # noqa: F401
    import upflow_spark.sources.bloomidx  # noqa: F401
    import upflow_spark.sources.bucketed  # noqa: F401
    import upflow_spark.sources.manifest  # noqa: F401
    import upflow_spark.sources.python_ds  # noqa: F401
    import upflow_spark.sources.scans  # noqa: F401
    import upflow_spark.sources.sinks  # noqa: F401
    import upflow_spark.sources.text_formats  # noqa: F401
    import upflow_spark.streaming.py_stream_source  # noqa: F401
    import upflow_spark.streaming.stateful  # noqa: F401
    import upflow_spark.streaming.streams  # noqa: F401
