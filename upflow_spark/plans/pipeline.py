"""Thin declarative pipeline runner (SURVEY §4's architectural conclusion:
no custom plan nodes — an operator library of ``DataFrame -> DataFrame``
stages plus this composer IS the engine).

A Pipeline is an ordered list of named stages. Composition stays lazy — the
whole pipeline collapses into ONE Catalyst logical plan, so the optimizer
sees through stage boundaries (filters written in stage 3 still push down
into stage 1's scan). ``explain()`` exposes the fused physical plan;
``lineage()`` reports the declared stage graph for observability.

Example::

    pipe = (
        Pipeline("revenue_by_nation")
        .source(lambda spark: load(spark, sf, "lineitem"))
        .stage("filter_shipped", lambda df: df.filter(...))
        .stage("revenue", lambda df: df.withColumn("rev", ...))
        .stage("rollup", lambda df: df.groupBy("nation").agg(...))
    )
    result = pipe.run(spark)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Stage = Callable[[DataFrame], DataFrame]


@dataclass
class Pipeline:
    name: str
    _source: Callable[[SparkSession], DataFrame] | None = None
    _stages: list[tuple[str, Stage]] = field(default_factory=list)

    def source(self, fn: Callable[[SparkSession], DataFrame]) -> Pipeline:
        self._source = fn
        return self

    def stage(self, name: str, fn: Stage) -> Pipeline:
        self._stages.append((name, fn))
        return self

    def build(self, spark: SparkSession) -> DataFrame:
        if self._source is None:
            raise ValueError(f"pipeline {self.name}: no source declared")
        df = self._source(spark)
        for _, fn in self._stages:
            df = fn(df)
        return df

    def run(self, spark: SparkSession) -> DataFrame:
        return self.build(spark)

    def explain(self, spark: SparkSession) -> str:
        df = self.build(spark)
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    def lineage(self) -> list[str]:
        return [f"{self.name}:source"] + [f"{self.name}:{n}" for n, _ in self._stages]
