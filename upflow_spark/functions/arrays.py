"""§2-H array functions over embeddings (SURVEY.md).

embedding is array<float> dim 64. Elements are cast to double BEFORE any
arithmetic on both sides (float→double widening is exact, and double math is
then bit-identical across engines). Oracle-checked outputs are scalars only —
container rendering is engine-specific (see parity policy in registry.py).

array_hof is the UDF policy in action: L2 norm / max-abs / dot products are
higher-order-function compositions (transform/aggregate), NOT Python UDFs —
they stay inside codegen and cost no Python round-trip at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "array_ops",
    oracle="""
SELECT vec_id,
       len(embedding) AS n_dims,
       floor((CAST(embedding[1] AS DOUBLE)) * 10000 + 0.5) / 10000 AS first_val,
       floor((CAST(list_min(embedding) AS DOUBLE)) * 10000 + 0.5) / 10000 AS min_val,
       floor((CAST(list_max(embedding) AS DOUBLE)) * 10000 + 0.5) / 10000 AS max_val,
       len(list_distinct(embedding)) AS n_distinct_vals,
       list_contains([0, 1, 2, 3, 4], label) AS label_in_low5
FROM embeddings
""",
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / array_min / array_max / array_distinct / contains."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        r4(F.element_at("embedding", 1).cast("double")).alias("first_val"),
        r4(F.array_min("embedding").cast("double")).alias("min_val"),
        r4(F.array_max("embedding").cast("double")).alias("max_val"),
        F.size(F.array_distinct("embedding")).cast("long").alias("n_distinct_vals"),
        F.array_contains(F.sequence(F.lit(0), F.lit(4)), F.col("label")).alias(
            "label_in_low5"
        ),
    )


@query(
    "array_explode",
    oracle="""
SELECT vec_id,
       count(*) AS n_elems,
       floor((min(CAST(v AS DOUBLE))) * 10000 + 0.5) / 10000 AS min_val,
       floor((max(CAST(v AS DOUBLE))) * 10000 + 0.5) / 10000 AS max_val,
       floor((avg(CAST(v AS DOUBLE))) * 10000 + 0.5) / 10000 AS avg_val,
       count(*) FILTER (WHERE v > 0) AS n_positive
FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)
GROUP BY vec_id
""",
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode to (vec_id, pos, val) rows, then per-vector re-aggregation.

    Scale note: exploding multiplies rows ×64 — fine for a shuffle-free
    re-agg on the same key, but prefer array_hof's in-place HOFs when the
    intermediate rows aren't needed.
    """
    e = load(spark, sf_dir, "embeddings")
    exploded = e.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
    vd = F.col("v").cast("double")
    return exploded.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_elems"),
        r4(F.min(vd)).alias("min_val"),
        r4(F.max(vd)).alias("max_val"),
        r4(F.avg(vd)).alias("avg_val"),
        F.count(F.when(F.col("v") > 0, 1)).alias("n_positive"),
    )


@query(
    "array_hof",
    oracle="""
SELECT vec_id,
       floor((sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) * 10000 + 0.5) / 10000 AS l2_norm,
       floor((list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))) * 10000 + 0.5) / 10000 AS max_abs,
       floor((list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))) * 10000 + 0.5) / 10000 AS elem_sum
FROM embeddings
""",
)
def array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm / max-abs / sum via transform+aggregate — no explode, no UDF."""
    e = load(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    sq_sum = F.aggregate(
        as_double, F.lit(0.0), lambda acc, x: acc + x * x
    )
    elem_sum = F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x)
    max_abs = F.array_max(F.transform(as_double, lambda x: F.abs(x)))
    return e.select(
        "vec_id",
        r4(F.sqrt(sq_sum)).alias("l2_norm"),
        r4(max_abs).alias("max_abs"),
        r4(elem_sum).alias("elem_sum"),
    )
