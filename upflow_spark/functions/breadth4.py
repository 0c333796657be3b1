"""SQL-surface breadth, wave 4: exact DECIMAL money arithmetic, array
mutation functions, codepoint/hex string functions, and JSON-to-struct
star expansion.

Same conventions as waves 1-3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from upflow_spark.io import load
from upflow_spark.registry import query


@query(
    "decimal_exact_money",
    oracle="""
SELECT o_orderstatus,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS total_exact,
       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS max_exact,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
)
def decimal_exact_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL aggregation — the money path: no float drift however
    many billions of rows are summed (decimal sums are associative integers
    underneath, so partial aggregation stays exact at any partition count).

    Emitted as canonical strings because pandas renders both engines'
    decimals via str; scale 2 pins the rendering.
    """
    o = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.groupBy("o_orderstatus").agg(
        F.sum(dec).cast("decimal(38,2)").cast("string").alias("total_exact"),
        F.max(dec).cast("string").alias("max_exact"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "array_mutate",
    oracle="""
SELECT n_nationkey,
       array_to_string(list_append(base, 99), ',') AS appended,
       array_to_string(list_prepend(-1, base), ',') AS prepended,
       array_to_string(list_filter(with_null, x -> x IS NOT NULL), ',') AS compacted,
       CAST(len(with_null) AS BIGINT) AS raw_len
FROM (SELECT n_nationkey,
             generate_series(1, n_nationkey % 3 + 1) AS base,
             [n_nationkey, NULL, n_nationkey + 1] AS with_null
      FROM nation)
""",
)
def array_mutate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array mutation family: append / prepend / compact(drop nulls) — the
    building blocks for feature-vector assembly without explode+reagg."""
    n = load(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    base = F.sequence(F.lit(1), (k % 3 + 1).cast("int"))
    with_null = F.array(k, F.lit(None).cast("int"), k + 1)
    return n.select(
        "n_nationkey",
        F.array_join(F.array_append(base, F.lit(99)), ",").alias("appended"),
        F.array_join(F.array_prepend(base, F.lit(-1)), ",").alias("prepended"),
        F.array_join(F.array_compact(with_null), ",").alias("compacted"),
        F.size(with_null).cast("long").alias("raw_len"),
    )


@query(
    "str_codepoints_hex",
    oracle="""
SELECT p_partkey,
       CAST(ascii(p_brand) AS BIGINT) AS first_cp,
       chr(65 + CAST(p_partkey % 26 AS INTEGER)) AS letter,
       to_hex(p_partkey) AS key_hex
FROM part
""",
)
def str_codepoints_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ascii / chr / hex codepoint functions (identical rendering both
    engines: uppercase hex, no leading zeros)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.ascii("p_brand").cast("long").alias("first_cp"),
        F.chr(F.lit(65) + F.col("p_partkey") % 26).alias("letter"),
        F.hex(F.col("p_partkey")).alias("key_hex"),
    )


@query(
    "json_struct_star",
    oracle="""
SELECT event_id,
       CAST(props->>'k' AS INTEGER) AS k,
       CAST(props->>'k' AS INTEGER) % 7 AS k_mod
FROM events
""",
)
def json_struct_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct then star-expansion — parse ONCE,
    reference fields many times (vs get_json_object re-parsing per call;
    the VARIANT key covers the Spark 4 binary-shredded variant of the same
    idea)."""
    ev = load(spark, sf_dir, "events")
    schema = StructType([StructField("k", IntegerType())])
    parsed = ev.select("event_id", F.from_json("props", schema).alias("p"))
    return parsed.select("event_id", "p.*").withColumn("k_mod", F.col("k") % 7)
