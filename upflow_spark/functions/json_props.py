"""§2-H JSON / map functions over events.props (SURVEY.md).

props is a JSON text column shaped ``{"k": <int 0..99>}``. The oracle-checked
key extracts scalars (engine-portable); the map-typed parse is rows-only
because map rendering differs across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, MapType, StringType

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "json_extract",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       floor((avg(CAST(props->>'k' AS INTEGER))) * 10000 + 0.5) / 10000 AS avg_k,
       min(CAST(props->>'k' AS INTEGER)) AS min_k,
       max(CAST(props->>'k' AS INTEGER)) AS max_k,
       count(DISTINCT CAST(props->>'k' AS INTEGER)) AS n_distinct_k
FROM events
GROUP BY event_type
""",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object scalar extraction → per-type stats over props.k."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.avg("k")).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


@query(
    "map_from_json",
    oracle="""
SELECT event_id,
       '{"k":' || CAST(props->>'k' AS INTEGER) || '}' AS props_json,
       'k' AS keys_joined,
       CAST(props->>'k' AS INTEGER) AS k_val
FROM events
""",
)
def map_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into MapType + map_keys/element_at lookup.

    The map/array intermediates stay typed inside the plan; the *output*
    columns are flattened to scalars (to_json, array_join) so the driver's
    pandas canonicalizer can sort/hash them — raw map or array columns are
    unhashable there (round-1 driver failure). The testdata props column is
    single-key ``{"k": <int>}``, which makes the rendered JSON and joined
    key list engine-portable.
    """
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", MapType(StringType(), IntegerType()))
    return ev.select(
        "event_id",
        F.to_json(m).alias("props_json"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_joined"),
        F.element_at(m, "k").alias("k_val"),
    )
