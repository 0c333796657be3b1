"""Scalar-surface wave 5: URL parsing, data masking, locale number
formatting, and base64 transport encoding.

Each is map-only (fuses into the scan, zero shuffles at any scale). The
oracle twins avoid engine-specific builtins where DuckDB lacks them
(mask → regexp_replace chain, format_number → fmt '{:,}', parse_url →
anchored regexes over URLs synthesized identically on both sides).

Reference: n/a (ref empty — SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.registry import query


@query(
    "url_parse",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/' || lang || '/doc-'
           || CAST(doc_id AS VARCHAR) || '?k=' || CAST(n_chars AS VARCHAR) AS url
  FROM documents WHERE doc_id < 1000
)
SELECT doc_id,
       regexp_extract(url, 'https://([^/]+)', 1) AS host,
       regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       regexp_extract(url, '[?&]k=([0-9]+)', 1) AS k_param,
       regexp_extract(url, '^([a-z]+)://', 1) AS protocol
FROM u
""",
)
def url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url over deterministic synthesized URLs: HOST / PATH / QUERY /
    a single query parameter / PROTOCOL.

    Spark side uses the dedicated ``parse_url`` builtin (codegen'd); the
    oracle re-derives each part with anchored regexes — byte-identical for
    well-formed URLs of this shape.
    """
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 1000)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit("?k="),
        F.col("n_chars").cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("k")).alias("k_param"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "str_mask_format",
    oracle="""
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(c_name,
         '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked,
       regexp_replace(regexp_replace(regexp_replace(c_name,
         '[A-Z]', '*', 'g'), '[a-z]', '*', 'g'), '[0-9]', '#', 'g') AS masked_custom,
       format('{:,}', CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS acctbal_cents_fmt,
       base64(c_name::BLOB) AS name_b64,
       decode(from_base64(base64(c_name::BLOB))) AS name_roundtrip
FROM customer WHERE c_custkey < 1000
""",
)
def str_mask_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data masking (default + custom replacement chars), thousands-
    separated integer formatting, and base64 encode/decode round-trip.

    ``mask()`` default replaces upper→X lower→x digit→n; the custom form
    collapses letters to '*' and digits to '#'. format_number is applied to
    integer cents (DuckDB's fmt formatter refuses ',' on floats — landmine:
    keep grouped formatting on integers for cross-engine parity).
    """
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") < 1000)
    cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint")
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked"),
        F.mask("c_name", F.lit("*"), F.lit("*"), F.lit("#")).alias("masked_custom"),
        F.format_number(cents, 0).alias("acctbal_cents_fmt"),
        F.base64(F.col("c_name").cast("binary")).alias("name_b64"),
        F.unbase64(F.base64(F.col("c_name").cast("binary")))
        .cast("string")
        .alias("name_roundtrip"),
    )
