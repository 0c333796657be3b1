"""§2-H string functions (SURVEY.md).

All row-level, codegen'd expressions — no shuffle except the small final
aggregates used to keep outputs compact. Regex patterns kept POSIX-simple so
Spark (Java regex) and DuckDB (RE2) agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.registry import query


@query(
    "str_basic",
    oracle="""
SELECT p_partkey,
       lower(p_name) AS name_lower,
       upper(p_brand) AS brand_upper,
       length(p_name) AS name_len,
       trim(substr(p_name, 1, 10)) AS name_head,
       concat_ws('|', p_brand, p_type) AS brand_type,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
FROM part
""",
)
def str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/length/trim/substring/concat_ws/lpad over part names."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.substring("p_name", 1, 10)).alias("name_head"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@query(
    "str_split_regex",
    oracle="""
SELECT p_partkey,
       string_split(p_type, ' ')[1] AS type_first_word,
       len(string_split(p_type, ' ')) AS type_n_words,
       CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS BIGINT) AS brand_num,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled
FROM part
""",
)
def str_split_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split / regexp_extract / regexp_replace (global) over part columns."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split("p_type", " ").getItem(0).alias("type_first_word"),
        F.size(F.split("p_type", " ")).cast("long").alias("type_n_words"),
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).cast("long").alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
    )


@query(
    "hash_funcs",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256
FROM customer
""",
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 + sha256 of customer names.

    xxhash64 exists Spark-side (seed 42) but has no DuckDB twin, so it stays
    out of the oracle-checked surface (SURVEY §2-H); the dedup pipeline uses
    md5 for cross-engine-checkable fingerprints and xxhash64 internally where
    only Spark reads it.
    """
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
    )


@query(
    "str_regexp_extract_all",
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Z][a-z]{3,}')) AS BIGINT)
         AS n_capwords,
       CASE WHEN len(regexp_extract_all(text, '[A-Z][a-z]{3,}')) > 0
            THEN regexp_extract_all(text, '[A-Z][a-z]{3,}')[1] END
         AS first_capword,
       CASE WHEN len(regexp_extract_all(text, '[0-9]+')) > 0
            THEN CAST(regexp_extract_all(text, '[0-9]+')[1] AS BIGINT) END
         AS first_number
FROM documents
""",
)
def str_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all over document text: capitalized-word count, first
    capitalized word, first number — array-producing regex kept
    oracle-safe by projecting scalars (count + null-safe get()) instead of the
    raw arrays (container rendering differs across engines).
    """
    d = load(spark, sf_dir, "documents")
    caps = F.regexp_extract_all("text", F.lit(r"[A-Z][a-z]{3,}"))
    nums = F.regexp_extract_all("text", F.lit(r"[0-9]+"))
    return d.select(
        "doc_id",
        F.size(caps).cast("long").alias("n_capwords"),
        F.get(caps, 0).alias("first_capword"),
        F.get(nums, 0).cast("long").alias("first_number"),
    )
