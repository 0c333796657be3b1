"""Entity resolution: blocked fuzzy matching of dirty records to a clean
reference — the classic record-linkage primitive (dedupe a CRM feed, link
scraped entities to a canonical table) expressed Spark-first.

Shape: a deterministic "dirty" copy of every customer name (one character
overwritten) is matched back against the clean table via BLOCKING — an
equi-join on a block key both engines derive identically from the string —
followed by an exact Levenshtein verify on the candidates only. At 100 TB
the blocking join is the whole point: candidates per probe = block size
(~15 here), never the full reference table; the same plan shape as banded
MinHash (candidate generation by equi-join + verify).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.registry import query

# typo position: 1-based, always within the digit run (cols 10..15) and
# never inside the block key (cols 16..18), so a record stays in its block
_TYPO_POS = "10 + (c_custkey % 6)"


@query(
    "entity_match_blocked",
    oracle=f"""
WITH dirty AS (
  SELECT c_custkey AS query_key,
         substr(c_name, 1, ({_TYPO_POS}) - 1) || 'x'
           || substr(c_name, ({_TYPO_POS}) + 1) AS dirty_name,
         substr(c_name, 16, 3) AS block
  FROM customer
),
clean AS (
  SELECT c_custkey AS ref_key, c_name, substr(c_name, 16, 3) AS block
  FROM customer
),
cand AS (
  SELECT d.query_key, c.ref_key
  FROM dirty d JOIN clean c ON d.block = c.block
  WHERE levenshtein(d.dirty_name, c.c_name) <= 1
)
SELECT query_key, count(*) AS n_matches,
       min(ref_key) AS best_match_key,
       min(ref_key) = query_key AS matched_self
FROM cand GROUP BY query_key
""",
)
def entity_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match each deterministically-dirtied customer name (one character
    overwritten at a key-dependent digit position) back to the clean table:
    block on the last-3-digit substring, verify candidates with
    levenshtein ≤ 1, report match count + best (min-key) match per probe.

    Cross-matches are real: a clean name differing from the probe's origin
    at exactly the typo position also verifies — `matched_self` exposes the
    resulting ambiguity rate, the number an ER pipeline actually monitors.
    """
    c = load(spark, sf_dir, "customer")
    pos = (F.lit(10) + F.col("c_custkey") % 6).cast("int")
    dirty = c.select(
        F.col("c_custkey").alias("query_key"),
        F.concat(
            F.expr(f"substr(c_name, 1, ({_TYPO_POS}) - 1)"),
            F.lit("x"),
            F.substring(F.col("c_name"), pos + 1, 100),
        ).alias("dirty_name"),
        F.substring("c_name", 16, 3).alias("block"),
    )
    clean = c.select(
        F.col("c_custkey").alias("ref_key"),
        "c_name",
        F.substring("c_name", 16, 3).alias("block"),
    )
    cand = (
        dirty.join(clean, "block")
        .filter(F.levenshtein("dirty_name", "c_name") <= 1)
    )
    return cand.groupBy("query_key").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("ref_key").alias("best_match_key"),
        (F.min("ref_key") == F.col("query_key")).alias("matched_self"),
    )
