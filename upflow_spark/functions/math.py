"""§2-H math functions (SURVEY.md).

abs/floor/ceil/sqrt/pow/ln/log10/pmod over prices — IEEE-double built-ins that
evaluate bit-identically in Spark and DuckDB, then 4dp-floored for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query


@query(
    "math_basic",
    oracle="""
SELECT c_custkey,
       floor((abs(c_acctbal)) * 10000 + 0.5) / 10000 AS abs_bal,
       CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
       CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
       floor((sqrt(abs(c_acctbal))) * 10000 + 0.5) / 10000 AS sqrt_bal,
       floor((pow(c_acctbal / 1000, 2)) * 10000 + 0.5) / 10000 AS pow_bal,
       floor((ln(abs(c_acctbal) + 1)) * 10000 + 0.5) / 10000 AS ln_bal,
       floor((log10(abs(c_acctbal) + 1)) * 10000 + 0.5) / 10000 AS log10_bal,
       CAST(c_custkey % 7 AS BIGINT) AS mod7,
       CAST(((c_custkey % 7) + 7) % 7 AS BIGINT) AS pmod7
FROM customer
""",
)
def math_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/floor/ceil/sqrt/pow/ln/log10/mod/pmod over customer balances."""
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        r4(F.abs(bal)).alias("abs_bal"),
        F.floor(bal).alias("floor_bal"),
        F.ceil(bal).alias("ceil_bal"),
        r4(F.sqrt(F.abs(bal))).alias("sqrt_bal"),
        r4(F.pow(bal / 1000, 2)).alias("pow_bal"),
        r4(F.log(F.abs(bal) + 1)).alias("ln_bal"),
        r4(F.log10(F.abs(bal) + 1)).alias("log10_bal"),
        (F.col("c_custkey") % 7).alias("mod7"),
        F.pmod("c_custkey", F.lit(7)).cast("long").alias("pmod7"),
    )
