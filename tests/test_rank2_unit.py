"""Direct unit tests for operators/rank2.py edge cases the oracle keys
don't exercise (r10 advice fixes): NULL partition_by keys must rank as a
real group (not vanish in the offsets join), and a non-numeric
spark.sql.shuffle.partitions value must fall back, not crash."""

from __future__ import annotations

from pyspark.sql import functions as F

from upflow_spark.operators.rank2 import global_cumsum, global_row_number


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_grouped_row_number_keeps_null_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), (None, 3), (None, 1), ("b", 5)],
        "g string, v int",
    )
    got = global_row_number(df, ["v"], out="rn", partition_by=["g"])
    assert _rows(got.select("g", "v", "rn")) == {
        ("a", 1, 1),
        ("a", 2, 2),
        (None, 1, 1),
        (None, 3, 2),
        ("b", 5, 1),
    }


def test_grouped_cumsum_keeps_null_group(spark):
    df = spark.createDataFrame(
        [(None, 1, 10), (None, 2, 20), ("x", 1, 5)],
        "g string, v int, amt long",
    )
    got = global_cumsum(
        df, ["v"], {"run": F.col("amt")}, partition_by=["g"]
    )
    assert _rows(got.select("g", "v", "run")) == {
        (None, 1, 10),
        (None, 2, 30),
        ("x", 1, 5),
    }


def test_row_number_total_with_null_group(spark):
    df = spark.createDataFrame(
        [(None, 2), (None, 1), ("a", 9)], "g string, v int"
    )
    got = global_row_number(
        df, ["v"], out="rn", partition_by=["g"], total_out="tot"
    )
    assert _rows(got.select("g", "rn", "tot")) == {
        (None, 1, 2),
        (None, 2, 2),
        ("a", 1, 1),
    }


def test_non_numeric_shuffle_partitions_falls_back():
    # Spark won't let a live session SET "auto" (validated int conf), but
    # managed platforms report exactly that — stub the session surface
    from upflow_spark.operators.rank2 import _shuffle_partitions

    class _Conf:
        def get(self, k):
            return "auto"

    class _SC:
        defaultParallelism = 7

    class _Spark:
        conf = _Conf()
        sparkContext = _SC()

    assert _shuffle_partitions(_Spark()) == 7
