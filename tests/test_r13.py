"""Behavioral invariants for round-13 changes.

Hash equality vs DuckDB is covered by tests/test_oracle.py; these pin the
degenerate-relation guards and staging identities the hashes can't see.
"""

from __future__ import annotations

import datetime

import upflow_spark  # noqa: F401
from upflow_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_holt_forecast_degenerate_single_day(spark, tmp_path):
    """r12 ADVICE: a single-day series used to raise IndexError (xs[1])
    and n=1 also zero-divides the RMSE. Holt needs two points to seed
    (l0, b0); the oracle's recursive base case (rows i=0 AND i=1) is
    empty then, so the Spark side must return the same EMPTY relation."""
    orders = spark.createDataFrame(
        [
            (1, datetime.datetime(1995, 1, 1), 100.0),
            (2, datetime.datetime(1995, 1, 1), 50.0),
        ],
        "o_orderkey long, o_orderdate timestamp, o_totalprice double",
    )
    orders.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = QUERIES["ts_holt_linear_forecast"](spark, str(tmp_path))
    assert out.collect() == []
    # two distinct days: the guard must NOT trip (7 horizons, n_days=2)
    orders2 = spark.createDataFrame(
        [
            (1, datetime.datetime(1995, 1, 1), 100.0),
            (2, datetime.datetime(1995, 1, 2), 50.0),
        ],
        "o_orderkey long, o_orderdate timestamp, o_totalprice double",
    )
    orders2.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    rows = QUERIES["ts_holt_linear_forecast"](spark, str(tmp_path)).collect()
    assert len(rows) == 7 and all(r["n_days"] == 2 for r in rows)


def test_weighted_minhash_staged_on_exact_survivors(spark):
    """r12 VERDICT item 2: the weighted key's band_idx=-2 staging bill
    (survivors, exact dups removed) must agree with dedup_staged's exact
    collapse — both ride the shared _exact_survivors relation."""
    w = {r["band_idx"]: r for r in QUERIES["dedup_minhash_weighted"](spark, SF).collect()}
    s = QUERIES["dedup_staged"](spark, SF).collect()[0]
    assert w[-2]["n_pairs"] == s["n_survivors"]
    assert w[-2]["pair_checksum"] == s["n_exact_dups"]
