"""Local mirror of the driver's DuckDB-oracle comparison (SURVEY.md §5.3).

Runs a registered Spark query and its oracle SQL over the same sf dir and
compares row count, (loose) schema, and an order-insensitive value frame:
columns sorted by name, floats rounded to 4dp, timestamps to epoch-µs,
rows sorted by every column. This is intentionally stricter than "hash
equal" — on mismatch it reports the first differing rows for debugging.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from upflow_spark.io import TABLES, path_of

ROUND_DP = 4


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path_of(sf_dir, t)}')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in list(df.columns):
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # epoch µs, tz dropped; NaT -> <NA>
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = (s.astype("datetime64[us]").astype("int64")).where(s.notna())
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(ROUND_DP)
            # -0.0 == 0.0 but repr/hash differ
            df[c] = df[c].where(df[c] != 0.0, 0.0)
        elif s.dtype == object:
            df[c] = s.map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else str(v))
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def compare(spark_df, oracle_df: pd.DataFrame, key: str = "?") -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(oracle_df)
    assert list(got.columns) == list(want.columns), (
        f"[{key}] column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    # exact dtype parity: int-vs-float renders differently under value
    # hashing ("-994" vs "-994.0"), so loose numeric equality is not enough
    mism = [
        (c, str(got[c].dtype), str(want[c].dtype))
        for c in got.columns
        if str(got[c].dtype) != str(want[c].dtype)
    ]
    assert not mism, f"[{key}] dtype mismatch (spark vs oracle): {mism}"
    assert len(got) == len(want), f"[{key}] row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            gn = g.astype("float64").fillna(math.nan)
            wn = w.astype("float64").fillna(math.nan)
            ok = ((gn - wn).abs() <= 1e-9) | (gn.isna() & wn.isna())
        else:
            ok = (g == w) | (g.isna() & w.isna())
        if not ok.all():
            bad = (~ok).idxmax()
            raise AssertionError(
                f"[{key}] value mismatch col={c} row={bad}: spark={g[bad]!r} oracle={w[bad]!r}\n"
                f"spark row: {got.iloc[bad].to_dict()}\noracle row: {want.iloc[bad].to_dict()}"
            )


def run_key(spark, con, key: str, sf_dir: str) -> None:
    from upflow_spark import ORACLE, QUERIES

    df = QUERIES[key](spark, sf_dir)
    if key in ORACLE:
        compare(df, con.execute(ORACLE[key]).df(), key)
    else:
        assert df.count() >= 0  # rows-only smoke
