"""Targeted driver-sim: verify only the named keys against their oracles.

Usage: python tools/check_keys.py key1 key2 ...  [env SPARK_GRAFT_SF_DIR]
Same vanilla session + DuckDB compare as tools/driver_sim.py, no partial
file — for fast iteration on a handful of keys mid-round.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.driver_sim import SF_DIR, TABLES, norm_hash  # noqa: E402


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    skip: set[str] = set()
    if args and args[0] == "--skip":
        skip = set(args[1].split(","))
        args = args[2:]
    if "--all" in args:
        extra = [a for a in args if a != "--all"]
        if extra:
            print(f"usage: --all takes no extra key args (got {extra})")
            sys.exit(2)
        import __spark_entry__ as _E

        keys = [k for k in sorted(_E.oracle_sql()) if k not in skip]
    else:
        keys = [k for k in args if k not in skip]
    if not keys:
        print("usage: check_keys.py [--skip k1,k2] (--all | key1 [key2 ...])")
        sys.exit(2)

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    queries = E.queries()
    oracles = E.oracle_sql()
    n_fail = 0
    for key in keys:
        if key not in queries:
            print(f"FAIL {key}: not registered")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            pdf = queries[key](spark, SF_DIR).toPandas()
            if key in oracles:
                opdf = con.execute(oracles[key]).df()
                if len(pdf) != len(opdf):
                    status = f"FAIL rowcount {len(pdf)} vs {len(opdf)}"
                elif norm_hash(pdf) != norm_hash(opdf):
                    status = "FAIL hash"
                else:
                    status = "match"
            else:
                status = "rows_only"
        except Exception as e:  # noqa: BLE001
            status = f"FAIL exc {type(e).__name__}: {e}"[:500]
            pdf = None
        n = -1 if pdf is None else len(pdf)
        if status.startswith("FAIL"):
            n_fail += 1
        print(f"{status}  {key} ({n} rows, {time.time() - t0:.2f}s)", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
