"""Start-of-round fixture probe: diff the parquet schemas against what the
engine was built for, BEFORE running anything else.

The fixtures regenerate between rounds and have already changed layout once
(events.ts: TIMESTAMP(NANOS) -> timestamp[us] before round 3, which broke
every events-backed key until io.py went schema-adaptive). This probe makes
the next change a 10-second diagnosis instead of a red correctness run.

Run: python tools/roundcheck.py   (exit 1 on any unexpected schema)
"""

from __future__ import annotations

import sys

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"

# column -> acceptable pyarrow type strings (loaders handle every listed one)
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int32", "int64"}, "r_name": {"string", "large_string"}},
    "nation": {"n_nationkey": {"int32", "int64"}, "n_regionkey": {"int32", "int64"}},
    "customer": {"c_custkey": {"int64"}, "c_acctbal": {"double"}},
    "supplier": {"s_suppkey": {"int64"}},
    "part": {"p_partkey": {"int64"}, "p_size": {"int32", "int64"}},
    "orders": {
        "o_orderkey": {"int64"},
        "o_orderdate": {"timestamp[ms]", "timestamp[us]", "timestamp[ns]"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_shipdate": {"timestamp[ms]", "timestamp[us]", "timestamp[ns]"},
    },
    "events": {
        "event_id": {"int64"},
        # every layout the adaptive loader handles
        "ts": {"timestamp[us]", "timestamp[ns]", "timestamp[ms]", "int64"},
        "user_id": {"int64"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {"doc_id": {"int64"}, "text": {"string", "large_string"}, "n_chars": {"int64"}},
    "embeddings": {"vec_id": {"int64"}, "label": {"int32", "int64"}},
}


def main() -> int:
    bad = 0
    for table, cols in EXPECTED.items():
        try:
            schema = pq.read_schema(f"{SF}/{table}.parquet")
        except Exception as exc:
            print(f"FAIL  {table}: unreadable ({exc})")
            bad += 1
            continue
        for col, ok_types in cols.items():
            if col not in schema.names:
                print(f"FAIL  {table}.{col}: column missing")
                bad += 1
                continue
            t = str(schema.field(col).type)
            if t not in ok_types:
                print(f"FAIL  {table}.{col}: {t} not in {sorted(ok_types)}")
                bad += 1
            else:
                print(f"ok    {table}.{col}: {t}")
    # content-drift probe (r4 lesson: schemas held but the documents corpus
    # got 2x more duplicate-heavy, repricing every near-dup key AND the
    # DuckDB recursive-CTE oracles — the funnel oracle went to 13 min at
    # sf0.1). Estimate the SimHash pair density at sf0.001 so a blowup is a
    # printed WARNING at round start, not a mystery timeout mid-run.
    try:
        import duckdb

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        n_docs, n_distinct = con.execute(
            "SELECT count(*), count(DISTINCT md5(text)) FROM documents"
        ).fetchone()
        print(f"docs  sf0.001: {n_docs} rows, {n_distinct} distinct texts")
        if n_docs and n_distinct < n_docs * 0.5:
            print(
                "WARN  documents >50% exact-duplicate — expect near-dup pair "
                "counts (and CC/funnel oracle runtimes) to balloon at sf0.1"
            )
    except Exception as exc:  # probe only — never fail the round on it
        print(f"note  dup-density probe skipped: {exc}")
    print("ROUNDCHECK:", "CLEAN" if bad == 0 else f"{bad} SCHEMA SURPRISES")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
