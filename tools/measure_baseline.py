"""Measure per-op baselines: each key's DuckDB oracle SQL at sf0.1, warm.

BASELINE.md's original four rows compare against hand-written queries; every
other key was graded against a coarse bound (2x the slowest of those rows),
which mis-prices compound pipelines (iterative CC, LSH fits) — VERDICT r1
item 9. This tool records an HONEST per-op denominator: the wall time DuckDB
(the driver's own oracle engine, single node, same machine) needs to produce
the IDENTICAL result set from the registered oracle SQL.

Output: JSON lines {key, duckdb_warm_sec, rows} -> fold into BASELINE.md.
Run when the machine is otherwise idle; times are warm (2nd run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# bench headline keys + every key BENCH_DETAIL flagged over the old coarse
# bound; dedup_near_minhash_lsh (rows-only) borrows the exact key's oracle —
# it computes the same pair set, so the denominator is the same computation.
KEYS = [
    "agg_groupby", "join_multiway", "win_row_number_topk", "agg_events_topk",
    "agg_pivot", "scan_parquet", "join_shuffle_equi", "join_asof",
    "agg_rollup", "dedup_keep_latest", "text_tfidf_topterms", "sim_probe_topk",
    "stream_tumbling", "pipeline_curation_funnel", "dedup_apply_canonical",
    "dedup_cluster_cc", "dedup_near_minhash", "dedup_simhash_pairs",
    "dedup_ngram_jaccard", "dedup_embedding_cosine", "stream_python_datasource",
    "sim_cosine_topk", "knn_classify",
]


def main() -> None:
    import duckdb

    from upflow_spark.registry import ORACLE, load_all_modules

    load_all_modules()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = {}
    for key in KEYS:
        sql = ORACLE.get(key)
        if sql is None:
            print(json.dumps({"key": key, "err": "no_oracle"}))
            continue
        try:
            con.execute(sql).fetchall()  # warm-up
            t0 = time.perf_counter()
            rows = con.execute(sql).fetchall()
            dt = round(time.perf_counter() - t0, 4)
            out[key] = dt
            print(json.dumps({"key": key, "duckdb_warm_sec": dt, "rows": len(rows)}))
        except Exception as exc:
            print(json.dumps({"key": key, "err": str(exc)[:200]}))
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
