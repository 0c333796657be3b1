"""Scan every registered key's OPTIMIZED logical plan for unpartitioned
Window nodes (the "Moving all data to a single partition" shape) — the
round-9 weak-key audit. Prints one line per offending key with the window's
order spec so the rank2 routing and the plan-guard whitelist are built from
measured plans, not memory.

Usage: python tools/window_scan.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def unpartitioned_windows(df) -> list[str]:
    """Window nodes with an empty partitionSpec in the optimized plan.

    Each returned string is the comma-joined attribute names referenced by
    that window's orderSpec (each spec is a FLATTENED expression tree: a
    SortOrder head followed by its child expressions — collect every node
    carrying a name).
    """
    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    hits = []
    for n in nodes:
        if not n.get("class", "").endswith(".Window"):
            continue
        part = n.get("partitionSpec") or []
        if len(part) == 0:
            names = []
            for spec in n.get("orderSpec") or []:
                for expr in spec:
                    if isinstance(expr, dict) and "name" in expr:
                        names.append(expr["name"])
            hits.append(",".join(names) or "<no-order>")
    return hits


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    os.environ.setdefault("UPFLOW_SHUFFLE_PARTITIONS", "8")
    from upflow_spark import QUERIES
    from upflow_spark.session import get_spark

    spark = get_spark("window-scan")
    bad: dict[str, list[str]] = {}
    for key in sorted(QUERIES):
        try:
            df = QUERIES[key](spark, sf)
            hits = unpartitioned_windows(df)
        except Exception as exc:  # pragma: no cover - scan robustness
            print(f"ERR {key}: {exc}", flush=True)
            continue
        if hits:
            bad[key] = hits
            print(f"HIT {key}: {hits}", flush=True)
    print(f"TOTAL {len(bad)} keys with unpartitioned windows")
    spark.stop()


if __name__ == "__main__":
    main()
