"""Dump .explain('formatted') for named keys to plans/<outdir>/<key>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> key1 [key2 ...]
Env: PLANS_SF (default /root/testdata/sf0.001), PLANS_DIR (default plans/r15).
"""
from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    sf = os.environ.get("PLANS_SF", "/root/testdata/sf0.001")
    outdir = os.environ.get("PLANS_DIR", "plans/r15")
    os.makedirs(outdir, exist_ok=True)
    from upflow_spark import QUERIES
    from upflow_spark.session import get_spark

    spark = get_spark("upflow-dump-plans")
    for key in keys:
        df = QUERIES[key](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = re.sub(r" \[codegen id : \d+\]", "", buf.getvalue())
        path = os.path.join(outdir, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan.rstrip() + "\n")
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
