"""Incremental SCALE.md patch: measure ONLY the probes named on argv (or
the probes missing from the current table) against the SAME sf0.1/sf1
replica protocol as tools/scale_test.py, and insert their rows into the
existing table in place — everything else (earlier rows, the preserved
analysis below the marker) is untouched.

Rationale: the full sweep re-times ~100 probes (~2.5 h); adding a wave of
new keys only needs their own rows, and mixing same-day measurements
against the same persisted replica is methodologically identical to one
long sweep (same box, same data, warm JVM per key via time_key's warm-up
run). Run: python tools/scale_patch.py [key ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_test import (  # noqa: E402
    COMPUTE_ONLY,
    PROBE_KEYS,
    SF01,
    SF1,
    build_sf1,
    time_key,
)


def main() -> None:
    from upflow_spark.session import get_spark

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
    )
    with open(path) as fh:
        doc = fh.read()
    # scope BOTH the have-scan and the insertion to the main probe table —
    # everything at/after the ANALYSIS marker is preserved addendum content
    # (r12 ADVICE: scanning the whole doc treated addendum-table keys as
    # measured and appended new rows into an unrelated analysis table)
    marker = "<!-- ANALYSIS — preserved across table regenerations -->"
    head = doc.split(marker)[0]
    have = set(re.findall(r"^\| ([a-z0-9_]+) \|", head, re.M))
    wanted = sys.argv[1:]
    todo = [
        (k, reads)
        for k, reads in PROBE_KEYS
        if (k in wanted if wanted else k not in have)
    ]
    if not todo:
        print("nothing to patch")
        return

    spark = get_spark("upflow-scale-patch")
    build_sf1(spark)  # no-op when the replica already exists
    rows = []
    for key, reads in todo:
        tc_small, tk_small = time_key(spark, key, SF01)
        tc_big, tk_big = time_key(spark, key, SF1)
        rc = tc_big / tc_small if tc_small > 0 else float("nan")
        rk = tk_big / tk_small if tk_small > 0 else float("nan")
        if key in COMPUTE_ONLY:
            row = (
                f"| {key} | {reads} | {tk_small:.3f} (compute) |"
                f" {tk_big:.3f} (compute) | n/a | {rk:.1f}x |"
            )
        else:
            row = (
                f"| {key} | {reads} | {tc_small:.3f} | {tc_big:.3f} |"
                f" {rc:.1f}x | {rk:.1f}x |"
            )
        rows.append(row)
        print(row, flush=True)
    spark.stop()

    # insert after the LAST main-table row (strictly before the marker)
    lines = doc.split("\n")
    mk = next(i for i, ln in enumerate(lines) if marker in ln)
    last = max(i for i in range(mk) if lines[i].startswith("| "))
    lines[last + 1 : last + 1] = rows
    with open(path, "w") as fh:
        fh.write("\n".join(lines))
    print(f"SCALE.md patched: +{len(rows)} rows")


if __name__ == "__main__":
    main()
