"""Per-key timing audit at sf0.1 → BENCH_DETAIL.md.

Complements bench.py (the driver's one-line headline bench) with full
coverage: every registry key, warm timing (2nd run), row count, sorted
slowest-first so regressions and scale embarrassments surface immediately.
Run: python tools/bench_all.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


PARTIAL = "/tmp/upflow_bench_detail_partial.jsonl"


def main() -> None:
    import json

    from upflow_spark import QUERIES
    from upflow_spark.session import get_spark

    done: dict[str, tuple] = {}
    if os.path.exists(PARTIAL):
        with open(PARTIAL) as f:
            for line in f:
                r = json.loads(line)
                done[r["key"]] = (r["dt"], r["key"], r["n"], r["err"])

    spark = get_spark("upflow-bench-all")
    results = list(done.values())
    for key in sorted(QUERIES):
        if key in done:
            continue
        fn = QUERIES[key]
        try:
            n = len(fn(spark, SF).collect())  # warm-up
            t0 = time.perf_counter()
            n = len(fn(spark, SF).collect())
            dt = time.perf_counter() - t0
            results.append((dt, key, n, ""))
        except Exception as exc:
            results.append((float("inf"), key, -1, str(exc)[:120]))
        with open(PARTIAL, "a") as f:
            f.write(json.dumps({"key": key, "dt": results[-1][0], "n": results[-1][2], "err": results[-1][3]}) + "\n")
        print(f"{key}: {results[-1][0]:.2f}s {results[-1][2]} rows", file=sys.stderr, flush=True)

    results.sort(reverse=True)
    total = sum(r[0] for r in results if r[0] != float("inf"))
    lines = [
        "# BENCH_DETAIL — per-key warm timings",
        "",
        f"`{SF}` on local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}], "
        "warm = 2nd run, single collect(). Sorted slowest-first. "
        "Regenerate: `python tools/bench_all.py`.",
        "",
        f"**{len(results)} keys, {total:.1f}s total.**",
        "",
        "| key | sec | rows |",
        "|---|---|---|",
    ]
    for dt, key, n, err in results:
        cell = f"FAILED: {err}" if err else f"{dt:.3f}"
        lines.append(f"| {key} | {cell} | {n} |")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_DETAIL.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"BENCH_DETAIL.md written: {len(results)} keys, {total:.1f}s", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
