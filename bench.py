"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric", "value" (sum of warm per-query sec), "unit",
"queries": {name: sec}, "sf"}. The first four names mirror BASELINE.md's
measured rows (q1_agg / q3_join3 / window_rank / events_agg) for direct
comparison; the rest cover each operator family's heaviest representative.

Timing protocol (matches BASELINE.md): global JIT warm-up first (the r4
artifact recorded q1_agg at 1.42 s purely because it ran first in a cold
JVM — BASELINE.md measures 0.77-0.95 s warm), then per key one untimed
warm run followed by TWO timed runs, best-of-2 recorded. Session startup
excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _live_spark_jvms() -> list[int]:
    """PIDs of Spark driver/executor JVMs alive right now — the r9 bench
    artifact carried +13% like-for-like noise that BENCH_DETAIL
    contradicted, traced to bench running beside other Spark jobs. The
    recorded artifact must be the LAST serial Spark job; this scan (run
    BEFORE our own session launches) turns that protocol rule into data
    the artifact itself carries ("clean": bool in the JSON line)."""
    pids = []
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                cmd = f.read()
        except OSError:
            continue
        if b"java" in cmd.split(b"\x00", 1)[0] and b"org.apache.spark" in cmd:
            pids.append(int(p))
    return pids


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    # size shuffle partitions to the data scale (SURVEY §6 guidance: ≈8 at
    # these fixture scales; a 100 TB run would set thousands via the same
    # env) — AQE still coalesces below this, it just caps the task floor
    os.environ.setdefault("UPFLOW_SHUFFLE_PARTITIONS", "8")

    concurrent = _live_spark_jvms()
    if concurrent:
        print(
            f"bench: WARNING — {len(concurrent)} Spark JVM(s) already live "
            f"(pids {concurrent}); timings will be polluted. Run bench.py as "
            "the last serial Spark job.",
            file=sys.stderr,
        )

    from upflow_spark import QUERIES
    from upflow_spark.session import get_spark

    spark = get_spark("upflow-bench")

    # BASELINE.md-comparable names first, then one heavy key per family
    bench_keys = {
        "q1_agg": "agg_groupby",
        "q3_join3": "join_multiway",
        "window_rank": "win_row_number_topk",
        "events_agg": "agg_events_topk",
        "agg_pivot": "agg_pivot",
        "scan_parquet": "scan_parquet",
        "join_shuffle_equi": "join_shuffle_equi",
        "join_asof": "join_asof",
        "agg_rollup": "agg_rollup",
        "dedup_keep_latest": "dedup_keep_latest",
        "text_tfidf": "text_tfidf_topterms",
        "sim_probe_topk": "sim_probe_topk",
        "stream_tumbling": "stream_tumbling",
        "dedup_simhash_pairs": "dedup_simhash_pairs",
        "curation_funnel": "pipeline_curation_funnel",
        "bm25_search": "bm25_search",
        "graph_pagerank": "graph_pagerank",
        "geo_radius_join": "geo_radius_join",
        "graph_triangle_count": "graph_triangle_count",
        "dedup_containment": "dedup_containment",
        # r6 additions: the staged-mitigation flagship + the rewritten
        # two-stage ANN dedup (both new/reworked this round)
        "dedup_staged": "dedup_staged",
        "emb_dedup_ann": "emb_dedup_ann_verified",
        # r7 additions: span-level dedup + the learned quality filter
        "dedup_substring": "dedup_substring_spans",
        "quality_classifier": "text_quality_classifier",
        # r8 additions: the stride-1 exact pass + routed tokenization
        "dedup_substring_exact": "dedup_substring_exact",
        "tokenize_cjk": "text_tokenize_cjk",
        # r8 second-wave flagships: DSIR data selection + the embedding-side
        # curation funnel (Mahalanobis prune -> SemDeDup CC -> split)
        "dsir_weights": "curation_dsir_weights",
        "semantic_funnel": "pipeline_semantic_funnel",
        # r9 additions: the funnel's production ANN pair path, real BPE
        # encode, and the one-pass exact multi-quantile (rank2 flagship)
        "semantic_funnel_ann": "pipeline_semantic_funnel_ann",
        "tokenize_bpe": "tokenize_bpe_apply",
        "quantiles_exact": "agg_quantiles_exact_multi",
        # r13 additions: the composed five-stage dedup bill (the flagship
        # end-to-end pipeline) + the re-staged weighted MinHash key
        "dedup_pipeline_bill": "dedup_pipeline_bill",
        "dedup_minhash_weighted": "dedup_minhash_weighted",
    }

    # global JIT/codegen warm-up: drive shuffle + agg + window codepaths a
    # few times so the first *timed* key isn't paying one-time JVM JIT cost
    for key in ("agg_groupby", "join_multiway", "win_row_number_topk"):
        try:
            QUERIES[key](spark, sf_dir).collect()
        except Exception:
            pass

    # drift-proofing (r12 VERDICT item 3): the four BASELINE.md headline
    # keys are timed back-to-back with their hand-written vanilla-PySpark
    # twins in THIS session, so the recorded per-key ratio is immune to
    # whole-box day-to-day drift (r11->r12 totals moved +30% with zero
    # code cause; same-day ratios were 0.68-1.28x)
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.vanilla_twins import VANILLA_BUILDERS
    except Exception:  # bench must still run if tools/ is absent
        VANILLA_BUILDERS = {}

    def _timed(build) -> tuple[float, float]:
        """(cold_sec, warm_best_of_2_sec). The first run is TIMED (r13
        verdict item 5: composed keys pay session-memo builds exactly
        once, and folding that cost invisibly into the warm-up made
        round-over-round totals cache-state noise — now it's its own
        recorded number), then best-of-2 warm per BASELINE.md."""
        t0 = time.perf_counter()
        build().collect()  # cold: plan + IO caches + session memos
        cold = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):  # best-of-2 warm, per BASELINE.md methodology
            t0 = time.perf_counter()
            build().collect()
            best = min(best, time.perf_counter() - t0)
        return round(cold, 4), round(best, 4)

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    vanilla: dict[str, float] = {}
    for name, key in bench_keys.items():
        fn = QUERIES[key]
        try:
            cold[name], timings[name] = _timed(lambda: fn(spark, sf_dir))
        except Exception as exc:  # keep the bench line parseable on failure
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
        tw = VANILLA_BUILDERS.get(name)
        if tw is not None and timings[name] >= 0:
            try:
                _, vanilla[name] = _timed(lambda: tw(spark, sf_dir))
            except Exception as exc:
                print(f"bench: vanilla {name} failed: {exc}", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_warm_total",
        "value": round(sum(t for t in timings.values() if t >= 0), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # serial-run sentinel: False means another Spark JVM was live at
        # bench start and these timings are not comparison-grade
        "clean": not concurrent,
        # first-run seconds per key (includes one-time session memos for
        # the composed keys; "value" above stays the WARM total so
        # round-over-round comparisons are cache-state-honest)
        "cold": cold,
        # same-session vanilla twins + engine/vanilla ratio per headline
        # key — the drift-immune round-over-round comparison surface
        "vanilla": vanilla,
        "vanilla_ratio": {
            k: round(timings[k] / v, 3)
            for k, v in vanilla.items()
            if v > 0 and timings.get(k, -1) >= 0
        },
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
