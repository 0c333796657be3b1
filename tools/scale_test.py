"""Empirical scaling probe: run representative operators at sf0.1 and at a
synthesized 10x replica (sf≈1) and record wall-clock ratios → SCALE.md.

The sf1 tables are built by stacking 10 key-offset replicas of sf0.1, with
JOIN KEYS offset consistently across table pairs (orderkey in orders+lineitem,
custkey in customer+orders, user_id/event_id in events) so per-group and
per-join-key cardinalities stay constant — i.e. the data grows 10x the way a
real workload grows (more entities), not by inflating hot keys. A
near-linear time ratio (~10x work on 32 cores ⇒ well under 10x wall) is the
evidence that the plan shapes hold at scale; a super-linear blowup flags a
shuffle or skew problem.

Run: python tools/scale_test.py   (writes /tmp/upflow_sf1 once, then SCALE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/upflow_sf1"
REPLICAS = 10

# key columns to offset per table: col -> stride (max key + headroom)
OFFSETS = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
}

PROBE_KEYS = [
    # key, tables it reads (for context in SCALE.md)
    ("agg_groupby", "lineitem"),
    ("join_shuffle_equi", "orders ⋈ lineitem"),
    ("win_row_number_topk", "orders (per-customer windows)"),
    ("dedup_keep_latest", "events"),
    ("text_tokenize_wordcount", "documents (10x replicated rows)"),
    ("sim_centroid_per_label", "embeddings (10x replicated rows)"),
    ("ts_ewma", "events (per-user linear recurrence — VERDICT r1 item 5)"),
    ("sessionize_gap", "events (gaps-and-islands, one user_id shuffle)"),
    ("bm25_search", "documents 10x (map-side tf + broadcast stats + top-k)"),
    ("agg_bitmap_distinct", "events 10x (mergeable bitmap distinct)"),
    # heavy near-dup family (VERDICT r4 item 7) — these dominate wall-time
    # and drive the 100 TB story; NOTE the fixture corpus is the DEGENERATE
    # regime for unigram banding (bounded vocab -> ~33 LSH buckets), so
    # candidate volume is quadratic in replica count by construction and the
    # verified-pair OUTPUT grows ~100x (every doc gains 9 exact twins)
    ("dedup_simhash_pairs", "documents 10x (banded simhash + Hamming verify)"),
    ("dedup_near_minhash_lsh", "documents 10x (ML MinHashLSH + bitmask verify)"),
    ("dedup_cluster_cc", "documents 10x (pair graph -> MapReduce min-label CC)"),
    # r5 blocked-GEMM kernel: 10x docs = 100x pair work but the kernel is
    # BLAS (r6: B matrix built distributively, A side streams from scan)
    ("dedup_ngram_jaccard", "documents 10x (blocked-GEMM bigram Jaccard)"),
    # r6 additions (VERDICT r5 item 6): the heavy r5 keys without 10x rows
    ("graph_triangle_count", "lineitem 10x (co-order graph; wedge join)"),
    ("text_knn_jaccard_docs", "documents 10x (10x probes x 10x corpus GEMM)"),
    ("emb_dedup_ann_verified", "embeddings 10x (LSH buckets; 9 exact twins each)"),
    ("agg_heavy_hitters", "documents 10x (Misra-Gries partials + recount)"),
    # the staged mitigation itself: exact collapse kills the 9-twin replica
    # degeneracy BEFORE banding, so the banded stage sees ~constant work
    ("dedup_staged", "documents 10x (exact collapse FIRST, band survivors)"),
    # r7 additions: span-level dedup (candidates ∝ true repeats — replica
    # twins multiply repeated digests, never pairs) + the map-only
    # learned filter + the foreachBatch ingest replay
    ("dedup_substring_spans", "documents 10x (50-token window digests, count window)"),
    ("dedup_substring_apply", "documents 10x (span removal rewrite, map-side filter HOF)"),
    ("text_quality_classifier", "documents 10x (map-only logistic filter)"),
    ("stream_dedup_incremental", "documents 10x (4-wave replay vs digest index)"),
    # r8 additions: the stride-1 exact pass (cost ∝ flagged docs) and the
    # language-routed tokenizer (map-side CASE + one lang groupBy)
    ("dedup_substring_exact", "documents 10x (stride-1 re-scan of flagged docs only)"),
    ("text_tokenize_cjk", "documents 10x (CASE-routed char-bigram/whitespace tokens)"),
    # r8 second wave: retrieval fusion, curation, graph, embedding eval.
    # dedup_semantic_cc is NOT probed: its pair stage is the brute-force
    # exact-cosine rail (quadratic by definition, like dedup_embedding_cosine
    # which it consumes); the 100 TB path routes pairs through IVF cells.
    ("search_rrf_hybrid", "documents+embeddings 10x (two top-k arms + rank fuse)"),
    ("tokenize_bpe_pretok", "documents 10x (JVM regex pretokens, one lang agg)"),
    ("curation_perplexity_buckets", "documents 10x (broadcast TF + per-lang ntile)"),
    ("curation_lang_balance", "documents 10x (per-lang hash-rank + broadcast targets)"),
    ("emb_matryoshka_agreement", "embeddings 10x (broadcast 50-probe prefix eval)"),
    ("graph_label_propagation", "documents 10x (4 sync LPA rounds over the pair graph)"),
    # r8 third/fourth waves: events analytics, graph BFS, embedding outliers
    ("events_dau_wau_mau", "events 10x (bounded 28x contribution explode)"),
    ("events_attribution_last_touch", "events 10x (ONE per-user window, no join)"),
    ("events_cohort_ltv", "events 10x (cohort rollup + age-ordered cumsum)"),
    ("graph_bfs_depth", "documents 10x (4 relaxation rounds, lineage cut)"),
    ("emb_outlier_mahalanobis", "embeddings 10x (explode + broadcast moments + topk)"),
    ("geo_knn_join", "customer 10x (broadcast probes, map-side haversine)"),
    # r8 fifth-eighth waves: order statistics via bounded fan-out, DSIR,
    # deterministic bootstrap, drift monitors, map-only blocklist.
    # pipeline_semantic_funnel is NOT probed: like dedup_semantic_cc it
    # consumes the brute-force exact-cosine rail (quadratic by definition);
    # its scale path swaps in the IVF candidate generator.
    # stat_theil_sen's pair stage is quadratic IN DAYS (constant here by
    # construction — the replica keeps the date span); the probe verifies
    # the data-sized rollup is what scales.
    ("ts_rolling_median_fanout", "orders 10x (7x bounded fan-out, exact median)"),
    ("ts_hampel_outliers", "orders 10x (fan-out twice: median then MAD)"),
    ("ts_stl_decompose", "orders 10x (decimal rollup + RANGE frame + DOW join)"),
    ("stat_theil_sen", "orders 10x (O(days^2) pairs — constant; rollup scales)"),
    ("stat_bootstrap_ci", "orders 10x (B=100 map-side membership + 100-group agg)"),
    ("stat_proportions_ztest", "lineitem 10x (one scan, four FILTER'd counts)"),
    ("curation_dsir_weights", "documents 10x (broadcast log-ratio onto token stream)"),
    ("curation_blocklist_filter", "documents 10x (map-only array HOFs)"),
    ("emb_source_drift", "embeddings+documents 10x (explode + partial avgs)"),
    ("scan_file_metadata", "lineitem 10x (_metadata grouping, 1-col ReadSchema)"),
    # r8 ninth wave: k-group inference, graph density, multi-dim layout
    ("stat_anova_f", "orders 10x (one scan, 5-row sufficient-stat fold)"),
    ("graph_k_core", "documents 10x (convergence-driven peel over the pair graph)"),
    ("scan_zorder_cluster", "lineitem 10x (Morton write + 2-col manifest prune)"),
    # r9 additions: the two-phase rank family (the reworked selection
    # stage), the fused ANN funnel path, and the real BPE encode
    ("agg_quantiles_exact_multi", "lineitem 10x (ONE two-phase rank pass, 5 quantiles)"),
    ("agg_median_per_group_two_phase", "orders 10x (grouped two-phase rank, 5 hot groups)"),
    ("seg_rfm_scores", "orders 10x (three two-phase ntiles + custkey re-joins)"),
    ("stat_ks_two_sample", "events 10x (distinct-value cumsum via two-phase)"),
    ("win_skyline_pareto", "orders 10x (two-phase running prev-max SFS)"),
    ("pipeline_semantic_funnel_ann", "embeddings 10x (LSH pair path + CC + two-phase rank)"),
    ("tokenize_bpe_apply", "documents 10x (vocab-bounded merge loop + broadcast join)"),
    # r11 additions: the trainer (vocab-bounded loop + 16 argmax rounds),
    # the train→apply composition, the batched ANN read path (50 probes,
    # ONE codes join), snapshot time travel (COW fold + 2 DPP reads), the
    # GROUPED_AGG Arrow surface, and the streaming PQ index append
    ("tokenize_bpe_train", "documents 10x (16 pair-count rounds over the vocab)"),
    ("tokenize_bpe_apply_learned", "documents 10x (learned-table encode, shared loop)"),
    ("sim_ann_ivf_pq_batch", "embeddings 10x (50 probes, one corpus encode + codes join)"),
    ("scan_snapshot_asof", "orders 10x (COW fold + 2 manifest-selected DPP reads)"),
    ("agg_pandas_udaf_trimmed_mean", "customer 10x (Arrow GROUPED_AGG, one shuffle)"),
    ("stream_pq_index_append", "embeddings 10x (4-wave encode + LUT join vs persisted codes)"),
    # r11 second-half waves: table-format depth (MOR deletes, partition
    # evolution, streaming snapshot writer), the capped LSH tuning report
    # (hot-bucket guard bounds per-bucket pair work at CAP^2), the
    # co-occurrence Jaccard miner, and the map-only ablation report
    ("scan_delete_vectors_mor", "orders 10x (two-leg MOR read, 3 as-of levels)"),
    ("scan_partition_evolution", "orders 10x (per-spec partition-pruned reads)"),
    ("stream_snapshot_cdc_apply", "orders 10x (3 COW wave folds + 4 as-of reads)"),
    ("dedup_lsh_tuning_report", "documents 10x (4 capped bandings + GEMM truth)"),
    ("graph_jaccard_neighbors", "lineitem 10x (co-order open-triangle join)"),
    ("curation_filter_ablation", "documents 10x (one scan, one aggregate, unpivot)"),
    ("events_attribution_position", "events 10x (user-keyed touch join + conv windows)"),
    ("multimodal_video_keyframe_dedup", "documents 10x (cut windows + digest agg)"),
    ("data_quality_expectations", "orders+lineitem 10x (2 scans + FK/temporal joins)"),
    # r12 additions: full-data rank stats, the unigram trainer family,
    # table-format maintenance (purge/expire/multi-table), checkpoint
    # recovery, incremental CC by contraction, integer-lattice IVF
    # maintenance, and the order-pinned power-iteration PCA
    ("stat_kendall_tau_full", "customer+orders 10x (3 integer groupBys + per-nation Fenwick)"),
    ("tokenize_unigram_train", "documents 10x (2 hard-EM rounds over the bounded vocab)"),
    ("tokenize_unigram_apply", "documents 10x (per-distinct-pt Viterbi + doc join)"),
    ("sink_rewrite_purge_deletes", "orders 10x (semi-join-scoped bucket rewrite + read-back)"),
    ("scan_snapshot_multi_table", "orders+lineitem 10x (atomic 2-relation commit, as-of joins)"),
    ("scan_snapshot_expire", "orders 10x (reachability anti-join + physical delete)"),
    ("stream_restart_exactly_once", "orders 10x (kill after crash wave, checkpoint replay)"),
    ("graph_cc_incremental", "lineitem 10x (base CC + supernode contraction wave)"),
    ("emb_pca_power_iteration", "embeddings 10x (one int64 Gram pass; 96 fixed driver steps)"),
    ("emb_ivf_cell_split", "embeddings 10x (int-lattice hot-cell 2-means + recall gate)"),
    ("stat_kruskal_wallis", "orders 10x (rank2 two-phase pass + 2 groupBys)"),
    ("ts_changepoint_binseg", "orders 10x (decimal rollup; calendar-bounded driver fit)"),
    ("scd2_merge_apply", "customer 10x (broadcast change batch, 3 joins)"),
    # r12 second-session (§2-W) additions: paired rank stats, ACF lag
    # self-join, the bloom/stats file indexes (metadata-bound by design),
    # weighted-replica banding, greedy tokenizer encode, ensemble gate,
    # branch merge, modularity over the pair graph, nprobe autotune rail
    ("stat_wilcoxon_signed_rank", "orders 10x (custkey groupBy + abs(d) groupBy + cumsum)"),
    ("ts_acf_lags", "orders 10x (day rollup; calendar-bounded 7-lag self-join)"),
    ("stat_cramers_v", "orders+customer 10x (fact-dim join, 25-cell pinned fold)"),
    ("graph_modularity", "documents 10x (LPA labels + 2 edge joins, exact-int Q)"),
    ("scan_bloom_index_prune", "orders 10x (files x 4096-bit index; 8 probes)"),
    ("ts_holt_linear_forecast", "orders 10x (day rollup; calendar-bounded driver fold)"),
    ("tokenize_wordpiece_apply", "documents 10x (per-distinct-pt greedy + doc join)"),
    ("emb_ivf_probe_autotune", "embeddings 10x (10-probe exact rail + 4 nprobe legs)"),
    ("stat_friedman_test", "orders+customer 10x (125-cell block ranks)"),
    ("text_feature_hashing", "documents 10x (distinct-token fold hash + join back)"),
    ("scan_snapshot_branch_merge", "orders 10x (4-gen COW chain, 4 ref reads)"),
    ("scan_agg_pushdown_stats", "orders 10x (manifest-only aggs + 2-file residual)"),
    ("dedup_minhash_weighted", "documents 10x (exact collapse first; <=4x shingles banded + wj verify on survivors)"),
    # r13 wave: the composed bill (staged — replica twins die at stage 1),
    # the coreness fixpoint (rides the ~100x-inflated replica pair graph,
    # the graph_modularity class), and the §2-Y additions
    ("dedup_pipeline_bill", "documents+embeddings 10x (5-stage bill; exact collapse kills replica twins first)"),
    ("graph_coreness", "documents 10x (h-index fixpoint; ~100x replica-inflated edge set)"),
    ("stat_cliffs_delta", "orders+customer 10x (value-count cumulatives via two-phase cumsum)"),
    ("curation_token_budget", "documents 10x (one groupBy(source); integer largest-remainder)"),
    ("sim_mmr_diversify", "embeddings 10x (one lattice-dot scan + TakeOrdered 20; driver fold)"),
    ("text_bigram_lm_logprob", "documents 10x (vocab-bounded count tables joined to bigram stream)"),
    ("multimodal_image_dhash", "documents 10x (map-only Arrow decode; integer luma gradients)"),
    ("stream_emb_index_ingest", "embeddings 10x (4-wave replay vs persisted sign-LSH index)"),
    ("win_running_distinct", "events 10x (two user-partitioned windows; first-flag cumsum)"),
    ("events_retention_curve_fit", "events 10x (one distinct user-week rollup; lag-spine joins)"),
    ("eval_rouge_ngram", "documents 10x (distinct ngram explode joined to per-lang reference sets)"),
    ("stat_ols_two_factor", "lineitem 10x (one scan, nine exact-decimal sufficient stats)"),
    ("events_markov_next_eval", "events 10x (lag window; margins on the 25-cell transition space)"),
    ("curation_quality_ensemble", "documents 10x (2 passes + doc join, 20-row rollup)"),
    ("emb_binary_hamming_topk", "embeddings 10x (2-word sign pack; popcount scan + exact rail)"),
]

# documents/embeddings have no cross-table joins in the probe keys — replicate
# rows with offset ids only
SIMPLE_OFFSETS = {
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}


def build_sf1(spark) -> None:
    from upflow_spark.io import TABLES, load

    os.makedirs(SF1, exist_ok=True)
    for t in TABLES:
        dst = f"{SF1}/{t}.parquet"
        if os.path.exists(dst):
            continue
        df = load(spark, SF01, t)
        offs = {**OFFSETS, **SIMPLE_OFFSETS}.get(t)
        if t == "events":
            # write back raw nanos so the sf1 dir round-trips through load()
            df = df.drop("ts").withColumnRenamed("ts_ns", "ts")
        if offs is None:
            out = df  # dims (region/nation/part/supplier) stay as-is
        else:
            parts = []
            for r in range(REPLICAS):
                p = df
                for col, stride in offs.items():
                    p = p.withColumn(col, F.col(col) + F.lit(r * stride))
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)
        print(f"built {dst}", flush=True)


def _force_compute(df) -> None:
    """Force full computation of every output column with a 1-row result.

    count() is NOT equivalent — Catalyst prunes unused columns/projections
    under it (and TakeOrderedAndProject shapes re-plan), so expression-heavy
    map work would be under-measured (ADVICE r4). xxhash64 over a struct of
    all columns makes every column load-bearing; falls back to per-column
    count() for types hash doesn't accept (e.g. MapType)."""
    from pyspark.sql.utils import AnalysisException

    try:
        # bit_xor, not sum: summing 64-bit hashes overflows long under
        # Spark 4's default ANSI mode; xor is overflow-free and still makes
        # every column load-bearing
        df.select(F.xxhash64(F.struct(*df.columns)).alias("h")).agg(
            F.bit_xor("h")
        ).collect()
    except AnalysisException:
        df.agg(*[F.count(c).alias(f"c{i}") for i, c in enumerate(df.columns)]).collect()


# keys whose sf1 RESULT SET is itself ~100x (every doc gains 9 exact
# twins, so the verified-pair table explodes): a py4j collect of ~40M rows
# would just measure driver materialization (and can exhaust driver heap)
# — for these the compute ratio is measured and collect is skipped.
COMPUTE_ONLY = {"dedup_simhash_pairs"}


def time_key(spark, key: str, sf_dir: str) -> tuple[float, float]:
    """(collect_sec, compute_sec): collect pays full driver transfer of the
    result set; compute forces every output column via a hash-all aggregate
    (1 output row) — the pair separates result-transfer scaling from the
    local-mode py4j transfer floor (~10 µs/row), which no cluster pays."""
    from upflow_spark import QUERIES

    if key in COMPUTE_ONLY:
        _force_compute(QUERIES[key](spark, sf_dir))  # warm
        t0 = time.perf_counter()
        _force_compute(QUERIES[key](spark, sf_dir))
        t_compute = time.perf_counter() - t0
        return float("nan"), t_compute
    QUERIES[key](spark, sf_dir).collect()  # warm
    t0 = time.perf_counter()
    QUERIES[key](spark, sf_dir).collect()
    t_collect = time.perf_counter() - t0
    t0 = time.perf_counter()
    _force_compute(QUERIES[key](spark, sf_dir))
    t_compute = time.perf_counter() - t0
    return t_collect, t_compute


def main() -> None:
    from upflow_spark.session import get_spark

    spark = get_spark("upflow-scale")
    build_sf1(spark)

    lines = [
        "# SCALE — measured 10x scaling ratios",
        "",
        "sf0.1 vs a 10x key-offset replica (see tools/scale_test.py for the",
        "construction — per-key cardinalities held constant). local[32], warm",
        "(2nd run). Two ratios per key: `collect` includes shipping the full",
        "result set to the driver over py4j (~10 µs/row — a local-mode-only",
        "floor; clusters write results distributed), `compute` forces every",
        "output column via a hash-all aggregate (xxhash64 over struct(*) —",
        "count() would let Catalyst prune map work, ADVICE r4) with a 1-row",
        "result. The",
        "COMPUTE ratio is the plan-shape signal; a near-linear compute ratio",
        "with a super-linear collect ratio means the result set grew 10x,",
        "not that a shuffle degenerated (verified r4: sessionize_gap compute",
        "1.7x vs collect 7.6x — its output is ~950k session rows at sf1).",
        "",
        "| key | reads | sf0.1 s | sf1 s | collect ratio | compute ratio |",
        "|---|---|---|---|---|---|",
    ]
    for key, reads in PROBE_KEYS:
        tc_small, tk_small = time_key(spark, key, SF01)
        tc_big, tk_big = time_key(spark, key, SF1)
        rc = tc_big / tc_small if tc_small > 0 else float("nan")
        rk = tk_big / tk_small if tk_small > 0 else float("nan")
        if key in COMPUTE_ONLY:  # report compute seconds; collect skipped
            lines.append(
                f"| {key} | {reads} | {tk_small:.3f} (compute) |"
                f" {tk_big:.3f} (compute) | n/a | {rk:.1f}x |"
            )
        else:
            lines.append(
                f"| {key} | {reads} | {tc_small:.3f} | {tc_big:.3f} |"
                f" {rc:.1f}x | {rk:.1f}x |"
            )
        print(lines[-1], flush=True)
    # PRESERVE the hand-written analysis below the marker: the r7 final
    # snapshot wholesale-rewrote SCALE.md and silently dropped 103 lines
    # of per-family analysis (VERDICT r7 item 3). Everything from the
    # marker on survives every regeneration mechanically.
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
    )
    analysis = ""
    marker = "<!-- ANALYSIS — preserved across table regenerations -->"
    if os.path.exists(path):
        with open(path) as fh:
            prev = fh.read()
        if marker in prev:
            analysis = prev[prev.index(marker):]
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n\n" + analysis)
    spark.stop()


if __name__ == "__main__":
    main()
