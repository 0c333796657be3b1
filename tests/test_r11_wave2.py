"""Behavioral invariants + plan pins for the round-11 second-wave keys
(§2-U): positional attribution, Kendall τ-b, neighbor Jaccard, filter
ablation, MOR delete vectors, partition evolution, LTTB downsampling, and
the LSH banding tuning report.

Hash equality vs DuckDB is covered by tests/test_oracle.py (registry
mirror); these tests pin the properties the hashes can't see — credit
conservation, set-nesting monotonicity, MOR row accounting, partition
pruning in the physical plan.
"""

from __future__ import annotations

import re

import pytest

import upflow_spark  # noqa: F401
from upflow_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, key: str) -> str:
    df = QUERIES[key](spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_attribution_position_conserves_credit(spark):
    """Basis-point credits must sum to exactly 1.0 per conversion, so the
    channel-level credit_conversions column must total the purchase count."""
    from pyspark.sql import functions as F

    from upflow_spark.io import load

    rows = QUERIES["events_attribution_position"](spark, SF).collect()
    total_credit = sum(r["credit_conversions"] for r in rows)
    n_purchases = (
        load(spark, SF, "events").filter(F.col("event_type") == "purchase").count()
    )
    assert abs(total_credit - n_purchases) < 1e-6
    assert {r["channel"] for r in rows} <= {"click", "view", "organic"}


def test_kendall_tau_bounds(spark):
    for r in QUERIES["stat_kendall_tau"](spark, SF).collect():
        n0 = r["n_sampled"] * (r["n_sampled"] - 1) // 2
        assert r["conc"] + r["disc"] <= n0
        assert r["ties_x"] <= n0 and r["ties_y"] <= n0
        assert abs(r["tau_b"]) <= 1.0 + 1e-9


def test_jaccard_neighbors_bounds(spark):
    rows = QUERIES["graph_jaccard_neighbors"](spark, SF).collect()
    assert rows, "no co-purchase pairs found at sf0.001"
    for r in rows:
        assert 0 < r["jaccard"] <= 1.0
        assert r["inter"] <= min(r["deg1"], r["deg2"])
        assert r["p1"] < r["p2"]


def test_filter_ablation_accounting(spark):
    rows = {r["filter_name"]: r for r in QUERIES["curation_filter_ablation"](spark, SF).collect()}
    per_filter = [rows[k] for k in ("short", "few_words", "word_len", "non_alpha")]
    any_row = rows["any"]
    for r in per_filter:
        assert r["n_fail_unique"] <= r["n_fail"] <= any_row["n_fail"]
    # docs failing exactly one filter = sum of per-filter unique removals
    assert sum(r["n_fail_unique"] for r in per_filter) == any_row["n_fail_unique"]


def test_mor_delete_accounting(spark):
    rows = {r["as_of"]: r for r in QUERIES["scan_delete_vectors_mor"](spark, SF).collect()}
    assert rows[0]["n_deletes_applied"] == 0
    for c in (1, 2):
        # every applied delete removes exactly one base row
        assert rows[0]["n_rows"] - rows[c]["n_rows"] == rows[c]["n_deletes_applied"]
    assert rows[1]["n_deletes_applied"] <= rows[2]["n_deletes_applied"]
    assert rows[1]["n_buckets_with_deletes"] <= rows[2]["n_buckets_with_deletes"]


def test_mor_read_is_broadcast_anti_no_smj(spark):
    """The MOR legs must stay broadcast anti/semi joins — a SortMergeJoin
    here means the bounded delete index shuffled the whole base table."""
    plan = _plan(spark, "scan_delete_vectors_mor")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_partition_evolution_prunes_both_specs(spark):
    """Each spec's scan must carry a PartitionFilters entry on its own
    partition columns (y for spec v1; y and mo for spec v2) — the per-spec
    pruning IS the operator's point."""
    plan = _plan(spark, "scan_partition_evolution")
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    nonempty = [ln for ln in pf if "(y" in ln or "y#" in ln]
    assert len(nonempty) >= 2, f"expected pruned scans on both specs:\n{pf}"
    assert any("mo" in ln for ln in nonempty), "spec v2 must prune on month too"


def test_partition_evolution_amplification(spark):
    rows = {r["spec"]: r for r in QUERIES["scan_partition_evolution"](spark, SF).collect()}
    assert rows["by_year_month"]["read_amplification"] == pytest.approx(1.0)
    assert rows["by_year"]["read_amplification"] >= 1.0
    assert rows["by_year"]["n_rows_scanned"] >= rows["by_year"]["n_rows_matched"]


def test_lttb_keeps_endpoints_and_bounds(spark):
    from pyspark.sql import functions as F

    from upflow_spark.io import load
    from upflow_spark.operators.timeseries2 import TSD_BUCKETS

    out = QUERIES["ts_downsample_lttb"](spark, SF).collect()
    by_type: dict = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    ev = (
        load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
        .collect()
    )
    ends = {r["event_type"]: (r["mn"], r["mx"]) for r in ev}
    for etype, rows in by_type.items():
        assert len(rows) <= TSD_BUCKETS
        ts_set = {r["ts"] for r in rows}
        # first and last points of each series always survive
        assert ends[etype][0] in ts_set
        assert ends[etype][1] in ts_set


def test_lsh_tuning_report_bounds_and_cap(spark):
    """Hits are bounded by both candidate and truth sets; the hot-bucket
    cap is the skew guard (single-position bands on a shared-vocab corpus
    MUST report hot buckets — the degeneracy the report exists to show),
    and uncapped nesting still holds where no bucket was skipped: a
    coarser banding with zero hot buckets is a SUBSET of any finer
    banding that also skipped nothing (r divides evenly)."""
    rows = {r["config"]: r for r in QUERIES["dedup_lsh_tuning_report"](spark, SF).collect()}
    order = ["b16r1", "b8r2", "b4r4", "b2r8"]
    for cfg in order:
        r = rows[cfg]
        assert r["n_hits"] <= min(r["n_candidates"], r["n_true"])
        assert r["n_hot_buckets"] >= 0
    assert rows["b16r1"]["n_hot_buckets"] > 0, (
        "single-position banding must overflow the cap on this corpus"
    )
    for finer, coarser in zip(order, order[1:]):
        if rows[finer]["n_hot_buckets"] == 0 and rows[coarser]["n_hot_buckets"] == 0:
            assert rows[finer]["n_candidates"] >= rows[coarser]["n_candidates"]
            assert rows[finer]["recall"] >= rows[coarser]["recall"]


def test_lsh_tuning_b4r4_matches_shipped_banding(spark):
    """The (4,4) config is exactly the shipped dedup_minhash_banded_pairs
    banding — when it skipped no hot bucket, its candidate count must
    equal the production candidate relation's."""
    from upflow_spark.pipeline.minhash_sql import _distinct_candidates

    rows = {r["config"]: r for r in QUERIES["dedup_lsh_tuning_report"](spark, SF).collect()}
    if rows["b4r4"]["n_hot_buckets"] == 0:
        shipped = _distinct_candidates(spark, SF).count()
        assert rows["b4r4"]["n_candidates"] == shipped
    else:  # capped: strictly fewer candidates than the uncapped relation
        shipped = _distinct_candidates(spark, SF).count()
        assert rows["b4r4"]["n_candidates"] < shipped


# ---- batch 3 (wave 3): VAD, KM survival, permutation test, HDR hist, CDC stream


def test_vad_segments_well_formed(spark):
    rows = QUERIES["multimodal_audio_vad_segments"](spark, SF).collect()
    assert rows
    by_doc: dict = {}
    for r in rows:
        assert r["n_frames"] == r["end_frame"] - r["start_frame"] + 1
        by_doc.setdefault(r["doc_id"], []).append(r)
    for segs in by_doc.values():
        segs.sort(key=lambda r: r["start_frame"])
        for i, r in enumerate(segs):
            assert r["seg_idx"] == i + 1
        for a, b in zip(segs, segs[1:]):
            # a gap of >= 1 unvoiced frame separates segments
            assert b["start_frame"] > a["end_frame"] + 1


def test_survival_km_monotone(spark):
    rows = sorted(
        QUERIES["events_survival_km"](spark, SF).collect(),
        key=lambda r: r["t_minutes"],
    )
    assert rows
    prev_s, prev_n = 1.0 + 1e-9, None
    for r in rows:
        assert 0.0 <= r["survival"] <= prev_s + 1e-9
        if prev_n is not None:
            assert r["n_at_risk"] <= prev_n
        assert r["n_events"] <= r["n_at_risk"]
        prev_s, prev_n = r["survival"], r["n_at_risk"]


def test_permutation_test_sane(spark):
    r = QUERIES["stat_permutation_test"](spark, SF).collect()[0]
    assert r["n_ge"] <= r["n_perms"]
    assert 0 < r["p_value"] <= 1.0
    assert r["stat_obs"] >= 0.0
    assert r["n_a"] > 0 and r["n_b"] > 0


def test_hdr_quantile_bucket_contains_exact(spark):
    rows = QUERIES["agg_hdr_histogram_quantiles"](spark, SF).collect()
    assert {r["quantile"] for r in rows} == {"p50", "p95", "p99"}
    for r in rows:
        # the chosen sketch bucket must bracket the true order statistic
        assert r["est_lo_cents"] <= r["exact_cents"] <= r["est_hi_cents"]
        assert r["rel_err_lo"] < 1.0  # log2 buckets: floor within 2x of truth


def test_stream_snapshot_cdc_versions(spark):
    rows = {r["version"]: r for r in QUERIES["stream_snapshot_cdc_apply"](spark, SF).collect()}
    assert set(rows) == {1, 2, 3, 4}
    # initial write rewrites every bucket; later versions only touched ones
    assert rows[1]["n_buckets_rewritten"] == rows[1]["n_buckets"]
    for v in (2, 3, 4):
        assert rows[v]["n_buckets_rewritten"] <= rows[v]["n_buckets"]
        assert rows[v]["n_buckets_rewritten"] > 0


def test_nested_struct_prune_reads_only_fin_leaves(spark):
    """Nested schema pruning: ReadSchema must contain the two fin leaves
    and must NOT decode the meta struct at all."""
    plan = _plan(spark, "scan_nested_struct_prune")
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert reads, "no parquet ReadSchema in plan"
    nested = [ln for ln in reads if "fin" in ln]
    assert nested, f"nested scan missing: {reads}"
    for ln in nested:
        assert "total" in ln and "odate" in ln
        assert "meta" not in ln, f"meta struct not pruned: {ln}"
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln and "total" in ln]
    assert pushed, "fin.total predicate not pushed to the nested scan"


def test_rake_scores_positive_and_bounded(spark):
    rows = QUERIES["text_keyword_rake"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_words"] <= 4
        assert r["n_occurrences"] >= 1
        # degree/freq >= 1 per word, so a phrase scores >= its word count
        assert r["score"] >= r["n_words"] - 1e-9
        assert len(r["phrase"].split(" ")) == r["n_words"]


def test_dedup_impact_report_accounting(spark):
    rows = QUERIES["curation_dedup_impact_report"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_removed"] <= r["n_clustered"] <= r["n_docs"]
        assert r["poison"] == 0
        assert 0.0 <= r["pct_removed"] <= 1.0
        if r["n_removed"] == 0:
            assert r["chars_removed"] == 0


def test_branch_refs_resolve_to_snapshot_states(spark):
    """'main' (v2) and 'audit-q1' (v1) must match the asof key's states."""
    refs = {r["ref_name"]: r for r in QUERIES["scan_branch_tag_refs"](spark, SF).collect()}
    asof = QUERIES["scan_snapshot_asof"](spark, SF).collect()
    by_v: dict = {}
    for r in asof:
        acc = by_v.setdefault(r["version"], [0, 0.0])
        acc[0] += r["n_rows"]
        acc[1] += r["sum_price"]
    assert refs["audit-q1"]["version"] == 1
    assert refs["main"]["version"] == 2
    assert refs["audit-q1"]["n_rows"] == by_v[1][0]
    assert refs["main"]["n_rows"] == by_v[2][0]


def test_video_keyframe_dedup_groups(spark):
    rows = QUERIES["multimodal_video_keyframe_dedup"](spark, SF).collect()
    assert rows, "fixture must contain cross-video duplicate shots"
    for r in rows:
        assert r["n_videos"] >= 2
        assert r["n_segments"] >= r["n_videos"]
        assert r["total_frames"] >= r["n_segments"]


def test_expectations_report_consistent(spark):
    """passed must mirror the violation count exactly; the structural
    checks (pk, nulls, domains, FK) hold on the fixture, while the
    temporal rule legitimately catches dirt at some sfs — the report's
    job is to COUNT it, not to hide it."""
    rows = {(r["table_name"], r["check_name"]): r
            for r in QUERIES["data_quality_expectations"](spark, SF).collect()}
    assert len(rows) == 8
    for r in rows.values():
        assert r["passed"] == (r["n_violations"] == 0)
        assert 0 <= r["n_violations"] <= r["n_checked"]
    for key in (("orders", "pk_unique"), ("orders", "custkey_not_null"),
                ("orders", "status_domain"), ("lineitem", "fk_orders")):
        assert rows[key]["passed"] is True, f"{key} failed"


def test_ab_lift_ci_brackets_diff(spark):
    r = QUERIES["events_ab_lift_hashbucket"](spark, SF).collect()[0]
    diff = r["mean_b"] - r["mean_a"]
    assert r["ci_lo"] <= diff + 1e-6 and diff - 1e-6 <= r["ci_hi"]
    assert r["n_a"] > 0 and r["n_b"] > 0


# ---- wave 6: filtered search, FDR, k-means++ seeding


def test_filtered_search_recall_bounds(spark):
    rows = QUERIES["sim_filtered_topk_prepost"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["n_post_found"] <= 5
        assert 0.0 <= r["post_recall"] <= 1.0
        assert r["top1_id"] is not None
        # top-1 of the filtered ranking is found iff it cracks the global
        # top-20; either way recall counts it consistently
        if r["post_recall"] == 1.0:
            assert r["n_post_found"] >= 1


def test_fdr_bh_step_up_properties(spark):
    rows = sorted(
        QUERIES["stat_fdr_bh"](spark, SF).collect(), key=lambda r: r["p_rank"]
    )
    assert len(rows) == 25
    # p ascending in rank; rejection set is a prefix (step-up property)
    for a, b in zip(rows, rows[1:]):
        assert a["p_value"] <= b["p_value"] + 1e-9
        assert not (b["rejected"] and not a["rejected"])
    for r in rows:
        assert 0.0 <= r["p_value"] <= 1.0 + 1e-9
        if r["rejected"]:
            # every rejected rank k satisfies exists j>=k with p_j <= j/m*a,
            # and its own p is below the largest accepted threshold
            assert r["p_value"] <= 25 / 25 * 0.05 + 1e-9


def test_kmeanspp_seeds_spread(spark):
    rows = sorted(
        QUERIES["emb_kmeanspp_init"](spark, SF).collect(),
        key=lambda r: r["seed_rank"],
    )
    assert [r["seed_rank"] for r in rows] == list(range(1, 9))
    assert rows[0]["min_dist"] is None
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 8, "seeds must be distinct"
    # greedy farthest-first: the min-distance sequence is non-increasing
    dists = [r["min_dist"] for r in rows[1:]]
    for a, b in zip(dists, dists[1:]):
        assert b <= a + 1e-9


# ---- wave 7: IVF cell stats, rollback, seasonal-naive backtest


def test_ivf_cell_stats_conservation(spark):
    rows = QUERIES["emb_ivf_cell_stats"](spark, SF).collect()
    assert rows
    total = sum(r["n_assigned"] for r in rows)
    native = sum(r["n_native"] for r in rows)
    for r in rows:
        assert 0 < r["n_native"] <= r["n_assigned"]
        assert 0.0 < r["purity"] <= 1.0
        assert r["load_factor"] > 0
    # load factors average ~1 by construction
    avg_load = sum(r["load_factor"] * r["n_assigned"] for r in rows) / total
    assert avg_load >= 1.0 - 1e-6
    assert native <= total


def test_rollback_restores_v1(spark):
    rows = {r["version"]: r for r in QUERIES["scan_time_travel_rollback"](spark, SF).collect()}
    assert rows[3]["is_rollback"] and not rows[1]["is_rollback"]
    assert rows[3]["n_rows"] == rows[1]["n_rows"]
    assert rows[3]["sum_price"] == rows[1]["sum_price"]
    assert rows[3]["n_buckets"] == rows[1]["n_buckets"]
    assert rows[2]["n_rows"] != rows[1]["n_rows"]


def test_snaive_backtest_shape(spark):
    rows = QUERIES["events_forecast_snaive_backtest"](spark, SF).collect()
    assert len(rows) == 7
    maes = {r["mae"] for r in rows}
    assert len(maes) == 1
    mae = maes.pop()
    hand = sum(r["abs_err"] for r in rows) / len(rows)
    assert abs(mae - hand) < 1e-3
    for r in rows:
        assert r["abs_err"] >= 0 and r["actual"] > 0
