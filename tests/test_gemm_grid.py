"""Grid-blocked GEMM fallback equivalence: forcing the packed B operand
past the broadcast ceiling must route the three GEMM-kernel keys through
the block-grid path and produce BYTE-IDENTICAL results (same normalized
frames) as the broadcast path — path selection is a memory decision, never
a semantics decision."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.harness import normalize
from upflow_spark.pipeline import dedup
from upflow_spark.registry import QUERIES

GEMM_KEYS = ["dedup_ngram_jaccard", "dedup_containment", "text_knn_jaccard_docs"]


@pytest.fixture(scope="module")
def grid_vs_broadcast(spark, sf_dir):
    """Run each GEMM key once per path, caches cleared around the flip."""
    results: dict[str, dict[str, pd.DataFrame]] = {}
    orig = dedup.GEMM_BROADCAST_MAX_BYTES
    try:
        dedup._corpus_cache.clear()
        dedup.GEMM_BROADCAST_MAX_BYTES = 1  # force every pack onto the grid
        for key in GEMM_KEYS:
            results.setdefault(key, {})["grid"] = normalize(
                QUERIES[key](spark, sf_dir).toPandas()
            )
    finally:
        dedup.GEMM_BROADCAST_MAX_BYTES = orig
        dedup._corpus_cache.clear()
    for key in GEMM_KEYS:
        results[key]["broadcast"] = normalize(QUERIES[key](spark, sf_dir).toPandas())
    return results


@pytest.mark.parametrize("key", GEMM_KEYS)
def test_grid_path_matches_broadcast(grid_vs_broadcast, key):
    got = grid_vs_broadcast[key]
    assert len(got["grid"]) > 0, f"{key}: grid path returned no rows (vacuous)"
    pd.testing.assert_frame_equal(got["grid"], got["broadcast"])


def test_grid_path_was_actually_selected(spark, sf_dir):
    """With the ceiling forced low the pack must return the grid marker,
    not a broadcast — guards against a future refactor quietly routing
    everything to the broadcast path and vacuously passing the test above."""
    from pyspark.sql import functions as F

    from upflow_spark.io import load
    from upflow_spark.pipeline.text import tokens_col

    orig = dedup.GEMM_BROADCAST_MAX_BYTES
    try:
        dedup.GEMM_BROADCAST_MAX_BYTES = 1
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", F.array_distinct(tokens_col()).alias("terms")
        )
        _, _, bc = dedup._packed_corpus(spark, docs)
        assert isinstance(bc, tuple) and bc[0] == "grid"
    finally:
        dedup.GEMM_BROADCAST_MAX_BYTES = orig


def test_large_vocab_pack_never_collects(spark):
    """r8 scale guard (closes the r7 verdict's one flag): on an
    open-vocabulary corpus the pack must not converge ANY row set on the
    driver. With the broadcast ceiling forced low (grid path — the route
    a corpus this wide would take for real), DataFrame.collect is patched
    to raise, and _packed_corpus must still build the grid operand over a
    corpus whose distinct-term count (~20k unique terms across 2k docs)
    dwarfs any per-doc set: term ids come from the distributed
    zipWithIndex + join, never a driver dict."""
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    # synthetic open vocabulary: every doc contributes 10 mostly-unique
    # terms (doc_id-salted), plus one shared term so pairs exist
    docs = (
        spark.range(2000)
        .select(
            F.col("id").alias("doc_id"),
            F.array_union(
                F.transform(
                    F.sequence(F.lit(0), F.lit(9)),
                    lambda i: F.concat(
                        F.lit("t"), (F.col("id") * 10 + i).cast("string")
                    ),
                ),
                F.array(F.lit("shared")),
            ).alias("terms"),
        )
    )
    orig_ceiling = dedup.GEMM_BROADCAST_MAX_BYTES
    orig_collect = DataFrame.collect

    def no_collect(self):
        raise AssertionError(
            "driver-side collect during open-vocab pack (the r7 scale flag)"
        )

    try:
        dedup.GEMM_BROADCAST_MAX_BYTES = 1
        DataFrame.collect = no_collect
        docs_ids, vocab_ids, bc = dedup._packed_corpus(spark, docs)
    finally:
        DataFrame.collect = orig_collect
        dedup.GEMM_BROADCAST_MAX_BYTES = orig_ceiling
    assert isinstance(bc, tuple) and bc[0] == "grid"
    n_vocab = bc[2]
    assert n_vocab == 2000 * 10 + 1
    # and the packed relation is consistent: every doc has its 11 ids
    row = docs_ids.filter(F.col("doc_id") == 7).head()
    assert len(row["term_ids"]) == 11
