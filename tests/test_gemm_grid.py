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
