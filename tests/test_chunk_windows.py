"""llm_chunk_windows invariants beyond the hash oracle: the window map
must CONSERVE the token stream (per-window fills sum to the corpus total;
every window full except the tail; window ids contiguous from 0)."""

from __future__ import annotations

from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.pipeline.llmprep import CHUNK_W
from upflow_spark.pipeline.text import tokens_col
from upflow_spark.registry import QUERIES


def test_chunk_windows_conserve_tokens(spark, sf_dir):
    got = QUERIES["llm_chunk_windows"](spark, sf_dir).toPandas()
    total = (
        load(spark, sf_dir, "documents")
        .select(F.sum(F.size(tokens_col())).alias("n"))
        .collect()[0]["n"]
    )
    assert int(got["n_tokens"].sum()) == int(total)
    ids = sorted(got["window_id"].tolist())
    assert ids == list(range(len(ids)))  # contiguous from 0, no gaps
    full = got.sort_values("window_id")["n_tokens"].tolist()
    assert all(v == CHUNK_W for v in full[:-1])  # every window full...
    assert 0 < full[-1] <= CHUNK_W  # ...except the tail
    # doc spans are consistent: first_doc <= last_doc everywhere
    assert (got["first_doc"] <= got["last_doc"]).all()
