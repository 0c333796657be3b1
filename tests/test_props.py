"""Property-based algebraic invariants (SURVEY §5.5) on generated frames.

Small-data, high-coverage checks of the engine's building blocks: these hold
for ANY input, so hypothesis shrinks violations to minimal counterexamples.
Example counts are kept low — each example round-trips through the JVM.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=0,
    max_size=30,
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def make_df(spark, rows):
    return spark.createDataFrame(rows or [(0, 0.0, "a")], "k int, v float, tag string")


@given(rows=rows_strategy)
@SETTINGS
def test_filter_project_commute(spark, rows):
    df = make_df(spark, rows)
    a = df.filter(F.col("k") > 2).select("k", (F.col("v") * 2).alias("w"))
    b = df.select("k", (F.col("v") * 2).alias("w")).filter(F.col("k") > 2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


@given(rows=rows_strategy)
@SETTINGS
def test_union_counts_add(spark, rows):
    df = make_df(spark, rows)
    assert df.unionByName(df).count() == 2 * df.count()


@given(rows=rows_strategy)
@SETTINGS
def test_dedup_idempotent(spark, rows):
    df = make_df(spark, rows)
    once = df.dropDuplicates(["k", "tag"])
    twice = once.dropDuplicates(["k", "tag"])
    assert once.count() == twice.count()
    assert once.count() == df.select("k", "tag").distinct().count()


@given(rows=rows_strategy)
@SETTINGS
def test_window_topk_subset_of_global_sort(spark, rows):
    from pyspark.sql import Window

    df = make_df(spark, rows)
    w = Window.partitionBy("tag").orderBy(F.col("v").desc(), F.col("k").asc())
    topk = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    global_rows = {tuple(r) for r in df.collect()}
    assert all(tuple(r)[:3] in global_rows for r in topk.collect())
    # per-tag count is min(2, group size)
    sizes = {r["tag"]: r["n"] for r in df.groupBy("tag").agg(F.count("*").alias("n")).collect()}
    got = {r["tag"]: r["n"] for r in topk.groupBy("tag").agg(F.count("*").alias("n")).collect()}
    assert all(got[t] == min(2, n) for t, n in sizes.items() if t in got)


@given(
    vec=st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=1,
        max_size=16,
    )
)
@SETTINGS
def test_cosine_self_similarity_is_one(spark, vec):
    if all(abs(x) < 1e-6 for x in vec):
        return  # zero vector: cosine undefined
    from upflow_spark.pipeline.similarity import _cos, _unit

    df = spark.createDataFrame([(vec,)], "emb array<float>")
    got = df.select(_cos(_unit("emb"), _unit("emb")).alias("c")).collect()[0]["c"]
    assert abs(got - 1.0) < 1e-9


def test_entropy_bounds(spark, sf_dir):
    """0 <= char entropy <= ln(distinct chars) for every document."""
    import math

    from upflow_spark import QUERIES

    rows = QUERIES["text_char_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["char_entropy"] <= math.log(r["n_distinct_chars"]) + 1e-6, r


def test_temperature_weights_normalize(spark, sf_dir):
    """Sampling weights are a distribution and order languages by volume."""
    from upflow_spark import QUERIES

    rows = QUERIES["sample_temperature_weights"](spark, sf_dir).collect()
    assert abs(sum(r["sample_weight"] for r in rows) - 1.0) < 5e-4  # r4 rounding
    by_tokens = sorted(rows, key=lambda r: r["lang_tokens"])
    by_weight = sorted(rows, key=lambda r: r["sample_weight"])
    assert [r["lang"] for r in by_tokens] == [r["lang"] for r in by_weight]


def test_pack_bins_are_budgeted(spark, sf_dir):
    """Every bin except a language's last holds < 2048 + one-doc overflow."""
    from upflow_spark import QUERIES

    rows = QUERIES["pack_token_bins"](spark, sf_dir).collect()
    assert rows
    last_bin = {}
    for r in rows:
        last_bin[r["lang"]] = max(last_bin.get(r["lang"], -1), r["bin_id"])
    bins_of = {}
    for r in rows:
        bins_of.setdefault(r["lang"], set()).add(r["bin_id"])
    for lang, bins in bins_of.items():
        # bin ids are contiguous from 0 (cumsum-derived, no gaps)
        assert bins == set(range(last_bin[lang] + 1)), (lang, sorted(bins))
    # bin b's docs occupy cumsum range [first-start, next bin's first-start):
    # a bin underflows 2048 only by the previous bin's overflow and overflows
    # only by its own last doc — both bounded by one document's tokens
    max_doc = 2048  # corpus docs are well under one budget
    for r in rows:
        if r["bin_id"] < last_bin[r["lang"]]:
            assert 2048 - max_doc < r["bin_tokens"] < 2048 + max_doc, r


def test_decontaminate_counts_are_consistent(spark, sf_dir):
    from upflow_spark import QUERIES

    rows = QUERIES["curation_decontaminate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_contaminated"] + r["n_kept"] == r["n_docs"], r
