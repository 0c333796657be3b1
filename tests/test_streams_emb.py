"""stream_emb_index_ingest invariant (r10): the classification produced by
the INCREMENTALLY-grown LSH signature index must equal the one computed in
a single batch pass over the same corpus with the same fitted quantizer —
wave-by-wave index appends change nothing but the materialization order.
The dup_id_checksum row pins per-vector identity, not just counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from upflow_spark.registry import QUERIES


def _batch_reference(spark, sf_dir):
    """One-pass restatement: vector of wave w is near_dup iff some vector
    of a strictly earlier wave (static corpus = wave -1) shares bucket b0,
    or shares b1, and verifies at exact unit cosine >= 0.40."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector, vector_to_array

    from upflow_spark.io import load
    from upflow_spark.pipeline.similarity import _unit

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        _unit("embedding").alias("emb"),
        F.when(F.col("vec_id") % 10 != 0, F.lit(-1))
        .otherwise(((F.col("vec_id") % 40) / 10).cast("int"))
        .alias("wave"),
    )
    static = e.filter(F.col("wave") == -1)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=2,
        bucketLength=0.25,
        seed=42,
    )
    model = lsh.fit(static.select(array_to_vector("emb").alias("features")))
    sigs = model.transform(
        e.select("vec_id", "wave", "emb", array_to_vector("emb").alias("features"))
    ).select(
        "vec_id",
        "wave",
        "emb",
        *[
            F.element_at(vector_to_array(F.col("hashes")[t]), 1)
            .cast("long")
            .alias(f"b{t}")
            for t in range(2)
        ],
    )
    inc = sigs.filter(F.col("wave") >= 0).select(
        F.col("vec_id").alias("w_id"),
        F.col("wave").alias("w_wave"),
        F.col("emb").alias("w_emb"),
        F.col("b0").alias("wb0"),
        F.col("b1").alias("wb1"),
    )
    cand = inc.join(
        sigs,
        ((F.col("wb0") == F.col("b0")) | (F.col("wb1") == F.col("b1")))
        & (F.col("wave") < F.col("w_wave")),
    )
    cos = F.aggregate(
        F.zip_with("w_emb", "emb", lambda x, y: x * y),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    dup = cand.filter(cos >= 0.40).select(
        F.col("w_id").alias("vec_id"), F.col("w_wave").alias("wave")
    ).distinct()
    allv = inc.select(F.col("w_id").alias("vec_id"), F.col("w_wave").alias("wave"))
    marked = allv.join(dup.withColumn("hit", F.lit(1)), ["vec_id", "wave"], "left")
    return (
        marked.groupBy("wave")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.count(F.when(F.col("hit").isNotNull(), 1)).alias("n_dup"),
            F.count(F.when(F.col("hit").isNull(), 1)).alias("n_new"),
            F.sum(F.when(F.col("hit").isNotNull(), F.col("vec_id")))
            .cast("long")
            .alias("dup_id_checksum"),
        )
        .orderBy("wave")
    )


def test_incremental_equals_batch(spark, sf_dir):
    got = QUERIES["stream_emb_index_ingest"](spark, sf_dir).toPandas()
    want = _batch_reference(spark, sf_dir).toPandas()
    assert len(got) == 4  # four ingest waves
    assert got["n_vectors"].sum() > 0
    assert (
        got[["wave", "n_vectors", "n_dup", "n_new", "dup_id_checksum"]]
        .fillna(-1)
        .values.tolist()
        == want[["wave", "n_vectors", "n_dup", "n_new", "dup_id_checksum"]]
        .fillna(-1)
        .values.tolist()
    )


def test_report_is_consistent(spark, sf_dir):
    got = QUERIES["stream_emb_index_ingest"](spark, sf_dir).toPandas()
    assert (got["n_dup"] + got["n_new"]).equals(got["n_vectors"])
