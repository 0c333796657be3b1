"""IVF-style approximate nearest neighbor search (north star scale path #2,
complementing the LSH variant).

IVF (inverted file) structure: a coarse quantizer assigns every vector to
its nearest centroid cell; a probe searches only the `nprobe` closest cells
instead of the full corpus. Here the coarse centroids are the per-label mean
vectors (deterministic, already an operator — sim_centroid_per_label); a
production build would k-means them.

Scale: the cell assignment is one broadcast-centroid map pass; per-query
work drops from O(N) to O(N * nprobe / n_cells). Rows-only key (cell
assignment is float-order sensitive); tests/test_ops.py measures recall
against the exact brute-force top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.pipeline.similarity import _cos, _dbl
from upflow_spark.registry import query

NPROBE = 3
TOP_K = 10


@query("sim_ann_ivf")  # rows-only: float-order-sensitive cell assignment
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 neighbors of probe vec_id=0 searching only NPROBE IVF cells.

    1. build centroids (mean vector per label) — the inverted-file coarse
       quantizer; 2. rank cells by cosine to the probe, keep NPROBE;
    3. exact cosine only against vectors in those cells.
    """
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _dbl("embedding").alias("emb")
    )
    # coarse quantizer: label-mean centroids, reassembled to arrays
    ex = e.select("label", F.posexplode("emb").alias("pos", "v"))
    centroids = (
        ex.groupBy("label", "pos")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            "label", F.transform("pc", lambda s: s.getField("c")).alias("centroid")
        )
    )
    probe = e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("p"))
    # rank cells by cosine(centroid, probe); keep NPROBE closest
    cells = (
        centroids.crossJoin(F.broadcast(probe))
        .select("label", _cos(F.col("centroid"), F.col("p")).alias("cell_cos"))
        .orderBy(F.col("cell_cos").desc())
        .limit(NPROBE)
        .select("label")
    )
    # exact search restricted to the probed cells
    candidates = e.filter(F.col("vec_id") != 0).join(F.broadcast(cells), "label")
    cos = _cos(F.col("emb"), F.col("p"))
    return (
        candidates.crossJoin(F.broadcast(probe))
        .select("vec_id", "label", cos.alias("cos_raw"))
        .orderBy(F.col("cos_raw").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
        .select("vec_id", "label", r4(F.col("cos_raw")).alias("cos_sim"))
    )
