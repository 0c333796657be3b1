"""Distributed PCA over the embeddings table via the Gram-matrix route —
the dimensionality-reduction stage of an embedding curation pipeline
(visualization, whitening, cheap pre-filter before ANN).

The only communication is a d×d (=64×64) Gram matrix: each partition
computes a PARTIAL Xᵀ X + column sums in one Arrow batch pass (numpy GEMM),
the 4096-value partials reduce through one tiny shuffle, and the
eigendecomposition happens on the driver — the canonical "model fits on the
driver, data never leaves the cluster" topology (same shape Spark ML's own
PCA uses: RowMatrix.computeGramianMatrix + local eigh). The projection back
over the distributed rows is a second map-only pass with the components
broadcast. Nothing here is quadratic in ROWS — 100 TB of embeddings changes
only the partial-Gram pass, which is embarrassingly parallel.

Rows-only key (no SQL oracle: eigendecomposition is not expressible in
DuckDB SQL); tests/test_ops.py cross-checks the full output against a
numpy-reference PCA on the collected table (orthonormal components,
descending explained variance, projection values equal up to per-component
sign).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.registry import query

N_COMPONENTS = 2


def _gram_and_mean(spark, emb: DataFrame):
    """(Gram = Xᵀ X, column-sum vector, n) via per-partition numpy partials."""
    import numpy as np
    import pandas as pd

    d = len(emb.select("embedding").first()["embedding"])

    def partial(batches):
        g = np.zeros((d, d), dtype=np.float64)
        s = np.zeros(d, dtype=np.float64)
        n = 0
        for pdf in batches:
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            if len(x):
                g += x.T @ x
                s += x.sum(axis=0)
                n += len(x)
        yield pd.DataFrame(
            {"g": [g.ravel().tolist()], "s": [s.tolist()], "n": [n]}
        )

    parts = emb.select("embedding").mapInPandas(
        partial, "g array<double>, s array<double>, n long"
    ).collect()  # one small row per partition (d²+d doubles), not row data
    gram = np.zeros((d, d), dtype=np.float64)
    ssum = np.zeros(d, dtype=np.float64)
    n = 0
    for r in parts:
        gram += np.array(r["g"], dtype=np.float64).reshape(d, d)
        ssum += np.array(r["s"], dtype=np.float64)
        n += r["n"]
    return gram, ssum, n


@query("emb_gram_pca")  # rows-only: eigendecomposition has no SQL oracle
def emb_gram_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto its corpus's top-2 principal
    components. Covariance from the distributed Gram matrix
    (C = (Xᵀ X − n μμᵀ)/(n−1)), eigh on the driver, deterministic
    sign convention (largest-|coordinate| entry of each component made
    positive), then a map-only broadcast projection of the CENTERED rows.
    """
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    gram, ssum, n = _gram_and_mean(spark, emb)
    mu = ssum / n
    cov = (gram - n * np.outer(mu, mu)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:N_COMPONENTS]
    comps = vecs[:, order].T  # (k, d)
    # deterministic sign: flip each component so its largest-|x| entry > 0
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    bc = spark.sparkContext.broadcast((comps, mu))

    def project(batches):
        c, m = bc.value
        for pdf in batches:
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64) - m
            p = x @ c.T
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "pc1": p[:, 0], "pc2": p[:, 1]}
            )

    out = emb.mapInPandas(project, "vec_id long, pc1 double, pc2 double")
    return out.select("vec_id", r4("pc1").alias("pc1"), r4("pc2").alias("pc2"))
