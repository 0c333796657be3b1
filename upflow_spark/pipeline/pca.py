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


@query("emb_pq_encode")  # rows-only: codebook training has no SQL oracle
def emb_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (PQ) encode of every embedding — the memory
    side of ANN infrastructure: split each 64-dim vector into 8 subvectors
    of 8 dims, learn a 16-codeword codebook per subspace, store each
    vector as 8 one-byte codes (64× compression) plus its reconstruction
    MSE.

    Codebooks are trained deterministically on a BOUNDED sample (first 256
    vectors by vec_id — a driver-safe limit-collect, the same "model on
    driver, data on cluster" topology as emb_gram_pca) with 2 Lloyd
    iterations per subspace in numpy; encoding is a map-only broadcast
    pass over the distributed rows. Rows-only; tests/test_ops.py
    exact-matches codes + MSE against a local numpy reference and bounds
    the reconstruction error.
    """
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sample = np.array(
        [
            r["embedding"]
            for r in emb.orderBy("vec_id").limit(256).collect()
        ],
        dtype=np.float64,
    )
    d = sample.shape[1]
    n_sub, k = 8, 16
    sub_d = d // n_sub
    books = []
    for s in range(n_sub):
        xs = sample[:, s * sub_d : (s + 1) * sub_d]
        cents = xs[:k].copy()  # deterministic seed: first k sample rows
        for _ in range(2):  # 2 Lloyd iterations
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                sel = assign == c
                if sel.any():
                    cents[c] = xs[sel].mean(axis=0)
        books.append(cents)
    bc = spark.sparkContext.broadcast(np.stack(books))  # (n_sub, k, sub_d)

    def encode(batches):
        cb = bc.value
        for pdf in batches:
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            codes = np.empty((len(x), n_sub), dtype=np.int64)
            recon = np.empty_like(x)
            for s in range(n_sub):
                xs = x[:, s * sub_d : (s + 1) * sub_d]
                d2 = ((xs[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1)
                codes[:, s] = a
                recon[:, s * sub_d : (s + 1) * sub_d] = cb[s][a]
            mse = ((x - recon) ** 2).mean(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "codes": [row.tolist() for row in codes],
                    "recon_mse": mse,
                }
            )

    out = emb.mapInPandas(
        encode, "vec_id long, codes array<long>, recon_mse double"
    )
    # codes flattened to a string: driver-hashable-output convention
    # (tests/test_driver_hashable.py — array cells break the driver's
    # pandas sort/hash canonicalizer)
    return out.select(
        "vec_id",
        F.array_join("codes", "-").alias("pq_code"),
        r4("recon_mse").alias("recon_mse"),
    )
