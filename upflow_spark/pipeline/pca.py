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


# squared L2 between two 8-dim double lists, summed IN ORDER (mirrors the
# numpy kernel's sequential inner fold)
def _sql_d2(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, 9), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


# one Lloyd iteration as SQL: assign every sample subvector to its nearest
# centroid in {prev} (argmin with codeword tie-break), then replace each
# non-empty codeword with the mean of its members (summed in sample order
# — the numpy axis-0 fold); empty codewords keep their previous value
def _sql_lloyd(prev: str, assign: str, out: str) -> str:
    return f"""
{assign} AS (
  SELECT s, rn, xs, c FROM (
    SELECT sub.s, sub.rn, sub.xs, {prev}.c,
           row_number() OVER (PARTITION BY sub.s, sub.rn
             ORDER BY {_sql_d2("sub.xs", f"{prev}.cent")} ASC, {prev}.c ASC) AS rk
    FROM sub JOIN {prev} ON sub.s = {prev}.s
  ) WHERE rk = 1
),
{out} AS MATERIALIZED (
  SELECT {prev}.s, {prev}.c, coalesce(u.cent, {prev}.cent) AS cent
  FROM {prev} LEFT JOIN (
    SELECT s, c, list(m ORDER BY pos) AS cent FROM (
      SELECT s, c, pos, list_sum(list(v ORDER BY rn)) / count(*) AS m
      FROM (SELECT s, c, rn, generate_subscripts(xs, 1) AS pos,
                   unnest(xs) AS v
            FROM {assign})
      GROUP BY s, c, pos
    ) GROUP BY s, c
  ) u ON {prev}.s = u.s AND {prev}.c = u.c
)"""


# the trained-codebook CTE chain (samp → sub → c0 → a1/c1 → a2/c2),
# shared by emb_pq_encode's oracle, sim_ann_ivf_pq's (ann_ivf.py), and —
# parameterized on the training relation — stream_pq_index_append's
# (streams.py trains on the static vec_id%10<>0 split)
def pq_train_ctes(source: str = "embeddings") -> str:
    return f"""samp AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS rn, embedding
  FROM (SELECT vec_id, embedding FROM {source} ORDER BY vec_id LIMIT 256)
),
sub AS MATERIALIZED (
  SELECT rn, ss.s AS s,
         list_transform(range(1, 9),
           i -> CAST(embedding[ss.s * 8 + i] AS DOUBLE)) AS xs
  FROM samp, (SELECT unnest(range(0, 8)) AS s) ss
),
c0 AS MATERIALIZED (
  SELECT s, rn AS c, xs AS cent FROM sub WHERE rn < 16
),{_sql_lloyd("c0", "a1", "c1")},{_sql_lloyd("c1", "a2", "c2")}"""


PQ_TRAIN_CTES = pq_train_ctes()


_PQ_ORACLE = f"""
WITH {PQ_TRAIN_CTES},
esub AS (
  SELECT vec_id, ss.s AS s,
         list_transform(range(1, 9),
           i -> CAST(embedding[ss.s * 8 + i] AS DOUBLE)) AS xs
  FROM embeddings, (SELECT unnest(range(0, 8)) AS s) ss
),
enc AS (
  SELECT vec_id, s, c, d2 FROM (
    SELECT esub.vec_id, esub.s, c2.c,
           {_sql_d2("esub.xs", "c2.cent")} AS d2,
           row_number() OVER (PARTITION BY esub.vec_id, esub.s
             ORDER BY {_sql_d2("esub.xs", "c2.cent")} ASC, c2.c ASC) AS rk
    FROM esub JOIN c2 ON esub.s = c2.s
  ) WHERE rk = 1
)
SELECT vec_id,
       string_agg(c, '-' ORDER BY s) AS pq_code,
       floor((sum(d2) / 64) * 10000 + 0.5) / 10000 AS recon_mse
FROM enc GROUP BY vec_id
"""


PQ_N_SUB, PQ_K = 8, 16


def _pq_train(spark: SparkSession, sf_dir: str):
    """Deterministic PQ codebooks (n_sub, k, sub_d) — first-256-by-vec_id
    sample, first-k seeds, 2 Lloyd iterations, all numpy float64 on the
    driver (bounded). Shared by emb_pq_encode and sim_ann_ivf_pq; the SQL
    twin is _PQ_TRAIN (same fold order, proven code-exact)."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return _pq_train_on(emb)


def _pq_train_on(emb):
    """_pq_train's kernel over an arbitrary (vec_id, embedding) relation —
    the streaming index key trains on the STATIC corpus only, so the
    trainer must take the relation, not the fixture dir."""
    import numpy as np

    sample = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").limit(256).collect()],
        dtype=np.float64,
    )
    sub_d = sample.shape[1] // PQ_N_SUB
    books = []
    for s in range(PQ_N_SUB):
        xs = sample[:, s * sub_d : (s + 1) * sub_d]
        cents = xs[:PQ_K].copy()  # deterministic seed: first k sample rows
        for _ in range(2):  # 2 Lloyd iterations
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(PQ_K):
                sel = assign == c
                if sel.any():
                    # sequential in-order IEEE fold, NOT xs[sel].mean(axis=0):
                    # np.mean switches to pairwise summation past ~128
                    # members, which can drift a ULP from DuckDB's in-order
                    # list_sum and silently shift a centroid. Boolean-mask
                    # selection preserves sample (rn) order, so this loop is
                    # the exact twin of list_sum(list(v ORDER BY rn)).
                    m = xs[sel]
                    acc = np.zeros(sub_d, dtype=np.float64)
                    for row in m:
                        acc += row
                    cents[c] = acc / len(m)
        books.append(cents)
    return np.stack(books)  # (n_sub, k, sub_d)


def _pq_encode_df(spark: SparkSession, emb: DataFrame, books) -> DataFrame:
    """(vec_id, codes array<long>, recon_mse) for every row of emb —
    map-only Arrow pass against the broadcast codebooks."""
    import numpy as np
    import pandas as pd

    n_sub = books.shape[0]
    sub_d = books.shape[2]
    bc = spark.sparkContext.broadcast(books)

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

    return emb.mapInPandas(encode, "vec_id long, codes array<long>, recon_mse double")


@query("emb_pq_encode", oracle=_PQ_ORACLE)  # hash-checked as of r10
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
    pass over the distributed rows.

    HASH-CHECKED as of r10 (was rows-only): the training loop unrolls to
    SQL — seeded centroids are literal sample rows, each Lloyd step is an
    argmin window + per-(codeword, dim) mean summed in sample order
    (list(v ORDER BY rn) → list_sum, mirroring numpy's sequential axis-0
    fold) — so DuckDB reproduces the exact codebooks and codes; recon_mse
    is r4-rounded. tests/test_ops.py additionally exact-matches codes +
    MSE against a local numpy reference and bounds the reconstruction
    error.
    """
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    books = _pq_train(spark, sf_dir)
    out = _pq_encode_df(spark, emb, books)
    # codes flattened to a string: driver-hashable-output convention
    # (tests/test_driver_hashable.py — array cells break the driver's
    # pandas sort/hash canonicalizer)
    return out.select(
        "vec_id",
        F.array_join("codes", "-").alias("pq_code"),
        r4("recon_mse").alias("recon_mse"),
    )


# ---------------------------------------------------------------------------
# Matryoshka prefix-dimension evaluation

MRL_KS = (8, 16, 32, 64)  # prefix dims; 64 = the fixture's full dimension
MRL_N_PROBES = 50


def _sql_pcos(a: str, b: str, k: int) -> str:
    """DuckDB cosine over the first-k prefix, normalize-elementwise (the
    _sql_cos FP tree restricted to a slice)."""
    na = (
        f"sqrt(list_sum(list_transform({a}[1:{k}], "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )
    nb = (
        f"sqrt(list_sum(list_transform({b}[1:{k}], "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )
    return (
        f"list_sum(list_transform(range(1, {k} + 1), "
        f"i -> (CAST({a}[i] AS DOUBLE) / {na}) * (CAST({b}[i] AS DOUBLE) / {nb})))"
    )


_MRL_STACK = "\nUNION ALL\n".join(
    f"SELECT probe_id, vec_id, CAST({k} AS BIGINT) AS k, cos_{k} AS cos FROM prs"
    for k in MRL_KS
)


@query(
    "emb_matryoshka_agreement",
    oracle=f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
  WHERE vec_id < {MRL_N_PROBES}
),
prs AS (
  SELECT p.probe_id, e.vec_id,
         {", ".join(f"{_sql_pcos('p.pe', 'e.embedding', k)} AS cos_{k}" for k in MRL_KS)}
  FROM probes p JOIN embeddings e ON e.vec_id <> p.probe_id
),
stacked AS (
{_MRL_STACK}
),
top AS (
  SELECT probe_id, k, vec_id AS neighbor, cos
  FROM (
    SELECT probe_id, k, vec_id, cos,
           row_number() OVER (PARTITION BY probe_id, k
                              ORDER BY cos DESC, vec_id ASC) AS rn
    FROM stacked
  ) WHERE rn = 1
),
full64 AS (SELECT probe_id, neighbor AS full_neighbor FROM top WHERE k = 64)
SELECT t.k, CAST(count(*) AS BIGINT) AS n_probes,
       CAST(count(*) FILTER (t.neighbor = f.full_neighbor) AS BIGINT) AS n_agree,
       floor((CAST(count(*) FILTER (t.neighbor = f.full_neighbor) AS DOUBLE)
              / count(*)) * 10000 + 0.5) / 10000 AS agree_rate,
       floor((avg(t.cos)) * 10000 + 0.5) / 10000 AS mean_top1_cos
FROM top t JOIN full64 f ON t.probe_id = f.probe_id
GROUP BY t.k
""",
)
def emb_matryoshka_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation evaluation (Kusupati et al. 2022): for each
    prefix dimension k ∈ {8,16,32,64}, find every probe's top-1 neighbor
    using only the first k embedding dims (renormalized) and report how
    often it AGREES with the full-dimension choice — the measurement that
    decides how hard embeddings can be truncated (emb_truncate_renorm)
    before ANN quality degrades.

    One map-side pass precomputes each vector's unit-normalized prefixes
    (checkpointed — both join sides reuse it), one probe-broadcast join
    scores all prefixes per pair, a (probe,k)-partitioned window picks
    top-1, and a 4-row rollup compares against the k=64 column.

    Scale: probe set is fixed (50), so the pair stage is 50·n map-side work
    under a broadcast — the corpus is scanned once and never shuffled; at
    100 TB you'd route it through IVF cells first (sim_ann_ivf) exactly as
    for any other query batch.
    """
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")

    def unit_k(k: int):  # noqa: ANN202
        d = F.transform(F.slice("embedding", 1, k), lambda x: x.cast("double"))
        norm = F.sqrt(F.aggregate(d, F.lit(0.0), lambda s, v: s + v * v))
        return F.transform(d, lambda x: x / norm)

    base = (
        e.repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", *[unit_k(k).alias(f"u{k}") for k in MRL_KS])
        .localCheckpoint()
    )
    probes = base.filter(F.col("vec_id") < MRL_N_PROBES).select(
        F.col("vec_id").alias("probe_id"), *[F.col(f"u{k}").alias(f"pu{k}") for k in MRL_KS]
    )
    pairs = base.join(
        F.broadcast(probes), F.col("vec_id") != F.col("probe_id")
    ).select(
        "probe_id",
        "vec_id",
        *[
            F.aggregate(
                F.zip_with(f"pu{k}", f"u{k}", lambda x, y: x * y),
                F.lit(0.0),
                lambda s, v: s + v,
            ).alias(f"cos_{k}")
            for k in MRL_KS
        ],
    )
    stacked = pairs.select(
        "probe_id",
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("k"), F.col(f"cos_{k}").alias("cos")
                    )
                    for k in MRL_KS
                ]
            )
        ).alias("kc"),
    ).select("probe_id", "vec_id", "kc.k", "kc.cos")
    w = Window.partitionBy("probe_id", "k").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    top = (
        stacked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("probe_id", "k", F.col("vec_id").alias("neighbor"), "cos")
    )
    full = top.filter(F.col("k") == 64).select(
        "probe_id", F.col("neighbor").alias("full_neighbor")
    )
    return (
        top.join(F.broadcast(full), "probe_id")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.count_if(F.col("neighbor") == F.col("full_neighbor")).alias("n_agree"),
            r4(
                F.count_if(F.col("neighbor") == F.col("full_neighbor")).cast("double")
                / F.count(F.lit(1))
            ).alias("agree_rate"),
            r4(F.avg("cos")).alias("mean_top1_cos"),
        )
    )


@query(
    "emb_outlier_mahalanobis",
    oracle="""
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
dim AS (
  SELECT pos, CAST(count(*) AS DOUBLE) AS n,
         avg(v) AS mu, avg(v * v) AS m2
  FROM ex GROUP BY pos
),
scored AS (
  SELECT e.vec_id,
         sum((e.v - d.mu) * (e.v - d.mu) / (d.m2 - d.mu * d.mu)) AS score
  FROM ex e JOIN dim d ON e.pos = d.pos
  GROUP BY e.vec_id
)
SELECT vec_id, floor(score * 10000 + 0.5) / 10000 AS maha_sq
FROM scored
ORDER BY score DESC, vec_id ASC
LIMIT 20
""",
)
def emb_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier detection: top-20 vectors by DIAGONAL Mahalanobis
    distance² (per-dimension standardized deviation, Σ_j (x_j−μ_j)²/σ²_j) —
    the cheap corpus-hygiene pass a semantic-dedup pipeline runs first
    (SemDeDup prunes clusters; this prunes the vectors too WEIRD to cluster:
    encoder failures, garbage inputs, wrong-modality rows).

    The 64-row per-dimension moment table is a posexplode + groupBy(pos)
    partial aggregate that broadcasts back; scoring is one more keyed agg.
    The full covariance version of this statistic is exactly what
    emb_gram_pca's Gram matrix provides — the diagonal variant keeps it
    SQL-expressible and oracle-checked.

    Parity note: μ and E[x²] accumulate in engine order (continuous values,
    4dp-collision-free — the sim_centroid_per_label precedent), and the
    per-vector sum over 64 dims is likewise continuous.
    """
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "v"
        ),
    )
    dim = ex.groupBy("pos").agg(
        F.avg("v").alias("mu"), F.avg(F.col("v") * F.col("v")).alias("m2")
    )
    var = F.col("m2") - F.col("mu") * F.col("mu")
    dev = F.col("v") - F.col("mu")
    scored = (
        ex.join(F.broadcast(dim), "pos")
        .groupBy("vec_id")
        .agg(F.sum(dev * dev / var).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(20)
        .select("vec_id", r4(F.col("score")).alias("maha_sq"))
    )


# ---------------------------------------------------------------------------
# Hash-checked PCA via power iteration (r12): the integer-lattice + order-
# pinned-fold discipline extended to iterative linear algebra.

PI_SCALE = 10**6  # lattice scale: products sum exactly in int64 at any sf
PI_ITERS = 96  # fixed iteration budget — parity needs sameness, not
# convergence: both engines run the same 96 steps bit-for-bit


def _pi_oracle() -> str:
    T = PI_ITERS
    parts = [
        """ev AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS e
  FROM embeddings
)""",
        """gm AS MATERIALIZED (
  SELECT a.pos AS i, b.pos AS j, CAST(sum(a.e * b.e) AS BIGINT) AS g
  FROM ev a JOIN ev b ON a.vec_id = b.vec_id
  GROUP BY a.pos, b.pos
)""",
        "v1_0 AS (SELECT DISTINCT i AS j, 0.125 AS val FROM gm)",
    ]
    for c in (1, 2):
        src, gexpr = ("gm", "CAST(g.g AS DOUBLE)") if c == 1 else ("g2", "g.gd")
        for t in range(T):
            parts.append(f"""w{c}_{t} AS MATERIALIZED (
  SELECT g.i AS j, list_sum(list({gexpr} * v.val ORDER BY g.j)) AS w
  FROM {src} g JOIN v{c}_{t} v ON v.j = g.j GROUP BY g.i
)""")
            parts.append(f"""n{c}_{t} AS MATERIALIZED (
  SELECT sqrt(list_sum(list(w * w ORDER BY j))) AS nrm FROM w{c}_{t}
)""")
            parts.append(f"""v{c}_{t + 1} AS MATERIALIZED (
  SELECT j, w / nrm AS val FROM w{c}_{t}, n{c}_{t}
)""")
        parts.append(f"""lam{c} AS MATERIALIZED (
  SELECT list_sum(list({gexpr} * va.val * vb.val ORDER BY g.i, g.j)) AS lam
  FROM {src} g JOIN v{c}_{T} va ON va.j = g.i
  JOIN v{c}_{T} vb ON vb.j = g.j
)""")
        if c == 1:
            parts.append(f"""g2 AS MATERIALIZED (
  SELECT g.i, g.j, CAST(g.g AS DOUBLE) - l.lam * va.val * vb.val AS gd
  FROM gm g
  JOIN v1_{T} va ON va.j = g.i
  JOIN v1_{T} vb ON vb.j = g.j
  CROSS JOIN lam1 l
)""")
            parts.append("v2_0 AS (SELECT j, val FROM v1_0)")
    from upflow_spark.parity import R4 as _R4

    return (
        "WITH\n" + ",\n".join(parts) + "\n"
        f"SELECT v1.j AS pos, {_R4('v1.val')} AS pc1, {_R4('v2.val')} AS pc2,\n"
        f"       {_R4('l1.lam')} AS lam1, {_R4('l2.lam')} AS lam2\n"
        f"FROM v1_{T} v1 JOIN v2_{T} v2 ON v2.j = v1.j\n"
        f"CROSS JOIN lam1 l1 CROSS JOIN lam2 l2"
    )


@query("emb_pca_power_iteration", oracle=_pi_oracle())
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 PCA of the (uncentered) embedding Gram matrix via POWER
    ITERATION with deflation — the HASH-CHECKED rail beside emb_gram_pca
    (whose LAPACK eigh is rows-only by necessity): the r12 integer-lattice
    discipline extended to iterative linear algebra.

    Why this verifies when eigh cannot: (1) the Gram matrix is EXACT —
    components quantized once to a 1e-6 lattice, so the distributed
    partial XᵀX sums are order-free int64 and both engines hold identical
    64×64 integers (all < 2^53, so their doubles are exact too); (2) the
    iteration is a fixed 24-step schedule whose every fold is ORDER-PINNED
    (matvec accumulates over j ascending, norms over i ascending, λ over
    (i, j) — DuckDB's list(… ORDER BY) → list_sum equals the driver's
    sequential loop bit-for-bit); (3) deflation (G₂ = G − λ v vᵀ) is an
    elementwise expression over already-identical scalars. Parity
    therefore needs SAMENESS, not convergence. The fixture's random
    spectrum is nearly flat (top gaps ~2%), so the fixed schedule lands
    in the dominant SUBSPACE rather than isolating exact eigenvectors —
    tests/test_r12.py pins the Rayleigh bounds (each λ ≤ eigh's λmax and
    ≥95% of its eigh counterpart, unit norms, near-orthogonality).

    Scale topology unchanged from emb_gram_pca: one Arrow pass of d×d
    integer partials (order-free, so any partition layout), one tiny
    reduce, a 64×64 model fit on the driver. Output: per-dim loadings of
    the top-2 components + their eigenvalues (r4).
    """
    import math

    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    first = emb.select("embedding").first()["embedding"]
    d = len(first)

    def partial(batches):  # noqa: ANN001, ANN202
        g = np.zeros((d, d), dtype=np.int64)
        for pdf in batches:
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            if len(x):
                xi = np.floor(x * PI_SCALE + 0.5).astype(np.int64)
                g += xi.T @ xi  # integer matmul: exact, order-free
        yield pd.DataFrame({"g": [g.ravel().tolist()]})

    parts = emb.select("embedding").mapInPandas(
        partial, "g array<long>"
    ).collect()
    gi = np.zeros((d, d), dtype=np.int64)
    for r in parts:
        gi += np.asarray(r["g"], dtype=np.int64).reshape(d, d)
    g = [[float(int(gi[i][j])) for j in range(d)] for i in range(d)]

    def power(mat):  # noqa: ANN001, ANN202 — order-pinned sequential folds
        v = [0.125] * d
        for _ in range(PI_ITERS):
            w = []
            for i in range(d):
                acc = 0.0
                for j in range(d):
                    acc += mat[i][j] * v[j]
                w.append(acc)
            acc = 0.0
            for i in range(d):
                acc += w[i] * w[i]
            nrm = math.sqrt(acc)
            v = [x / nrm for x in w]
        lam = 0.0
        for i in range(d):
            for j in range(d):
                lam += mat[i][j] * v[i] * v[j]
        return v, lam

    v1, lam1 = power(g)
    g2 = [
        [g[i][j] - lam1 * v1[i] * v1[j] for j in range(d)] for i in range(d)
    ]
    v2, lam2 = power(g2)

    def r4f(x: float) -> float:
        return math.floor(x * 10000 + 0.5) / 10000

    rows = [
        (i + 1, r4f(v1[i]), r4f(v2[i]), r4f(lam1), r4f(lam2))
        for i in range(d)
    ]
    return spark.createDataFrame(
        rows, "pos long, pc1 double, pc2 double, lam1 double, lam2 double"
    )
