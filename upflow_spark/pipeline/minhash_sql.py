"""Engine-agnostic MinHash: oracle-checked signatures + banded LSH pairs.

`dedup_near_minhash_lsh` (Spark ML MinHashLSH) is rows-only because ML hash
buckets aren't SQL-reproducible. These keys rebuild the SAME pipeline from
md5 primitives both engines share, so every stage is hash-verified by the
DuckDB oracle:

- signature: K=16 per-"permutation" hashes carved from FOUR md5 digests per
  term (md5(a || ':' || t) for a in 0..3, each split into four 32-bit hex
  chunks). The minhash property (P[min h_i(A) = min h_i(B)] = Jaccard(A,B))
  needs only a uniform hash per permutation, not a true permutation — and
  md5's 128 bits serve 4 chunks each, at 1/4 the hashing cost of one md5
  per permutation (measured 18.5 s -> ~6 s for the signature key at sf0.1).
- banded pairs: split the K-wide signature into B bands of R rows; candidate
  pairs agree on at least one whole band (P = 1-(1-J^R)^B). Band matches are
  EQUI-joins on (band_idx, band_hash) — bucket-local, never all-pairs; the
  estimated Jaccard is the fraction of agreeing signature positions.

At 100 TB this is exactly the shape you deploy: signatures are one
explode+groupBy pass (map-side combinable mins), banding is a narrow
projection, candidates shuffle only on band-hash buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.parity import r4
from upflow_spark.pipeline.text import SQL_TOKENS, tokens_col
from upflow_spark.registry import query

K_HASHES = 16
N_BANDS = 4  # 4 bands x 4 rows


def _sql_minhash_cols() -> str:
    return ",\n       ".join(
        f"min(CAST(('0x' || substr(h{i // 4}, {(i % 4) * 8 + 1}, 8)) AS BIGINT)) AS mh{i}"
        for i in range(K_HASHES)
    )


_SQL_SIG_CTE = f"""
tok AS (SELECT DISTINCT doc_id, unnest({SQL_TOKENS}) AS term FROM documents),
tokh AS (
  SELECT doc_id, md5('0:' || term) AS h0, md5('1:' || term) AS h1,
         md5('2:' || term) AS h2, md5('3:' || term) AS h3 FROM tok
),
sig AS (
  SELECT doc_id,
       {_sql_minhash_cols()}
  FROM tokh GROUP BY doc_id
)"""


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-file fixture -> 1 partition; spread before the per-term md5 work
    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    tok = d.select("doc_id", F.explode(tokens_col()).alias("term")).distinct()
    # project the two digests BEFORE the aggregate so each md5 is computed
    # once per (doc, term) row, not once per min() expression reading it
    tokh = tok.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{a}:"), F.col("term"))).alias(f"h{a}")
            for a in range(4)
        ],
    )
    return tokh.groupBy("doc_id").agg(
        *[
            F.min(
                F.conv(
                    F.substring(F.col(f"h{i // 4}"), (i % 4) * 8 + 1, 8), 16, 10
                ).cast("long")
            ).alias(f"mh{i}")
            for i in range(K_HASHES)
        ]
    )


@query(
    "dedup_minhash_signature",
    oracle=f"""
WITH
{_SQL_SIG_CTE}
SELECT * FROM sig
""",
)
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=16 MinHash signature per document, hash-verified against DuckDB.

    One explode + one groupBy: the min() aggregates are map-side combinable,
    so signature computation is a single shuffle of (doc_id, partial mins)
    regardless of corpus width.
    """
    return _signatures(spark, sf_dir)


@query(
    "dedup_minhash_banded_pairs",
    oracle=f"""
WITH
{_SQL_SIG_CTE},
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ({" + ".join(f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(K_HASHES))})
           AS n_agree
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE {" OR ".join(
      "(" + " AND ".join(f"a.mh{b * 4 + r} = b.mh{b * 4 + r}" for r in range(4)) + ")"
      for b in range(N_BANDS)
  )}
)
SELECT doc_a, doc_b,
       floor((CAST(n_agree AS DOUBLE) / {K_HASHES}) * 10000 + 0.5) / 10000
         AS jaccard_est
FROM cand
WHERE n_agree >= 15
""",
)
def dedup_minhash_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH near-dup candidates from the md5 MinHash signatures,
    verified by estimated Jaccard >= 0.9375 (15 of 16 positions agree —
    the analogue of the exact key's 0.95 cut; measured recall 0.91 of the
    exact J>=0.95 pairs at sf0.01, and the lower 12/16 cut admits 1.3M
    pairs at sf0.1 on this heavily-duplicated corpus).

    The Spark plan is the production topology: explode each signature into
    its 4 band structs, equi-join on (band_idx, band_hash), dropDuplicates
    the (a,b) candidates, then verify on the full signatures — candidates
    are generated bucket-locally (the oracle's OR-of-bands WHERE over an
    all-pairs join is the semantic spec, not the execution plan).
    """
    # materialize before the self-join: both sides read the signatures and
    # Spark does not share subplans — without this the explode+min-agg
    # lineage runs twice (same rationale as dedup_simhash_pairs)
    sig = _signatures(spark, sf_dir).localCheckpoint()
    # band value = the 4-tuple itself (struct equality join) — identical
    # semantics to the oracle's per-column band equality, no hash-collision
    # false-positive path to reason about
    bands = sig.select(
        "doc_id",
        *[F.col(f"mh{i}") for i in range(K_HASHES)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.struct(
                            *[
                                F.col(f"mh{b * 4 + r}").alias(f"r{r}")
                                for r in range(4)
                            ]
                        ).alias("band_hash"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", *[f"mh{i}" for i in range(K_HASHES)], "band.band_idx", "band.band_hash")
    a = bands.alias("a")
    b = bands.alias("b")
    n_agree = sum(
        F.when(F.col(f"a.mh{i}") == F.col(f"b.mh{i}"), 1).otherwise(0)
        for i in range(K_HASHES)
    )
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            n_agree.alias("n_agree"),
        )
        # verify BEFORE dedup: the agreement filter is codegen'd and cheap,
        # the distinct shuffles only survivors
        .filter(F.col("n_agree") >= 15)
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return cand.select(
        "doc_a",
        "doc_b",
        r4(F.col("n_agree").cast("double") / K_HASHES).alias("jaccard_est"),
    )
