"""Near-duplicate cluster resolution — the step after pair generation.

Pair generators (dedup_simhash_pairs, dedup_near_minhash_lsh) emit edges;
an actual dedup pipeline must then group transitively-connected documents
and keep one canonical representative per group. That is connected
components, computed here with iterative min-label propagation — each
round every node adopts the smallest label among itself and its neighbors,
converging in O(component diameter) rounds to label = min doc_id of the
component.

Scale: each round is one edge⋈label shuffle + one groupBy — the classic
MapReduce CC. Diameters of near-dup graphs are tiny (dup clusters are
near-cliques), so 3-5 rounds typically suffice; for adversarial long-chain
graphs switch to the large-star/small-star alternation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), which converges
in O(log²n) with the same join primitive. Lineage is truncated per round
with localCheckpoint so the plan doesn't grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from upflow_spark.pipeline.dedup import SQL_TOKENS, _simhash_bits, dedup_simhash_pairs
from upflow_spark.registry import query

MAX_ROUNDS = 20

_PAIRS_CTE = f"""
sig AS (
  SELECT doc_id, {" || ".join(_simhash_bits("term"))} AS simhash
  FROM (SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents)
  GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE (substr(a.simhash, 1, 8) = substr(b.simhash, 1, 8)
      OR substr(a.simhash, 9, 8) = substr(b.simhash, 9, 8)
      OR substr(a.simhash, 17, 8) = substr(b.simhash, 17, 8)
      OR substr(a.simhash, 25, 8) = substr(b.simhash, 25, 8))
    AND len(list_filter(range(1, 33),
            i -> substr(a.simhash, i, 1) <> substr(b.simhash, i, 1))) <= 3
)"""


@query(
    "dedup_cluster_cc",
    oracle=f"""
WITH RECURSIVE
{_PAIRS_CTE},
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT u AS n FROM edges),
reach AS (
  SELECT n, n AS m FROM nodes
  UNION
  SELECT r.n, e.v AS m FROM reach r JOIN edges e ON e.u = r.m
)
SELECT n AS doc_id, min(m) AS cluster_id,
       n = min(m) AS is_canonical
FROM reach GROUP BY n
""",
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over SimHash near-dup pairs: (doc_id,
    cluster_id, is_canonical), cluster_id = min doc_id of the component.

    The oracle proves transitive-closure semantics independently (DuckDB
    recursive CTE); Spark computes the same fixpoint distributively.
    """
    pairs = dedup_simhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("u").alias("doc_id")).distinct().withColumn(
        "lbl", F.col("doc_id")
    )
    # size the iteration's shuffles to the LABEL table (tiny: one row per
    # node in a dup cluster), not the session default — same per-query
    # sizing pattern as streaming's run_to_completion; each round is 2
    # joins + 1 agg, so partition-count overhead multiplies by ~3x rounds
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        return _cc_fixpoint(edges, labels)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def _cc_fixpoint(edges: DataFrame, labels: DataFrame) -> DataFrame:
    # labels only ever DECREASE, so sum(lbl) strictly decreases until the
    # fixpoint — a one-scan convergence check, no self-join needed
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    for _ in range(MAX_ROUNDS):
        neighbor_min = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("lbl").alias("nmin"))
        )
        propagated = labels.join(
            neighbor_min, labels.doc_id == neighbor_min.u, "left_outer"
        ).select(
            "doc_id",
            F.least(F.col("lbl"), F.coalesce(F.col("nmin"), F.col("lbl"))).alias("lbl"),
        )
        # pointer jumping: lbl(n) <- lbl(lbl(n)). Every label is itself a
        # node id, so one extra self-join halves remaining path lengths —
        # convergence drops from O(diameter) to O(log diameter) rounds
        # (hash-to-min, cf. Rastogi et al., "Finding Connected Components
        # in MapReduce", ICDE'13)
        parent = propagated.select(
            F.col("doc_id").alias("p_id"), F.col("lbl").alias("p_lbl")
        )
        new_labels = (
            propagated.join(parent, propagated.lbl == parent.p_id, "left_outer")
            .select(
                "doc_id",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("p_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint()  # eager: cut lineage, materialize this round
        )
        labels = new_labels
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(
        "doc_id",
        F.col("lbl").alias("cluster_id"),
        (F.col("doc_id") == F.col("lbl")).alias("is_canonical"),
    )


@query(
    "dedup_apply_canonical",
    oracle=f"""
WITH RECURSIVE
{_PAIRS_CTE},
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT u AS n FROM edges),
reach AS (
  SELECT n, n AS m FROM nodes
  UNION
  SELECT r.n, e.v AS m FROM reach r JOIN edges e ON e.u = r.m
),
cc AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n)
SELECT d.doc_id, d.lang, length(d.text) AS content_len
FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
WHERE cc.doc_id IS NULL OR cc.doc_id = cc.cluster_id
""",
)
def dedup_apply_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's actual OUTPUT: the document corpus with every
    non-canonical near-duplicate dropped (docs outside any dup cluster pass
    through; each cluster keeps its min-doc_id representative).

    Composition: pair generation (banded SimHash) → connected components →
    anti-join of losers against the corpus. The loser set is tiny relative
    to the corpus, so it broadcasts; the corpus itself is never shuffled —
    which is the property that matters when `documents` is the 100 TB side.
    """
    from upflow_spark.io import load

    cc = dedup_cluster_cc(spark, sf_dir)
    losers = cc.filter(~F.col("is_canonical")).select("doc_id")
    docs = load(spark, sf_dir, "documents")
    return (
        docs.join(F.broadcast(losers), "doc_id", "left_anti")
        .select("doc_id", "lang", F.length("text").cast("long").alias("content_len"))
    )
