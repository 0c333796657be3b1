"""Training-data preparation operators beyond dedup/similarity (§2-K):
benchmark decontamination, token-budget sequence packing, temperature-based
language rebalancing, and character-entropy quality scoring.

These are the standard curation steps between "deduplicated corpus" and
"training batches"; each is expressed as joins/windows/aggregates so the
whole prep pipeline stays inside Catalyst (no driver loops, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.operators.rank2 import global_ntile, global_row_number
from upflow_spark.parity import r4
from upflow_spark.pipeline.text import SQL_TOKENS, tokens_col
from upflow_spark.registry import query


@query(
    "curation_decontaminate",
    oracle="""
WITH eval_set AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 97 = 0
),
corpus AS (
  SELECT lang, md5(text) AS h FROM documents WHERE doc_id % 97 <> 0
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE h IN (SELECT h FROM eval_set)) AS BIGINT) AS n_contaminated,
       CAST(count(*) FILTER (WHERE h NOT IN (SELECT h FROM eval_set)) AS BIGINT) AS n_kept
FROM corpus
GROUP BY lang
""",
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop training docs whose content hash
    appears in the held-out eval set (here simulated as doc_id % 97 == 0).

    The eval set is small by construction, so it BROADCASTS — the 100 TB
    corpus is filtered map-side with zero shuffle of the big table. Exact
    content-hash matching is step one; n-gram overlap decontamination
    reuses the dedup_ngram_jaccard machinery with the same broadcast shape.
    """
    d = load(spark, sf_dir, "documents")
    ev = (
        d.filter(F.col("doc_id") % 97 == 0)
        .select(F.md5("text").alias("h"))
        .distinct()
    )
    corpus = d.filter(F.col("doc_id") % 97 != 0).select("lang", F.md5("text").alias("h"))
    flagged = corpus.join(
        F.broadcast(ev.withColumn("contaminated", F.lit(True))), "h", "left"
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("contaminated").isNotNull()).alias("n_contaminated"),
        F.count_if(F.col("contaminated").isNull()).alias("n_kept"),
    )


@query(
    "pack_token_bins",
    oracle=f"""
WITH sized AS (
  SELECT lang, doc_id, len({SQL_TOKENS}) AS n_tokens FROM documents
),
packed AS (
  SELECT lang, doc_id, n_tokens,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / 2048) AS BIGINT) AS bin_id
  FROM sized
)
SELECT lang, bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM packed
GROUP BY lang, bin_id
""",
)
def pack_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sequence packing: documents fill ~2048-token training bins
    per language, bin = floor(preceding-cumsum / 2048) over a deterministic
    doc order.

    This is the one-pass packing a dataloader does: a single window cumsum
    (one shuffle on lang) instead of bin-packing's O(n²) matching — bins can
    overflow by at most one document, the accepted trade in LLM data prep
    (docs are truncated/split downstream). Window order is pinned by doc_id
    so output is stable across partitionings.
    """
    d = load(spark, sf_dir, "documents")
    sized = d.select("lang", "doc_id", F.size(tokens_col()).cast("long").alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sized.withColumn(
        "bin_id", F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048)
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


@query(
    "sample_temperature_weights",
    oracle=f"""
WITH per_lang AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         sum(len({SQL_TOKENS})) AS lang_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT sum(pow(lang_tokens, 0.7)) AS z FROM per_lang)
SELECT lang, n_docs,
       CAST(lang_tokens AS BIGINT) AS lang_tokens,
       floor((pow(lang_tokens, 0.7) / z) * 10000 + 0.5) / 10000 AS sample_weight,
       CAST(floor((pow(lang_tokens, 0.7) / z) * 100000) AS BIGINT) AS docs_per_100k
FROM per_lang, tot
""",
)
def sample_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (T=0.7 — the multilingual-LM
    standard): sampling weight ∝ tokens^0.7, normalized. Upsamples tails,
    downsamples the head language.

    The normalizer is a 1-row aggregate over the 5-row per-lang rollup —
    broadcast back via crossJoin, so the corpus-sized scan happens exactly
    once no matter how many languages.
    """
    d = load(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens_col())).cast("long").alias("lang_tokens"),
    )
    z = per_lang.agg(F.sum(F.pow("lang_tokens", F.lit(0.7))).alias("z"))
    wcol = F.pow("lang_tokens", F.lit(0.7)) / F.col("z")
    return per_lang.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        "lang_tokens",
        r4(wcol).alias("sample_weight"),
        F.floor(wcol * 100000).cast("long").alias("docs_per_100k"),
    )


@query(
    "text_char_entropy",
    oracle="""
WITH chars AS (
  SELECT doc_id, u AS ch, count(*) AS n_ch
  FROM (SELECT doc_id, unnest(list_filter(string_split(text, ''), c -> c <> '')) AS u
        FROM documents)
  GROUP BY doc_id, u
),
tot AS (SELECT doc_id, sum(n_ch) AS n FROM chars GROUP BY doc_id)
SELECT c.doc_id,
       floor((-sum((n_ch / n) * ln(n_ch / n))) * 10000 + 0.5) / 10000 AS char_entropy,
       CAST(count(*) AS BIGINT) AS n_distinct_chars
FROM chars c JOIN tot t ON c.doc_id = t.doc_id
GROUP BY c.doc_id
""",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character entropy per document — the cheap perplexity proxy
    quality filters use (boilerplate/spam sits low, natural text ≈ 4 bits).

    explode(chars) → two keyed aggregations, both on doc_id — high
    cardinality, well-spread shuffles; entropy itself is exact IEEE double
    arithmetic on count ratios, so both engines agree at 4dp.
    """
    # spread the single-file scan: the ~5M-char explode otherwise runs on
    # one core before the first shuffle
    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    chars = (
        d.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("n_ch"))
    )
    tot = chars.groupBy("doc_id").agg(F.sum("n_ch").alias("n"))
    p = F.col("n_ch") / F.col("n")
    return (
        chars.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            r4(-F.sum(p * F.log(p))).alias("char_entropy"),
            F.count(F.lit(1)).alias("n_distinct_chars"),
        )
    )


@query(
    "curation_source_mixture",
    oracle=f"""
WITH per_doc AS (
  SELECT source,
         len({SQL_TOKENS}) AS n_tok,
         CAST(len(list_distinct({SQL_TOKENS})) AS DOUBLE) / len({SQL_TOKENS})
           AS diversity
  FROM documents
),
per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS src_tokens,
         avg(diversity) AS mean_div
  FROM per_doc GROUP BY source
),
z AS (SELECT sum(src_tokens * mean_div) AS zt FROM per_src)
SELECT source, n_docs, src_tokens,
       floor((mean_div) * 10000 + 0.5) / 10000 AS mean_diversity,
       floor((src_tokens * mean_div / zt) * 10000 + 0.5) / 10000 AS mix_weight
FROM per_src, z
""",
)
def curation_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted SOURCE mixture for training-data sampling: each
    source's weight ∝ its token volume × its mean lexical diversity, so
    low-quality (repetitive) sources are down-sampled proportionally —
    the per-domain reweighting pass (DoReMi-style, with a measured quality
    proxy instead of a learned one) that complements the per-LANGUAGE
    temperature weights of sample_temperature_weights.

    Map-only per-doc scoring → one groupBy(source) → broadcast normalizer;
    at 100 TB the per-doc pass streams and the 20-row mixture table is the
    artifact the sampler consumes.
    """
    d = load(spark, sf_dir, "documents")
    toks = tokens_col()
    per_doc = d.select(
        "source",
        F.size(toks).alias("n_tok"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "diversity"
        ),
    )
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("src_tokens"),
        F.avg("diversity").alias("mean_div"),
    )
    z = per_src.agg(
        F.sum(F.col("src_tokens") * F.col("mean_div")).alias("zt")
    )
    return per_src.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "src_tokens",
        r4(F.col("mean_div")).alias("mean_diversity"),
        r4(F.col("src_tokens") * F.col("mean_div") / F.col("zt")).alias("mix_weight"),
    )


@query(
    "curation_lang_balance",
    oracle=f"""
WITH per_lang AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         sum(len({SQL_TOKENS})) AS lang_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT sum(pow(lang_tokens, 0.7)) AS z,
               CAST(sum(n_docs) AS DOUBLE) AS total_docs
        FROM per_lang),
target AS (
  SELECT lang, n_docs,
         greatest(CAST(1 AS BIGINT),
                  least(n_docs,
                        CAST(floor(pow(lang_tokens, 0.7) / z * total_docs)
                             AS BIGINT))) AS target_docs
  FROM per_lang, tot
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || text),
                                     doc_id) AS rk
  FROM documents
)
SELECT r.doc_id, r.lang, CAST(r.rk AS BIGINT) AS rk, t.target_docs
FROM ranked r JOIN target t ON r.lang = t.lang
WHERE r.rk <= t.target_docs
""",
)
def curation_lang_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLIED language rebalancing: the temperature weights of
    sample_temperature_weights turned into an actual kept-document set.
    Per language, target_docs = clamp(⌊weight_T=0.7 · total_docs⌋, 1,
    n_docs); the kept docs are the language's top-target_docs by
    deterministic content-hash rank (the sample_topk_hashrank order), so
    the resample is reproducible on any engine, any partitioning, any day.

    Head languages are down-sampled toward the temperature mixture; tail
    languages cap at their full document set (upsampling is a repeat-factor
    column at training time, not row replication in the corpus).

    Scale: one corpus scan for the 5-row per-lang rollup (broadcast back),
    then rank2's GROUPED two-phase rank — a language is a low-cardinality
    partition key (one language ≈ corpus/5 rows in a single window
    partition, the skew wall the r8 verdict flagged), so the rank range-
    partitions on (lang, hash-order), ranks per (partition, lang) slice,
    and merges via broadcast per-(lang, partition) offsets; the offsets
    window itself is partitioned by lang. One broadcast join against the
    5-row target table; the corpus never converges anywhere.
    """
    d = load(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens_col())).cast("long").alias("lang_tokens"),
    )
    tot = per_lang.agg(
        F.sum(F.pow("lang_tokens", F.lit(0.7))).alias("z"),
        F.sum("n_docs").cast("double").alias("total_docs"),
    )
    target = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.greatest(
            F.lit(1).cast("long"),
            F.least(
                F.col("n_docs"),
                F.floor(
                    F.pow("lang_tokens", F.lit(0.7)) / F.col("z") * F.col("total_docs")
                ).cast("long"),
            ),
        ).alias("target_docs"),
    )
    ranked = global_row_number(
        d.select(
            "doc_id",
            "lang",
            F.md5(F.concat_ws(":", F.col("doc_id"), F.col("text"))).alias("hk"),
        ),
        ["hk", "doc_id"],
        out="rk",
        partition_by=["lang"],
    ).select("doc_id", "lang", "rk")
    return (
        ranked.join(F.broadcast(target), "lang")
        .filter(F.col("rk") <= F.col("target_docs"))
        .select("doc_id", "lang", "rk", "target_docs")
    )


@query(
    "curation_perplexity_buckets",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents
),
tf AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
total AS (SELECT sum(n) AS tot FROM tf),
per_doc AS (
  SELECT doc_id,
         floor((avg(-ln(CAST(tf.n AS DOUBLE) / total.tot))) * 10000 + 0.5) / 10000
           AS s4
  FROM tok JOIN tf USING (term) CROSS JOIN total
  GROUP BY doc_id
),
ranked AS (
  SELECT d.lang, p.doc_id, p.s4,
         ntile(3) OVER (PARTITION BY d.lang ORDER BY p.s4 ASC, p.doc_id ASC)
           AS bucket
  FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
)
SELECT lang, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       floor((CAST(sum(CAST(s4 AS DECIMAL(18,4))) AS DOUBLE) / count(*))
             * 10000 + 0.5) / 10000 AS mean_surprisal,
       bucket <= 2 AS is_kept
FROM ranked
GROUP BY lang, bucket
""",
)
def curation_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per language,
    documents are split into head/middle/tail terciles of unigram surprisal
    (the LM-perplexity proxy this engine computes exactly — low surprisal =
    fluent), and the standard curation keep-rule (head+middle) is emitted
    per bucket. The corpus-relative quality gate between raw dedup and
    training-set assembly.

    Determinism across engines: the tercile ORDER uses the 4dp-rounded
    surprisal (bit-identical on both engines — raw per-doc averages can
    differ in the last ulp from accumulation order) with doc_id
    tie-breaks, and bucket means are exact DECIMAL sums.

    Scale: the Heaps-law term-frequency table broadcasts (the
    text_unigram_logprob plan); the terciles come from rank2's GROUPED
    two-phase ntile (range shuffle on (lang, s4, doc_id) + per-slice rank +
    broadcast per-(lang, partition) offsets + exact SQL NTILE arithmetic) —
    one language never converges into one window partition, the skew wall
    the r8 verdict flagged. No corpus text in the shuffle.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col()).alias("term"))
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    total = tf.agg(F.sum("n").cast("double").alias("tot"))
    per_doc = (
        tok.join(F.broadcast(tf), "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            r4(F.avg(-F.log(F.col("n").cast("double") / F.col("tot")))).alias("s4")
        )
    )
    ranked = global_ntile(
        per_doc.join(d.select("doc_id", "lang"), "doc_id"),
        [("s4", "asc"), ("doc_id", "asc")],
        3,
        "bucket",
        partition_by=["lang"],
    ).select("lang", "s4", "bucket")
    return (
        ranked.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            r4(
                F.sum(F.col("s4").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_surprisal"),
        )
        .withColumn("is_kept", F.col("bucket") <= 2)
    )


CHUNK_W = 512  # context-window width in tokens


@query(
    "llm_chunk_windows",
    oracle=f"""
WITH sized AS (
  SELECT doc_id, len({SQL_TOKENS}) AS n FROM documents
),
offs AS (
  SELECT doc_id, n,
         sum(n) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS s
  FROM sized
),
spans AS (
  SELECT doc_id, n, s,
         unnest(range(CAST(s // {CHUNK_W} AS BIGINT),
                      CAST((s + n - 1) // {CHUNK_W} + 1 AS BIGINT))) AS window_id
  FROM offs WHERE n > 0
)
SELECT CAST(window_id AS BIGINT) AS window_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc,
       CAST(sum(least(s + n, (window_id + 1) * {CHUNK_W})
                - greatest(s, window_id * {CHUNK_W})) AS BIGINT) AS n_tokens
FROM spans GROUP BY window_id
""",
)
def llm_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk pretraining windows (r10): the corpus is one
    virtual token stream (docs concatenated in doc_id order) split into
    fixed {CHUNK_W}-token context windows; the output is the window→doc
    ATTRIBUTION MAP a dataloader and a contamination auditor both need —
    per window: how many docs it spans, the first/last doc, and its token
    fill (= {CHUNK_W} everywhere but the tail window, which the oracle
    verifies arithmetically, not just by membership).

    pack_token_bins keeps documents whole per bin; this is the other
    standard shape — windows CROSS document boundaries, docs split across
    windows. Plan: per-doc exclusive start offsets via rank2's two-phase
    GLOBAL cumsum (range shuffle + local window + broadcast offsets —
    integer-exact longs, no single-partition sort at any scale), then a
    map-side sequence() explode over each doc's touched window range and
    one window_id aggregate. A 100 TB corpus = a bigger range shuffle and
    more explode rows, same plan; window count is corpus_tokens/{CHUNK_W}.
    """
    from upflow_spark.operators.rank2 import global_cumsum

    d = load(spark, sf_dir, "documents")
    sized = d.select("doc_id", F.size(tokens_col()).cast("long").alias("n"))
    offs = (
        global_cumsum(sized, ["doc_id"], {"cum": F.col("n")})
        .withColumn("s", F.col("cum") - F.col("n"))
        .filter(F.col("n") > 0)
    )
    w0 = F.expr(f"s div {CHUNK_W}")
    w1 = F.expr(f"(s + n - 1) div {CHUNK_W}")
    spans = offs.select(
        "doc_id", "n", "s", F.explode(F.sequence(w0, w1)).alias("window_id")
    )
    fill = F.least(
        F.col("s") + F.col("n"), (F.col("window_id") + 1) * CHUNK_W
    ) - F.greatest(F.col("s"), F.col("window_id") * CHUNK_W)
    return spans.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.sum(fill).cast("long").alias("n_tokens"),
    )


TOKEN_BUDGET_FRAC_BP = 5000  # global budget = 50% of available tokens


@query(
    "curation_token_budget",
    oracle=f"""
WITH tbsrc AS MATERIALIZED (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({SQL_TOKENS})) AS BIGINT) AS tokens_available,
         CAST(sum(len({SQL_TOKENS})
              * (1 + CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END
                   + CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END))
              AS BIGINT) AS w
  FROM documents GROUP BY source
),
tbtot AS (
  SELECT CAST(sum(tokens_available) AS BIGINT) AS tok_all,
         CAST(sum(w) AS BIGINT) AS w_all,
         CAST(sum(tokens_available) * {TOKEN_BUDGET_FRAC_BP} // 10000
              AS BIGINT) AS budget
  FROM tbsrc
),
tbsh AS MATERIALIZED (
  SELECT s.source, s.n_docs, s.tokens_available, s.w,
         CAST(t.budget * s.w // t.w_all AS BIGINT) AS base,
         CAST(t.budget * s.w % t.w_all AS BIGINT) AS rem_units
  FROM tbsrc s, tbtot t
),
tbleft AS (
  SELECT CAST(t.budget - sum(s.base) AS BIGINT) AS l
  FROM tbsh s, tbtot t GROUP BY t.budget
),
tbrk AS (
  SELECT *, row_number() OVER (ORDER BY rem_units DESC, source ASC) AS rk
  FROM tbsh
)
SELECT r.source, r.n_docs, r.tokens_available, r.w AS weight,
       r.base + CASE WHEN r.rk <= lf.l THEN 1 ELSE 0 END AS quota,
       least(r.base + CASE WHEN r.rk <= lf.l THEN 1 ELSE 0 END,
             r.tokens_available) AS allocated
FROM tbrk r, tbleft lf
""",
)
def curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation across sources — the data-mixing step
    after quality scoring and before sampling: a global training budget
    (here {TOKEN_BUDGET_FRAC_BP} bp = 50% of all available tokens) is
    split across sources proportionally to QUALITY-WEIGHTED token mass
    (weight = Σ doc_tokens · tier, tier ∈ {{1,2,3}} by length band —
    deterministic integers, the repo's basis-point discipline), then
    integerized by the LARGEST-REMAINDER method (floors + remainder rank,
    source tie-break — Σ quota = budget exactly) and CAPPED at each
    source's available tokens. A capped source leaves budget deliberately
    unallocated in this single pass (redistribution is a second identical
    pass a pipeline runs explicitly; silent iterative redistribution
    would hide the shortfall the report exists to show).

    EVERYTHING is exact int64 (shares are B·w // W integer divisions, so
    even the remainders are exact — stronger than the Neyman float-share
    variant); at 1e13-token corpora rescale w by a constant before the
    B·w product (documented bound: B·w < 2^63). The remainder rank runs
    over the ≤20-row source table (bounded by SOURCES, not data —
    TINY_WINDOW_OK). One corpus scan, one groupBy(source): the same
    shuffle bill as any per-source rollup at 100 TB.
    """
    d = load(spark, sf_dir, "documents")
    tier = (
        F.lit(1)
        + (F.col("n_chars") >= 200).cast("int")
        + (F.col("n_chars") >= 400).cast("int")
    )
    n_tok = F.size(tokens_col()).cast("long")
    src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(n_tok).cast("long").alias("tokens_available"),
        F.sum(n_tok * tier).cast("long").alias("w"),
    )
    tot = src.agg(
        F.sum("tokens_available").cast("long").alias("tok_all"),
        F.sum("w").cast("long").alias("w_all"),
        F.expr(f"sum(tokens_available) * {TOKEN_BUDGET_FRAC_BP} div 10000")
        .cast("long")
        .alias("budget"),
    )
    sh = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens_available",
        "w",
        "budget",
        F.expr("budget * w div w_all").cast("long").alias("base"),
        (F.col("budget") * F.col("w") % F.col("w_all"))
        .cast("long")
        .alias("rem_units"),
    )
    left = sh.agg(
        (F.max("budget") - F.sum("base")).cast("long").alias("l")
    )
    wrk = Window.orderBy(F.col("rem_units").desc(), F.col("source").asc())
    quota = F.col("base") + F.when(F.col("rk") <= F.col("l"), 1).otherwise(0)
    return (
        sh.withColumn("rk", F.row_number().over(wrk))
        .crossJoin(F.broadcast(left))
        .select(
            "source",
            "n_docs",
            "tokens_available",
            F.col("w").alias("weight"),
            quota.cast("long").alias("quota"),
            F.least(quota, F.col("tokens_available")).cast("long").alias("allocated"),
        )
    )
