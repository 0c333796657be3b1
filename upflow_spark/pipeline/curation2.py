"""LLM-curation wave 2 (§2-K extension): Gopher-style quality rules,
repetition detection, n-gram benchmark decontamination, and PII redaction.

These mirror the standard web-corpus curation recipes (Gopher / RefinedWeb /
Dolma rule filters; n-gram decontamination as in GPT-3 appendix C): each is
a map-only expression or a token-explode + re-agg, so the corpus scan stays
one pass and every shuffle keys on high-cardinality (doc_id, term) pairs.

Reference: n/a (ref empty — SURVEY.md §0); semantics from public curation
literature (PAPERS.md) re-expressed as Catalyst-native DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from upflow_spark.io import load
from upflow_spark.operators.rank2 import global_row_number
from upflow_spark.parity import R4, r4
from upflow_spark.pipeline.text import SQL_TOKENS, tokens_col
from upflow_spark.registry import query

# Tiny fixed stopword list present in the synthetic corpus vocabulary.
STOPWORDS = ("the", "a", "value", "row")
SQL_STOPWORDS = "('the', 'a', 'value', 'row')"


@query(
    "text_gopher_quality",
    oracle=f"""
WITH scored AS (
  SELECT lang,
         len(toks) AS n_words,
         list_avg(list_transform(toks, t -> CAST(length(t) AS DOUBLE))) AS mean_word_len,
         len(list_filter(toks, t -> t IN {SQL_STOPWORDS})) / CAST(len(toks) AS DOUBLE)
           AS stop_frac,
         len(list_filter(toks, t -> regexp_full_match(t, '[a-z]+')))
           / CAST(len(toks) AS DOUBLE) AS alpha_frac
  FROM (SELECT lang, {SQL_TOKENS} AS toks FROM documents)
  WHERE len(toks) > 0
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE n_words BETWEEN 20 AND 1000) AS BIGINT) AS pass_words,
       CAST(count(*) FILTER (WHERE mean_word_len BETWEEN 2 AND 12) AS BIGINT) AS pass_wordlen,
       CAST(count(*) FILTER (WHERE stop_frac >= 0.01) AS BIGINT) AS pass_stop,
       CAST(count(*) FILTER (WHERE alpha_frac >= 0.8) AS BIGINT) AS pass_alpha,
       CAST(count(*) FILTER (WHERE n_words BETWEEN 20 AND 1000
                               AND mean_word_len BETWEEN 2 AND 12
                               AND stop_frac >= 0.01
                               AND alpha_frac >= 0.8) AS BIGINT) AS pass_all,
       {R4("avg(mean_word_len)")} AS avg_word_len
FROM scored
GROUP BY lang
""",
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filter: word-count band, mean word length band,
    minimum stopword fraction, minimum alphabetic-token fraction.

    Map-only per-doc scoring via higher-order functions (no explode, no
    UDF) followed by one low-cardinality groupBy(lang) — at 100 TB this is
    a single corpus pass with partial aggregation; the only shuffle carries
    five rows per partition.
    """
    toks = tokens_col()
    d = (
        load(spark, sf_dir, "documents")
        .select(
            "lang",
            F.size(toks).alias("n_words"),
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("len_sum"),
            F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).alias("n_stop"),
            F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))).alias("n_alpha"),
        )
        .where(F.col("n_words") > 0)
        .select(
            "lang",
            "n_words",
            (F.col("len_sum") / F.col("n_words")).alias("mean_word_len"),
            (F.col("n_stop") / F.col("n_words")).alias("stop_frac"),
            (F.col("n_alpha") / F.col("n_words")).alias("alpha_frac"),
        )
    )
    p_words = F.col("n_words").between(20, 1000)
    p_wordlen = F.col("mean_word_len").between(2, 12)
    p_stop = F.col("stop_frac") >= 0.01
    p_alpha = F.col("alpha_frac") >= 0.8
    cnt = lambda p, name: F.count(F.when(p, 1)).alias(name)  # noqa: E731
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        cnt(p_words, "pass_words"),
        cnt(p_wordlen, "pass_wordlen"),
        cnt(p_stop, "pass_stop"),
        cnt(p_alpha, "pass_alpha"),
        cnt(p_words & p_wordlen & p_stop & p_alpha, "pass_all"),
        r4(F.avg("mean_word_len")).alias("avg_word_len"),
    )


@query(
    "text_repetition_ratio",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({SQL_TOKENS}) AS w
  FROM documents
),
per_tok AS (
  SELECT doc_id, lang, w, count(*) AS c FROM tok GROUP BY doc_id, lang, w
),
per_doc AS (
  SELECT doc_id, lang,
         max(c) / CAST(sum(c) AS DOUBLE) AS top_tok_frac,
         1.0 - count(*) / CAST(sum(c) AS DOUBLE) AS dup_frac
  FROM per_tok GROUP BY doc_id, lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       {R4("avg(top_tok_frac)")} AS avg_top_tok_frac,
       {R4("avg(dup_frac)")} AS avg_dup_frac,
       CAST(count(*) FILTER (WHERE top_tok_frac > 0.1) AS BIGINT) AS n_repetitive
FROM per_doc
GROUP BY lang
""",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection (Gopher §A1.1 analogue): per-doc most-frequent-
    token fraction and duplicate-token fraction, aggregated per language.

    explode → two-level agg keyed on (doc_id, token) then (doc_id): both
    shuffles are high-cardinality and partial-aggregated; the final
    groupBy(lang) is 5 rows. No UDFs, no driver loops.
    """
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(tokens_col()).alias("w")
    )
    per_tok = tok.groupBy("doc_id", "lang", "w").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_tok.groupBy("doc_id", "lang").agg(
        (F.max("c") / F.sum("c").cast("double")).alias("top_tok_frac"),
        (F.lit(1.0) - F.count(F.lit(1)) / F.sum("c").cast("double")).alias("dup_frac"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        r4(F.avg("top_tok_frac")).alias("avg_top_tok_frac"),
        r4(F.avg("dup_frac")).alias("avg_dup_frac"),
        F.count(F.when(F.col("top_tok_frac") > 0.1, 1)).alias("n_repetitive"),
    )


@query(
    "curation_ngram_decontaminate",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, {SQL_TOKENS} AS toks FROM documents
),
eval_grams AS (
  SELECT DISTINCT array_to_string(toks[i:i+4], ' ') AS g
  FROM toks, unnest(range(1, len(toks) - 3)) AS u(i)
  WHERE doc_id % 97 = 0 AND len(toks) >= 5
),
corpus AS (SELECT doc_id, lang, toks FROM toks WHERE doc_id % 97 <> 0),
flagged AS (
  SELECT DISTINCT c.doc_id
  FROM corpus c, unnest(range(1, len(c.toks) - 3)) AS u(i)
  WHERE len(c.toks) >= 5
    AND array_to_string(c.toks[i:i+4], ' ') IN (SELECT g FROM eval_grams)
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM flagged)) AS BIGINT)
         AS n_flagged,
       CAST(count(*) FILTER (WHERE doc_id NOT IN (SELECT doc_id FROM flagged)) AS BIGINT)
         AS n_clean
FROM corpus
GROUP BY lang
""",
)
def curation_ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-gram benchmark decontamination (GPT-3 appendix-C style): flag any
    training doc sharing a 5-token shingle with the held-out eval slice
    (simulated as doc_id % 97 == 0).

    Shingles are built with slice+concat (codegen'd, no lambda-HOF in the
    hot path), the eval-gram set is distinct-reduced BEFORE the join, and
    the flag join is a left_semi on the gram string — at 100 TB the eval
    set is small (broadcastable) while the corpus explode stays spread over
    (doc_id, position).
    """
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens_col().alias("toks")
    )

    def grams(df: DataFrame) -> DataFrame:
        n = F.size("toks")
        # positions 1..n-4 (1-based), each gram = 5 consecutive tokens
        return (
            df.where(n >= 5)
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(1), n - 4)).alias("i"),
                "toks",
            )
            .select(
                "doc_id",
                F.concat_ws(" ", F.slice("toks", F.col("i"), F.lit(5))).alias("g"),
            )
        )

    eval_grams = grams(toks.where(F.col("doc_id") % 97 == 0)).select("g").distinct()
    corpus = toks.where(F.col("doc_id") % 97 != 0)
    flagged = (
        grams(corpus)
        .join(eval_grams, "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_flagged", F.lit(True))
    )
    return (
        corpus.join(F.broadcast(flagged), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("is_flagged"), 1)).alias("n_flagged"),
            F.count(F.when(F.col("is_flagged").isNull(), 1)).alias("n_clean"),
        )
    )


@query(
    "pii_mask_redact",
    oracle="""
WITH synth AS (
  SELECT c_custkey,
         c_mktsegment,
         lower(replace(c_name, '#', '.')) || '@example.com' AS email,
         '+1-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS phone,
         'user id ' || CAST(c_custkey AS VARCHAR) || ' wrote this' AS note
  FROM customer WHERE c_custkey < 500
)
SELECT c_custkey,
       regexp_replace(email, '[a-z0-9.]+@[a-z.]+', '<EMAIL>', 'g') AS email_redacted,
       regexp_replace(phone, '\\+?[0-9][0-9-]{4,}', '<PHONE>', 'g') AS phone_redacted,
       regexp_replace(note, 'id [0-9]+', 'id <NUM>', 'g') AS note_redacted,
       CAST(length(email) - length(replace(email, '@', '')) AS INT) AS n_at
FROM synth
""",
)
def pii_mask_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: regex-replace emails / phone numbers / numeric
    ids with typed placeholder tokens.

    The corpus has no real PII, so deterministic fakes are synthesized from
    customer columns identically in both engines; the graded surface is the
    regexp_replace masking itself. Map-only — at 100 TB this fuses into the
    scan with zero shuffles.
    """
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") < 500)
    email = F.concat(
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.com"),
    )
    phone = F.concat(
        F.lit("+1-555-"), F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0")
    )
    note = F.concat(
        F.lit("user id "), F.col("c_custkey").cast("string"), F.lit(" wrote this")
    )
    return c.select(
        "c_custkey",
        F.regexp_replace(email, "[a-z0-9.]+@[a-z.]+", "<EMAIL>").alias("email_redacted"),
        F.regexp_replace(phone, r"\+?[0-9][0-9-]{4,}", "<PHONE>").alias("phone_redacted"),
        F.regexp_replace(note, "id [0-9]+", "id <NUM>").alias("note_redacted"),
        (F.length(email) - F.length(F.replace(email, F.lit("@"), F.lit(""))))
        .cast("int")
        .alias("n_at"),
    )


# Deterministic URL synthesis (both engines build the identical string from
# event columns — the multimodal-PPM precedent: the fixture carries no URLs,
# so the key constructs a realistic messy URL and the CANONICALIZER is the
# operator under test): mixed-case host, path, tracking params, fragment.
_SQL_URL = (
    "'https://' || CASE event_id % 3 WHEN 0 THEN 'WWW.Example.COM' "
    "WHEN 1 THEN 'cdn.Example.com' ELSE 'example.COM' END "
    "|| '/p/' || CAST(event_id % 50 AS VARCHAR) "
    "|| '?utm_source=s' || CAST(event_id % 4 AS VARCHAR) "
    "|| '&id=' || CAST(user_id % 100 AS VARCHAR) "
    "|| '&utm_campaign=c' || CAST(event_id % 2 AS VARCHAR) "
    "|| '#sec' || CAST(event_id % 2 AS VARCHAR)"
)


@query(
    "dedup_url_canonical",
    oracle=f"""
WITH u AS (SELECT {_SQL_URL} AS url FROM events),
parts AS (
  SELECT url,
         lower(regexp_extract(url, '^https?://([^/]+)', 1)) AS host,
         regexp_extract(url, '^https?://[^/]+([^?#]*)', 1) AS path,
         array_to_string(
           list_filter(string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                       p -> NOT regexp_matches(p, '^utm_')),
           '&') AS q
  FROM u
)
SELECT 'https://' || host || path ||
         CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canonical_url,
       CAST(count(*) AS BIGINT) AS n_events
FROM parts
GROUP BY 1
HAVING count(*) > 1
""",
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the web-corpus ingest primitive that
    runs BEFORE any content fetch/dedup: lowercase the host, drop the
    fragment, strip utm_* tracking parameters (preserving the rest of the
    query in order), then group identical canonical URLs. Two crawl records
    differing only in tracking noise collapse to one fetch.

    Map-only canonicalization (regexp extracts + an array-filter HOF over
    the query params — no UDF), one groupBy on the canonical string: at
    100 TB the canonical digest is the shuffle key and the op is the same
    single pass as dedup_exact_content.
    """
    ev = load(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("event_id") % 3 == 0, "WWW.Example.COM")
        .when(F.col("event_id") % 3 == 1, "cdn.Example.com")
        .otherwise("example.COM"),
        F.lit("/p/"),
        (F.col("event_id") % 50).cast("string"),
        F.lit("?utm_source=s"),
        (F.col("event_id") % 4).cast("string"),
        F.lit("&id="),
        (F.col("user_id") % 100).cast("string"),
        F.lit("&utm_campaign=c"),
        (F.col("event_id") % 2).cast("string"),
        F.lit("#sec"),
        (F.col("event_id") % 2).cast("string"),
    )
    u = ev.select(url.alias("url"))
    host = F.lower(F.regexp_extract("url", r"^https?://([^/]+)", 1))
    path = F.regexp_extract("url", r"^https?://[^/]+([^?#]*)", 1)
    q = F.array_join(
        F.filter(
            F.split(F.regexp_extract("url", r"\?([^#]*)", 1), "&"),
            lambda p: ~p.rlike("^utm_"),
        ),
        "&",
    )
    canonical = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(""),
    )
    return (
        u.select(canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") > 1)
    )


@query(
    "curation_contamination_score",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
),
eval_grams AS (
  SELECT DISTINCT array_to_string(toks[i:i+4], ' ') AS g
  FROM toks, unnest(range(1, len(toks) - 3)) AS u(i)
  WHERE doc_id % 97 = 0 AND len(toks) >= 5
),
doc_grams AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS g
  FROM toks, unnest(range(1, len(toks) - 3)) AS u(i)
  WHERE doc_id % 97 <> 0 AND len(toks) >= 5
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(*) FILTER (WHERE g IN (SELECT g FROM eval_grams)) AS BIGINT)
         AS n_contaminated,
       floor((CAST(count(*) FILTER (WHERE g IN (SELECT g FROM eval_grams)) AS DOUBLE)
              / count(*)) * 10000 + 0.5) / 10000 AS contamination_frac
FROM doc_grams
GROUP BY doc_id
""",
)
def curation_contamination_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document contamination SCORE: the fraction of each training
    doc's distinct 5-gram shingles that appear in the held-out benchmark
    slice (doc_id % 97 == 0) — the graded/reported companion to the boolean
    curation_ngram_decontaminate flag (contamination reports in the GPT-3 /
    Llama disclosures quantify overlap per document, not just flag it;
    thresholded downstream to drop/keep).

    Plan: same codegen'd slice+concat shingling; the distinct eval-gram set
    stays small (broadcast left_semi-shaped membership via a left join +
    flag), per-doc ratios come from ONE (doc_id)-keyed aggregate over the
    distinct doc-gram stream. At 100 TB the eval set broadcasts and the
    corpus shingle stream shuffles once on doc_id.
    """
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", tokens_col().alias("toks")
    )
    n = F.size("toks")

    def grams(df: DataFrame) -> DataFrame:
        return (
            df.where(n >= 5)
            .select("doc_id", F.explode(F.sequence(F.lit(1), n - 4)).alias("i"), "toks")
            .select(
                "doc_id",
                F.concat_ws(" ", F.slice("toks", F.col("i"), F.lit(5))).alias("g"),
            )
        )

    eval_grams = (
        grams(toks.where(F.col("doc_id") % 97 == 0))
        .select(F.col("g").alias("eg"))
        .distinct()
    )
    doc_grams = grams(toks.where(F.col("doc_id") % 97 != 0)).distinct()
    hit = doc_grams.join(
        F.broadcast(eval_grams), doc_grams.g == eval_grams.eg, "left"
    )
    return hit.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count(F.col("eg")).alias("n_contaminated"),
        r4(F.count(F.col("eg")).cast("double") / F.count(F.lit(1))).alias(
            "contamination_frac"
        ),
    )


DSIR_ALPHA = 0.5
DSIR_KEEP_FRAC = 0.4
_DSIR_TGT = "lang = 'en'"


@query(
    "curation_dsir_weights",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({SQL_TOKENS}) AS term FROM documents
),
raw AS (SELECT term, CAST(count(*) AS DOUBLE) AS cr FROM tok GROUP BY term),
tgt AS (SELECT term, CAST(count(*) AS DOUBLE) AS ct
        FROM tok WHERE {_DSIR_TGT} GROUP BY term),
st AS (
  SELECT (SELECT sum(cr) FROM raw) AS nr,
         (SELECT coalesce(sum(ct), 0) FROM tgt) AS nt,
         (SELECT CAST(count(*) AS DOUBLE) FROM raw) AS vocab
),
lr AS (
  SELECT r.term,
         ln((coalesce(t.ct, 0) + {DSIR_ALPHA}) / (st.nt + {DSIR_ALPHA} * st.vocab))
         - ln((r.cr + {DSIR_ALPHA}) / (st.nr + {DSIR_ALPHA} * st.vocab)) AS w
  FROM raw r LEFT JOIN tgt t USING (term) CROSS JOIN st
),
doc AS (
  SELECT tok.doc_id, any_value(tok.lang) AS lang,
         CAST(count(*) AS BIGINT) AS n_tokens,
         {R4("sum(lr.w)")} AS dsir_logratio
  FROM tok JOIN lr USING (term)
  GROUP BY tok.doc_id
)
SELECT doc_id, lang, n_tokens, dsir_logratio,
       row_number() OVER (ORDER BY dsir_logratio DESC, doc_id ASC)
         <= floor((SELECT count(*) FROM doc) * {DSIR_KEEP_FRAC}) AS kept
FROM doc
""",
)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023, Data Selection via Importance Resampling):
    per-document importance weight = Σ_tokens [ln p_target(t) − ln p_raw(t)]
    under add-α unigram LMs, target distribution = the `en` slice; keep the
    top 40% by weight (deterministic rank, doc_id tie-break — the repo's
    no-RNG stance in place of DSIR's Gumbel resampling).

    Scale shape: both LMs are Heaps-law term-count tables → ONE broadcast
    log-ratio table joined map-side onto the token stream; the corpus text
    never shuffles and per-doc weights are a (doc_id)-keyed agg. The keep
    rank is rank2.global_row_number (two-phase: range shuffle + local rank
    + broadcast offsets, with the doc total riding the same offsets
    relation) — no single-partition WindowExec in the selection stage.

    Parity: counts and totals are exact; the per-term log-ratio is one
    shared expression tree; the per-doc sum is r4'd (continuous values —
    the text_unigram_logprob precedent); the kept rank orders by the
    ROUNDED weight so both engines rank identical keys.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(tokens_col()).alias("term"))
    raw = tok.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("cr"))
    tgt = (
        tok.filter(F.expr(_DSIR_TGT))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("ct"))
    )
    st = raw.crossJoin(tgt.agg(F.coalesce(F.sum("ct"), F.lit(0.0)).alias("nt"))).agg(
        F.sum("cr").alias("nr"),
        F.first("nt").alias("nt"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    a = float(DSIR_ALPHA)
    lr = (
        raw.join(tgt, "term", "left")
        .crossJoin(F.broadcast(st))
        .select(
            "term",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0.0)) + a)
                    / (F.col("nt") + a * F.col("vocab"))
                )
                - F.log((F.col("cr") + a) / (F.col("nr") + a * F.col("vocab")))
            ).alias("w"),
        )
    )
    doc = (
        tok.join(F.broadcast(lr), "term")
        .groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_tokens"),
            r4(F.sum("w")).alias("dsir_logratio"),
        )
    )
    ranked = global_row_number(
        doc,
        [("dsir_logratio", "desc"), ("doc_id", "asc")],
        out="__rk",
        total_out="__n_docs",
    )
    return ranked.withColumn(
        "kept", F.col("__rk") <= F.floor(F.col("__n_docs") * DSIR_KEEP_FRAC)
    ).select("doc_id", "lang", "n_tokens", "dsir_logratio", "kept")


BLOCK_SOFT = ("slow",)
BLOCK_HARD = ("dup",)
BLOCK_RATIO_MAX = 0.04
_SQL_SOFT = "('slow')"
_SQL_HARD = "('dup')"


@query(
    "curation_blocklist_filter",
    oracle=f"""
SELECT doc_id,
       CAST(len({SQL_TOKENS}) AS BIGINT) AS n_tokens,
       CAST(len(list_filter({SQL_TOKENS}, t -> t IN {_SQL_SOFT})) AS BIGINT)
         AS n_soft,
       len(list_filter({SQL_TOKENS}, t -> t IN {_SQL_HARD})) > 0 AS hard_hit,
       {R4(f"CAST(len(list_filter({SQL_TOKENS}, t -> t IN {_SQL_SOFT})) AS DOUBLE) / len({SQL_TOKENS})")}
         AS soft_ratio,
       len(list_filter({SQL_TOKENS}, t -> t IN {_SQL_HARD})) = 0
         AND CAST(len(list_filter({SQL_TOKENS}, t -> t IN {_SQL_SOFT})) AS DOUBLE)
             / len({SQL_TOKENS}) < {BLOCK_RATIO_MAX} AS kept
FROM documents
""",
)
def curation_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist filtering (Raffel et al. 2020 §2.2): a HARD list
    (any hit drops the doc — the fixture's rare `dup` marker) and a SOFT
    list whose token share must stay under 4% (`slow`). Emits the evidence
    columns (counts, ratio, per-rule flags) a curation audit wants, not
    just the verdict.

    Map-only: two array-HOF filters over the token split, zero shuffles,
    zero joins — the cheapest stage in the funnel and the first one a 100 TB
    pipeline runs (drop before you pay to dedup). Exact-integer ratios, so
    parity is the one shared division.
    """
    d = load(spark, sf_dir, "documents")
    toks = tokens_col()
    soft = F.filter(toks, lambda t: t.isin(*BLOCK_SOFT))
    hard = F.filter(toks, lambda t: t.isin(*BLOCK_HARD))
    ratio = F.size(soft).cast("double") / F.size(toks)
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(soft).cast("long").alias("n_soft"),
        (F.size(hard) > 0).alias("hard_hit"),
        r4(ratio).alias("soft_ratio"),
        ((F.size(hard) == 0) & (ratio < BLOCK_RATIO_MAX)).alias("kept"),
    )


@query(
    "curation_filter_ablation",
    oracle=f"""
WITH feat AS (
  SELECT length(text) AS nc,
         len({SQL_TOKENS}) AS nw,
         COALESCE(list_sum(list_transform({SQL_TOKENS},
                                          t -> CAST(length(t) AS BIGINT))), 0)
           AS sl,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS na
  FROM documents
),
flags AS (
  SELECT CASE WHEN nc < 100 THEN 1 ELSE 0 END AS f_short,
         CASE WHEN nw < 20 THEN 1 ELSE 0 END AS f_words,
         CASE WHEN 3 * nw <= sl AND sl <= 10 * nw THEN 0 ELSE 1 END AS f_wordlen,
         CASE WHEN 10 * na < 6 * nc THEN 1 ELSE 0 END AS f_alpha
  FROM feat
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(f_short) AS BIGINT) AS s_short,
         CAST(sum(f_words) AS BIGINT) AS s_words,
         CAST(sum(f_wordlen) AS BIGINT) AS s_wordlen,
         CAST(sum(f_alpha) AS BIGINT) AS s_alpha,
         CAST(count(*) FILTER (f_short + f_words + f_wordlen + f_alpha >= 1)
              AS BIGINT) AS s_any,
         CAST(count(*) FILTER (f_short = 1 AND f_words + f_wordlen + f_alpha = 0)
              AS BIGINT) AS u_short,
         CAST(count(*) FILTER (f_words = 1 AND f_short + f_wordlen + f_alpha = 0)
              AS BIGINT) AS u_words,
         CAST(count(*) FILTER (f_wordlen = 1 AND f_short + f_words + f_alpha = 0)
              AS BIGINT) AS u_wordlen,
         CAST(count(*) FILTER (f_alpha = 1 AND f_short + f_words + f_wordlen = 0)
              AS BIGINT) AS u_alpha,
         CAST(count(*) FILTER (f_short + f_words + f_wordlen + f_alpha = 1)
              AS BIGINT) AS u_any
  FROM flags
)
SELECT f.filter_name, t.n_docs, f.n_fail, f.n_fail_unique,
       {R4("CAST(f.n_fail AS DOUBLE) / t.n_docs")} AS fail_frac
FROM tot t, LATERAL (
  VALUES ('short', t.s_short, t.u_short),
         ('few_words', t.s_words, t.u_words),
         ('word_len', t.s_wordlen, t.u_wordlen),
         ('non_alpha', t.s_alpha, t.u_alpha),
         ('any', t.s_any, t.u_any)
) AS f(filter_name, n_fail, n_fail_unique)
""",
)
def curation_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-filter ablation report over the quality-filter stack: for each
    of four deterministic document filters (too short, too few words, mean
    word length out of band, low alphabetic ratio) — how many docs it
    fails, and how many it REMOVES UNIQUELY (fails it and nothing else),
    plus the 'any' row (union removal / exactly-one removal). The report
    every curation change review starts from: a filter with high unique
    removal is load-bearing; one with zero is redundant with the rest of
    the stack.

    All four predicates are INTEGER-EXACT (mean-word-length band as
    cross-multiplied integer comparisons 3·n ≤ Σlen ≤ 10·n; alpha ratio as
    10·alpha < 6·chars) so no float ever decides membership. ONE corpus
    scan computes all flags map-side (array HOFs, no explode), ONE global
    aggregate produces every count, and the 5-row report is an unpivot of
    that single row — at 100 TB this is a single pass with partial
    aggregation regardless of how many filters the stack grows.
    """
    toks = tokens_col()
    feat = load(spark, sf_dir, "documents").select(
        F.length("text").alias("nc"),
        F.size(toks).alias("nw"),
        F.coalesce(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
            F.lit(0).cast("long"),
        ).alias("sl"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("na"),
    )
    i = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    flags = feat.select(
        i(F.col("nc") < 100).alias("f_short"),
        i(F.col("nw") < 20).alias("f_words"),
        i(~((3 * F.col("nw") <= F.col("sl")) & (F.col("sl") <= 10 * F.col("nw")))).alias(
            "f_wordlen"
        ),
        i(10 * F.col("na") < 6 * F.col("nc")).alias("f_alpha"),
    )
    nfl = F.col("f_short") + F.col("f_words") + F.col("f_wordlen") + F.col("f_alpha")
    others = {
        "short": F.col("f_words") + F.col("f_wordlen") + F.col("f_alpha"),
        "few_words": F.col("f_short") + F.col("f_wordlen") + F.col("f_alpha"),
        "word_len": F.col("f_short") + F.col("f_words") + F.col("f_alpha"),
        "non_alpha": F.col("f_short") + F.col("f_words") + F.col("f_wordlen"),
    }
    own = {
        "short": F.col("f_short"),
        "few_words": F.col("f_words"),
        "word_len": F.col("f_wordlen"),
        "non_alpha": F.col("f_alpha"),
    }
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for name in own:
        aggs.append(F.sum(own[name]).alias(f"s_{name}"))
        aggs.append(
            F.count(F.when((own[name] == 1) & (others[name] == 0), 1)).alias(
                f"u_{name}"
            )
        )
    aggs.append(F.count(F.when(nfl >= 1, 1)).alias("s_any"))
    aggs.append(F.count(F.when(nfl == 1, 1)).alias("u_any"))
    tot = flags.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', s_{name}, u_{name}"
        for name in [*own, "any"]
    )
    return tot.select(
        F.expr(
            f"stack(5, {stack_args}) AS (filter_name, n_fail, n_fail_unique)"
        ),
        "n_docs",
    ).select(
        "filter_name",
        "n_docs",
        "n_fail",
        "n_fail_unique",
        r4(F.col("n_fail").cast("double") / F.col("n_docs")).alias("fail_frac"),
    )


# ensemble vote: majority of (gopher rules, repetition gate, classifier)
def _qe_sql_z() -> str:
    from upflow_spark.pipeline.textstats import _QW

    return (
        f"{_QW['bias']}"
        f" + {_QW['len']} * least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)"
        f" + {_QW['short']} * (CAST(len(list_filter(toks, t -> len(t) <= 2))"
        f" AS DOUBLE) / len(toks))"
        f" + {_QW['div']} * (CAST(len(list_distinct(toks)) AS DOUBLE)"
        f" / len(toks))"
        f" + {_QW['marker']} * (CAST(len(list_filter(toks,"
        f" t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)"
        f" / len(toks))"
    )


def _qe_oracle() -> str:
    return f"""
WITH qe_base AS MATERIALIZED (
  SELECT doc_id, lang, n_chars, {SQL_TOKENS} AS toks FROM documents
  WHERE len({SQL_TOKENS}) > 0
),
qe_sig AS MATERIALIZED (
  SELECT doc_id, lang,
         (len(toks) BETWEEN 20 AND 1000
          AND list_avg(list_transform(toks, t -> CAST(length(t) AS DOUBLE)))
              BETWEEN 2 AND 12
          AND len(list_filter(toks, t -> t IN {SQL_STOPWORDS}))
              / CAST(len(toks) AS DOUBLE) >= 0.01
          AND len(list_filter(toks, t -> regexp_full_match(t, '[a-z]+')))
              / CAST(len(toks) AS DOUBLE) >= 0.8) AS s_gopher,
         ({_qe_sql_z()}) >= 0.0 AS s_clf
  FROM qe_base
),
qe_rep AS MATERIALIZED (
  SELECT doc_id, max(c) * 10 <= sum(c) AS s_rep FROM (
    SELECT doc_id, w, count(*) AS c FROM (
      SELECT doc_id, unnest({SQL_TOKENS}) AS w FROM documents
    ) GROUP BY doc_id, w
  ) GROUP BY doc_id
),
qe_v AS MATERIALIZED (
  SELECT s.lang,
         CASE WHEN (CASE WHEN s.s_gopher THEN 1 ELSE 0 END
                    + CASE WHEN r.s_rep THEN 1 ELSE 0 END
                    + CASE WHEN s.s_clf THEN 1 ELSE 0 END) >= 2 THEN 'kept'
              WHEN NOT s.s_gopher THEN 'gopher'
              WHEN NOT r.s_rep THEN 'repetition'
              ELSE 'classifier' END AS verdict
  FROM qe_sig s JOIN qe_rep r USING (doc_id)
),
qe_tot AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS tot FROM qe_v GROUP BY lang
)
SELECT v.lang, v.verdict, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) * 10000 // t.tot AS BIGINT) AS share_bp
FROM qe_v v JOIN qe_tot t USING (lang)
GROUP BY v.lang, v.verdict, t.tot
"""


@query("curation_quality_ensemble", oracle=_qe_oracle())
def curation_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENSEMBLE quality gate — majority vote of the three filter families
    the repo grades separately (Gopher rule battery, repetition gate,
    learned classifier), which is how production curation actually ships
    (no single filter survives contact with a 100 TB crawl; FineWeb/
    Dolma-style pipelines vote): keep = ≥2 of 3 pass; rejected docs are
    billed to the FIRST failing family in fixed order, per language.

    Determinism: the repetition gate compares integers (max_count·10 ≤
    total), the classifier vote is z ≥ 0 (sigmoid is monotone — the
    probability never needs computing), and the Gopher thresholds reuse
    the proven identical-IEEE feature expressions. Graded per (lang,
    verdict): doc count + share in integer basis points.

    Plan: two corpus passes (one map-only signal scan, one (doc, term)
    groupBy for the repetition gate) joined on doc_id, then a 5×4-row
    rollup. Each signal family is independently testable; the ensemble
    adds one join, no new scan.
    """
    d = load(spark, sf_dir, "documents")
    toks = tokens_col()
    from upflow_spark.pipeline.textstats import _QW

    n = F.size(toks).cast("double")
    len_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    s_gopher = (
        F.size(toks).between(20, 1000)
        & (len_sum / n).between(2, 12)
        & (
            F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
            / n
            >= 0.01
        )
        & (
            F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))).cast("double")
            / n
            >= 0.8
        )
    )
    z = (
        F.lit(_QW["bias"])
        + F.lit(_QW["len"])
        * F.least(F.col("n_chars").cast("double") / 500.0, F.lit(1.0))
        + F.lit(_QW["short"])
        * (F.size(F.filter(toks, lambda t: F.length(t) <= 2)).cast("double") / n)
        + F.lit(_QW["div"]) * (F.size(F.array_distinct(toks)).cast("double") / n)
        + F.lit(_QW["marker"])
        * (
            F.size(
                F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to"))
            ).cast("double")
            / n
        )
    )
    sig = d.filter(F.size(toks) > 0).select(
        "doc_id",
        "lang",
        s_gopher.alias("s_gopher"),
        (z >= 0.0).alias("s_clf"),
    )
    rep = (
        d.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") * 10 <= F.sum("c")).alias("s_rep"))
    )
    votes = (
        F.when(F.col("s_gopher"), 1).otherwise(0)
        + F.when(F.col("s_rep"), 1).otherwise(0)
        + F.when(F.col("s_clf"), 1).otherwise(0)
    )
    verdict = (
        F.when(votes >= 2, "kept")
        .when(~F.col("s_gopher"), "gopher")
        .when(~F.col("s_rep"), "repetition")
        .otherwise("classifier")
    )
    v = sig.join(rep, "doc_id").select("lang", verdict.alias("verdict"))
    tot = v.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("tot"))
    return (
        v.groupBy("lang", "verdict")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "verdict",
            "n_docs",
            F.expr("(n_docs * 10000) div tot").cast("long").alias("share_bp"),
        )
    )
