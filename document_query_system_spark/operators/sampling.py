"""Corpus sampling + filter-chain operators for training-data
pipelines: stratified sampling, deterministic hash sampling, and the
C4-style quality filter chain.

Sampling at 100 TB must be (a) single-pass, (b) deterministic /
reproducible, (c) skew-aware per stratum. The deterministic variants
here key on a hash of a stable id — re-running the pipeline selects
the same sample (the property that makes train/held-out splits
reproducible) — and everything is a pure column expression, so the
sample predicate pushes into the scan pipeline and unselected rows
never leave the reader stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load, spread
from ..functions.hashing import tokens, tokens_sql

# Deterministic id-hash sample: keep doc iff md5(doc_id) mod M < K.
_SAMPLE_MOD = 10
_SAMPLE_KEEP = 3  # → 30% expected rate


def _bucket(col: str):
    # First 6 md5 hex digits as an int — engine-portable uniform hash.
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 6), 16, 10).cast(
        "long"
    )


_BUCKET_SQL = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)"


# C4-style quality filter chain (Raffel et al. 2020 heuristics,
# re-scaled to the synthetic corpus): each rule is a boolean column,
# the verdict is their conjunction, and per-rule pass counts make the
# chain auditable.
_MIN_WORDS = 20
_MAX_MEAN_WORD_LEN = 12.0
_STOP = ("the", "a", "is", "of")


@register(
    "q_quality_filter_chain",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, text, {tokens_sql('text')} AS toks FROM documents
),
rules AS (
  SELECT doc_id,
         len(toks) >= {_MIN_WORDS} AS r_min_words,
         CAST(length(text) AS DOUBLE) / greatest(len(toks), 1)
           <= {_MAX_MEAN_WORD_LEN} AS r_word_len,
         len(list_filter(toks, t -> t IN ('the', 'a', 'is', 'of'))) > 0
           AS r_has_stopword,
         NOT contains(text, '{{')  AS r_no_braces
  FROM tok
)
SELECT doc_id, r_min_words, r_word_len, r_has_stopword, r_no_braces,
       r_min_words AND r_word_len AND r_has_stopword AND r_no_braces AS keep
FROM rules
""",
)
def q_quality_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality filter chain: min word count, mean word
    length bound, stopword presence, no code-ish braces — each rule a
    column (auditable per-rule), verdict their conjunction. One scan,
    zero shuffles; at 100 TB this runs as a pure map over document
    partitions with the verdict usable as a pushed filter for
    downstream stages."""
    d = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    t = d.select("doc_id", "text", tokens(F.col("text")).alias("toks"))
    r1 = (F.size("toks") >= _MIN_WORDS).alias("r_min_words")
    r2 = (
        F.length("text").cast("double") / F.greatest(F.size("toks"), F.lit(1))
        <= _MAX_MEAN_WORD_LEN
    ).alias("r_word_len")
    r3 = (
        F.size(F.filter(F.col("toks"), lambda t_: t_.isin(*_STOP))) > 0
    ).alias("r_has_stopword")
    r4 = (~F.col("text").contains("{")).alias("r_no_braces")
    rules = t.select("doc_id", r1, r2, r3, r4)
    return rules.select(
        "*",
        (
            F.col("r_min_words")
            & F.col("r_word_len")
            & F.col("r_has_stopword")
            & F.col("r_no_braces")
        ).alias("keep"),
    )


@register(
    "q_sample_hash",
    oracle=f"""
SELECT doc_id, lang
FROM (SELECT doc_id, lang, {_BUCKET_SQL} % {_SAMPLE_MOD} AS b FROM documents)
WHERE b < {_SAMPLE_KEEP}
""",
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling: md5(doc_id) bucket < threshold.
    Unlike df.sample() (seeded per-partition RNG — resample changes
    when partitioning changes), the id-hash sample is stable under
    repartition, retry, and re-run: the contract a reproducible
    training split needs."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return d.filter(_bucket("doc_id") % _SAMPLE_MOD < _SAMPLE_KEEP).select(
        "doc_id", "lang"
    )


@register(
    "q_sample_stratified",
    oracle=f"""
WITH b AS (
  SELECT doc_id, lang, {_BUCKET_SQL} % 100 AS pct FROM documents
)
SELECT doc_id, lang
FROM b
WHERE pct < CASE lang WHEN 'en' THEN 10 ELSE 40 END
""",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (downsample the
    over-represented language, keep more of the rest — the standard
    rebalancing move for multilingual corpora). Same deterministic
    id-hash; the rate map is a CASE expression, so this is still one
    scan-local predicate — no shuffle, no per-stratum pass."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    pct = _bucket("doc_id") % 100
    rate = F.when(F.col("lang") == "en", F.lit(10)).otherwise(F.lit(40))
    return d.filter(pct < rate).select("doc_id", "lang")


@register(
    "q_sample_per_stratum_topk",
    oracle="""
SELECT lang, doc_id, n_chars
FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
)
WHERE rn <= 5
""",
)
def q_sample_per_stratum_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum top-k (longest docs per language) — the 'best-of'
    selection variant of stratified sampling; bounded output per
    group regardless of stratum skew."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "q_repetition_metrics",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
),
tf AS (
  SELECT doc_id, len(toks) AS n_tok,
         unnest(toks) AS tok
  FROM tok
),
counts AS (
  SELECT doc_id, n_tok, tok, count(*) AS c
  FROM tf GROUP BY doc_id, n_tok, tok
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(max(c) AS BIGINT) AS top_token_count,
       round(CAST(max(c) AS DOUBLE) / n_tok, 6) AS top_token_frac,
       round(CAST(count(*) AS DOUBLE) / n_tok, 6) AS distinct_frac
FROM counts
GROUP BY doc_id, n_tok
""",
)
def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics (Rae et al. 2021 quality
    rules): per document, the most-frequent-token fraction and the
    distinct-token fraction — the signals behind 'drop docs dominated
    by one token / with low lexical diversity'. Explode + two-level
    aggregation keyed by doc_id: both shuffles carry O(distinct
    tokens) not O(tokens), and at 100 TB this keys on the same doc_id
    bucketing as every other per-document pass."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    tf = tok.select(
        "doc_id", F.size("toks").alias("n_tok"), F.explode_outer("toks").alias("tok")
    ).filter(F.col("tok").isNotNull())
    counts = tf.groupBy("doc_id", "n_tok", "tok").agg(F.count("*").alias("c"))
    return counts.groupBy("doc_id", "n_tok").agg(
        F.max("c").alias("top_token_count"),
        F.round(F.max("c").cast("double") / F.col("n_tok"), 6).alias(
            "top_token_frac"
        ),
        F.round(F.count("*").cast("double") / F.col("n_tok"), 6).alias(
            "distinct_frac"
        ),
    ).select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tokens"),
        "top_token_count",
        "top_token_frac",
        "distinct_frac",
    )


# --------------------------------------------- relative quality cut
#
# Absolute quality thresholds (the C4 chain above) break when score
# distributions drift per language; the mixing recipe usually wants
# "the best X% of EACH language" instead. percent_rank within the
# language stratum gives the exact relative cut; strata rank in
# parallel. At 100 TB a very large stratum's window sort is the cost
# — the approximate swap-in is percentile_approx(quality, 1-frac) per
# stratum (one agg, partial-combinable) + a threshold filter, same
# output up to boundary ties.

_TOPFRAC = 0.25


@register(
    "q_sample_quality_topfrac",
    oracle=f"""
WITH tok AS (SELECT doc_id, lang, {{toks}} AS toks FROM documents),
m AS (
  SELECT doc_id, lang,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq
  FROM tok
  WHERE len(toks) > 0
),
q AS (
  SELECT doc_id, lang,
         0.5 * (n_uniq / n) + 0.5 * (1.0 - n_stop / n) AS quality
  FROM m
),
r AS (
  SELECT doc_id, lang, quality,
         percent_rank() OVER (PARTITION BY lang
                              ORDER BY quality DESC, doc_id) AS pr
  FROM q
)
SELECT lang, doc_id, round(quality, 6) AS quality, round(pr, 6) AS pr
FROM r WHERE pr <= {_TOPFRAC}
""".format(toks=tokens_sql("text")),
)
def q_sample_quality_topfrac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language relative quality cut: keep the top 25% of each
    language stratum by the engine's quality score (percent_rank with
    a doc_id tiebreak — exact rational, engine-portable). The same
    stopword/diversity score as q_quality_score, staged per the
    embed.py:55-62 discipline."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "lang", "text"))
    s1 = docs.select("doc_id", "lang", tokens(F.col("text")).alias("toks"))
    m = s1.filter(F.size("toks") > 0).select(
        "doc_id",
        "lang",
        F.size("toks").cast("double").alias("n"),
        F.size(F.filter(F.col("toks"), lambda t: t.isin("the", "a")))
        .cast("double")
        .alias("n_stop"),
        F.size(F.array_distinct("toks")).cast("double").alias("n_uniq"),
    )
    q = m.select(
        "doc_id",
        "lang",
        (
            0.5 * (F.col("n_uniq") / F.col("n"))
            + 0.5 * (1.0 - F.col("n_stop") / F.col("n"))
        ).alias("quality"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("quality"), F.asc("doc_id"))
    r = q.withColumn("pr", F.percent_rank().over(w))
    return r.filter(F.col("pr") <= _TOPFRAC).select(
        "lang",
        "doc_id",
        F.round("quality", 6).alias("quality"),
        F.round("pr", 6).alias("pr"),
    )
