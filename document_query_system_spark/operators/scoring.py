"""Model-based corpus scoring, round 6 second half: statistical
language-model perplexity, duplicated-span detection, a logistic
quality classifier, and deterministic dataset splits.

These are the "model" tier of the cleaning stack — above the ratio
heuristics (functions/text.py) and the distributional cuts
(corpus.py): CCNet orders documents by LM perplexity, Gopher/C4 use
trained quality classifiers, and Lee et al. (ACL 2022) remove
repeated spans, not just whole near-dup documents.

Scale shapes:

- LM perplexity: the bigram model IS two corpus aggregates (unigram
  and bigram counts); scoring is two equi-joins on the token keys —
  shuffle ∝ corpus tokens, model build amortized exactly like the
  TF-IDF index. A trained KenLM would slot in as a broadcast
  Arrow-UDF scorer; the counting LM keeps the whole path
  oracle-checkable.
- Dup-span fraction: distinct (doc, span) posting table + one
  span-key groupBy — the document-frequency plan again, never
  pairwise.
- Quality classifier: feature extraction and the sigmoid are pure
  column expressions over the scan (array HOFs, no shuffle at all);
  the fixed weight vector stands in for a trained fasttext/LR model
  whose coefficients would arrive as literals the same way.
- Split assignment: deterministic hash bucket per doc — any executor
  can compute any document's split with zero coordination, which is
  what makes the split reproducible across reruns and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import token_hash, token_hash_sql, tokens, tokens_sql
from ..registry import register
from ..sources.tables import load, spread

# --------------------------------------------------- bigram LM perplexity
#
# CCNet's quality signal: score each document by the perplexity of a
# language model over it (ref pipeline has no equivalent — its quality
# gate is keyword overlap only). The model here is the corpus's own
# add-one-smoothed bigram LM:
#
#   p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)
#
# trained and applied in the same job. Per-occurrence -ln p rounds to
# 6 before the per-doc sum (registry float conventions), the per-doc
# mean to 4, so ordering is engine-identical.


@register(
    "q_lm_perplexity",
    oracle=f"""
WITH tok AS (SELECT doc_id, {tokens_sql('lower(text)')} AS tk FROM documents),
uni AS (
  SELECT term, count(*) AS c1
  FROM (SELECT unnest(tk) AS term FROM tok) GROUP BY term
),
vocab AS (SELECT count(*) AS v FROM uni),
big AS (
  SELECT doc_id, tk[i] AS w1, tk[i] || ' ' || tk[i + 1] AS bg
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
        FROM tok WHERE len(tk) >= 2)
),
bc AS (SELECT bg, count(*) AS c12 FROM big GROUP BY bg),
occ AS (
  SELECT b.doc_id,
         round(-ln((bc.c12 + 1.0) / (u.c1 + v.v)), 6) AS nll
  FROM big b JOIN bc USING (bg) JOIN uni u ON b.w1 = u.term CROSS JOIN vocab v
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(round(sum(nll), 6) / count(*), 4) AS avg_nll,
       round(exp(round(round(sum(nll), 6) / count(*), 4)), 4) AS ppl
FROM occ GROUP BY doc_id
""",
)
def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity per document (CCNet's quality ordering
    signal): train add-one-smoothed bigram probabilities on the corpus
    itself, score every document by mean -ln p(w2|w1), report
    ppl = exp(mean).

    Plan: ONE tokenization pass (lazily checkpointed — it feeds the
    unigram, vocab, and bigram subtrees) → two count aggregates (the
    "model") → two equi-joins keying the bigram occurrences back to
    their counts → one per-doc aggregate. The unigram join stays a
    shuffle join on purpose: at 100 TB the vocab is itself too big to
    broadcast. Swapping in a trained KenLM = replacing the two count
    relations with a broadcast scorer; everything else keeps its
    shape."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = docs.select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("tk")
    ).localCheckpoint(eager=False)
    uni = (
        tok.select(F.explode("tk").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c1"))
        .localCheckpoint(eager=False)
    )
    vocab = F.broadcast(uni.agg(F.count("*").alias("v")))
    big = (
        tok.filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            "tk",
            F.explode(F.sequence(F.lit(1), F.size("tk") - 1)).alias("i"),
        )
        .select(
            "doc_id",
            F.element_at("tk", F.col("i")).alias("w1"),
            F.concat_ws(
                " ",
                F.element_at("tk", F.col("i")),
                F.element_at("tk", F.col("i") + 1),
            ).alias("bg"),
        )
        .localCheckpoint(eager=False)
    )
    bc = big.groupBy("bg").agg(F.count("*").alias("c12"))
    occ = (
        big.join(bc, "bg")
        .join(uni.withColumnRenamed("term", "w1"), "w1")
        .crossJoin(vocab)
        .select(
            "doc_id",
            F.round(
                -F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))),
                6,
            ).alias("nll"),
        )
    )
    avg = F.round(F.round(F.sum("nll"), 6) / F.count("*"), 4)
    return occ.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        avg.alias("avg_nll"),
        F.round(F.exp(avg), 4).alias("ppl"),
    )


# ------------------------------------------------ duplicated-span fraction
#
# Lee et al. ("Deduplicating Training Data Makes Language Models
# Better", ACL 2022) remove SPANS that recur across the corpus, not
# just whole documents. The scalable signal is per-document: what
# fraction of a document's distinct 3-token spans also occur in some
# other document. High-fraction docs are boilerplate assemblies even
# when no single whole-document near-dup exists.

_SPAN_W = 3
_SPAN_FLAG = 0.5


@register(
    "q_dup_span_frac",
    oracle=f"""
WITH tok AS (SELECT doc_id, {tokens_sql('lower(text)')} AS tk FROM documents),
sp AS (
  SELECT DISTINCT doc_id,
         tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS span
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - {_SPAN_W - 1})) AS i
        FROM tok WHERE len(tk) >= {_SPAN_W})
),
dfq AS (SELECT span, count(*) AS df FROM sp GROUP BY span)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
         AS dup_frac,
       (sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)
          > {_SPAN_FLAG}) AS flagged
FROM sp JOIN dfq USING (span) GROUP BY doc_id
""",
)
def q_dup_span_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span fraction per document: the share of a doc's
    distinct 3-token spans that occur in at least one other document,
    with a boilerplate flag above 0.5 (span-level dedup signal of Lee
    et al., ACL 2022 — finer than whole-doc near-dup).

    Plan: distinct (doc, span) posting table → span-key df aggregate
    → equi-join back → per-doc aggregate. Because spans are DISTINCT
    per doc, df >= 2 means "some OTHER document has it" without a
    doc<>doc pairwise join anywhere; shuffle ∝ distinct corpus
    spans."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("tk"))
    sp = (
        tok.filter(F.size("tk") >= _SPAN_W)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("tk") - (_SPAN_W - 1))
            ).alias("i"),
            "tk",
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                *[F.element_at("tk", F.col("i") + j) for j in range(_SPAN_W)],
            ).alias("span"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    dfq = sp.groupBy("span").agg(F.count("*").alias("df"))
    dup = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
    frac = dup / F.count("*").cast("double")
    return (
        sp.join(dfq, "span")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            dup.cast("long").alias("n_dup"),
            F.round(frac, 6).alias("dup_frac"),
            (frac > _SPAN_FLAG).alias("flagged"),
        )
    )


# ------------------------------------------------ logistic quality classifier
#
# The trained-classifier stage of Gopher/C4-style pipelines (fasttext
# or logistic regression over cheap features). Weights here are fixed
# literals — exactly how a trained model's coefficients would arrive
# in a Spark plan — so the whole scorer is scan-local column
# expressions and the oracle checks the identical arithmetic. The
# features use what actually varies in the synthetic corpus:
# type-token ratio, stopword share, mean token length, and length.

# Integer weights on purpose: features are rounded to 6 decimals, and
# an integer multiple of a 6-decimal value is still a 6-decimal value
# — a fractional weight (e.g. 0.5) manufactures exact decimal ties at
# the 7th digit where Spark's and DuckDB's round() can disagree.
_CLF_W = {
    "bias": -4.0,
    "ttr": 5.0,
    "stop_share": 15.0,
    "mean_len": 1.0,  # applied to (mean_len - 4.0)
}
_CLF_STOPWORDS = ("a", "the")


@register(
    "q_quality_classifier",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {tokens_sql('lower(text)')} AS tk FROM documents
),
feat AS (
  SELECT doc_id,
         len(tk) AS n_tokens,
         round(len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE), 6) AS ttr,
         round(len(list_filter(tk, t -> t IN {_CLF_STOPWORDS!r}))
               / CAST(len(tk) AS DOUBLE), 6) AS stop_share,
         round(list_sum(list_transform(tk, t -> len(t)))
               / CAST(len(tk) AS DOUBLE), 6) AS mean_len
  FROM tok WHERE len(tk) > 0
),
sc AS (
  SELECT doc_id, n_tokens, ttr, stop_share, mean_len,
         round({_CLF_W['bias']} + {_CLF_W['ttr']} * ttr
               + {_CLF_W['stop_share']} * stop_share
               + {_CLF_W['mean_len']} * (mean_len - 4.0), 6) AS logit
  FROM feat
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, ttr, stop_share, mean_len,
       logit,
       round(1.0 / (1.0 + exp(-logit)), 6) AS score,
       (round(1.0 / (1.0 + exp(-logit)), 6) >= 0.5) AS keep
FROM sc
""",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-regression quality classifier (the trained-model stage
    of Gopher/C4 cleaning): sigmoid over fixed-coefficient features —
    type-token ratio, stopword share, mean token length — with a keep
    decision at score >= 0.5.

    Entirely scan-local: tokenization, the three features (array
    HOFs), the dot product, and the sigmoid are column expressions —
    zero shuffles, so the classifier runs at full scan bandwidth at
    any scale. A trained fasttext/LR model swaps in by replacing the
    literal weights (or, for an embedding model, an Arrow
    mapInPandas scorer); the keep-decision plumbing is unchanged."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = docs.select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("tk")
    ).filter(F.size("tk") > 0)
    n = F.size("tk").cast("double")
    feat = tok.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tokens"),
        F.round(F.size(F.array_distinct("tk")) / n, 6).alias("ttr"),
        F.round(
            F.size(
                F.filter(F.col("tk"), lambda t: t.isin(*_CLF_STOPWORDS))
            )
            / n,
            6,
        ).alias("stop_share"),
        F.round(
            F.aggregate(
                F.transform(F.col("tk"), F.length),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / n,
            6,
        ).alias("mean_len"),
    )
    logit = F.round(
        F.lit(_CLF_W["bias"])
        + F.lit(_CLF_W["ttr"]) * F.col("ttr")
        + F.lit(_CLF_W["stop_share"]) * F.col("stop_share")
        + F.lit(_CLF_W["mean_len"]) * (F.col("mean_len") - F.lit(4.0)),
        6,
    )
    sc = feat.withColumn("logit", logit)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))), 6)
    return sc.select(
        "doc_id",
        "n_tokens",
        "ttr",
        "stop_share",
        "mean_len",
        "logit",
        score.alias("score"),
        (score >= 0.5).alias("keep"),
    )


# ----------------------------------------------- deterministic dataset split
#
# Train/valid/test assignment must be a pure function of the document
# identity — reruns, engines, and executors must all agree, and no
# coordination or global sort can be involved. Bucket = shared
# polynomial hash of the doc id, mod 100; 80/10/10.

_SPLITS = (("train", 0, 80), ("valid", 80, 90), ("test", 90, 100))


def _split_case_sql(bucket: str) -> str:
    arms = " ".join(
        f"WHEN {bucket} >= {lo} AND {bucket} < {hi} THEN '{name}'"
        for name, lo, hi in _SPLITS
    )
    return f"CASE {arms} END"


@register(
    "q_split_assign",
    oracle=f"""
WITH b AS (
  SELECT doc_id, lang,
         {token_hash_sql("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
  FROM documents
),
s AS (SELECT lang, {_split_case_sql('bucket')} AS split FROM b),
tot AS (SELECT lang, count(*) AS n_lang FROM s GROUP BY lang)
SELECT s.lang, s.split,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(count(*) / CAST(any_value(t.n_lang) AS DOUBLE), 6) AS share
FROM s JOIN tot t USING (lang)
GROUP BY s.lang, s.split
""",
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split, summarized per
    (lang, split) with each split's share of its language: bucket =
    polynomial hash of the doc id mod 100 — a pure function of
    identity, so any executor (or any engine) reproduces the
    assignment with zero coordination, and adding documents never
    reshuffles existing ones.

    The assignment itself is scan-local; the summary is one groupBy
    plus a broadcast join of per-language totals (no window over the
    corpus)."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "lang"))
    bucket = token_hash(F.col("doc_id").cast("string")) % 100
    split = F.lit(None).cast("string")
    for name, lo, hi in reversed(_SPLITS):
        split = F.when(
            (F.col("bucket") >= lo) & (F.col("bucket") < hi), F.lit(name)
        ).otherwise(split)
    s = docs.select("lang", bucket.alias("bucket")).select(
        "lang", split.alias("split")
    )
    tot = F.broadcast(s.groupBy("lang").agg(F.count("*").alias("n_lang")))
    return (
        s.join(tot, "lang")
        .groupBy("lang", "split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(
                F.count("*") / F.any_value("n_lang").cast("double"), 6
            ).alias("share"),
        )
    )


# ------------------------------------------------ classifier calibration
#
# Reliability diagram for the logistic quality classifier: bin the
# predicted keep-probability into fixed-width deciles and compare
# each bin's mean score against the observed rate of an INDEPENDENT
# reference label — the C4 heuristic chain from
# q_quality_filter_chain (sampling.py). A well-calibrated scorer has
# gap ≈ 0 per bin; systematic positive gaps mean the model is
# over-confident for that score range. Fixed-width bins (not
# quantile bins) so the binning is trivially engine-identical.


def _calibration_sql() -> str:
    from .sampling import _MAX_MEAN_WORD_LEN, _MIN_WORDS

    return f"""
WITH tok AS (
  SELECT doc_id, {tokens_sql('lower(text)')} AS tk FROM documents
),
feat AS (
  SELECT doc_id,
         round(len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE), 6) AS ttr,
         round(len(list_filter(tk, t -> t IN {_CLF_STOPWORDS!r}))
               / CAST(len(tk) AS DOUBLE), 6) AS stop_share,
         round(list_sum(list_transform(tk, t -> len(t)))
               / CAST(len(tk) AS DOUBLE), 6) AS mean_len
  FROM tok WHERE len(tk) > 0
),
scored AS (
  SELECT doc_id,
         round(1.0 / (1.0 + exp(-round({_CLF_W['bias']} + {_CLF_W['ttr']} * ttr
               + {_CLF_W['stop_share']} * stop_share
               + {_CLF_W['mean_len']} * (mean_len - 4.0), 6))), 6) AS score
  FROM feat
),
lbl AS (
  SELECT doc_id,
         (len(toks) >= {_MIN_WORDS}
          AND CAST(length(text) AS DOUBLE) / greatest(len(toks), 1)
                <= {_MAX_MEAN_WORD_LEN}
          AND len(list_filter(toks, t -> t IN ('the', 'a', 'is', 'of'))) > 0
          AND NOT contains(text, '{{')) AS ref_keep
  FROM (SELECT doc_id, text, {tokens_sql('text')} AS toks FROM documents)
)
SELECT CAST(least(floor(s.score * 10), 9) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(round(s.score * 1000000) AS BIGINT)) AS DOUBLE)
             / count(*) / 1000000.0, 6) AS mean_score,
       round(sum(CASE WHEN l.ref_keep THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS ref_rate
FROM scored s JOIN lbl l USING (doc_id)
GROUP BY least(floor(s.score * 10), 9)
"""


@register("q_classifier_calibration", oracle=_calibration_sql())
def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability bins for the quality classifier: per score decile,
    document count, mean predicted score, and the observed pass rate
    of the independent C4 heuristic chain (q_quality_filter_chain) —
    the monitoring report that catches scorer drift before it skews
    the corpus mix. See the module comment above _calibration_sql.

    Plan: the classifier features, the sigmoid, and the reference
    label are all scan-local column expressions over ONE documents
    scan (the two token pipelines share it); the report is a single
    ≤10-group hash aggregate — one shuffle, output bounded by the
    bin count forever. Mean scores aggregate as integer micro-units
    (order-free)."""
    from .sampling import _MAX_MEAN_WORD_LEN, _MIN_WORDS, _STOP

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    tk = tokens(F.lower(F.col("text")))
    toks = tokens(F.col("text"))
    base = docs.select("doc_id", "text", tk.alias("tk"), toks.alias("toks"))
    n = F.size("tk").cast("double")
    feat = base.filter(F.size("tk") > 0).select(
        "doc_id",
        "text",
        "toks",
        F.round(F.size(F.array_distinct("tk")) / n, 6).alias("ttr"),
        F.round(
            F.size(F.filter(F.col("tk"), lambda t: t.isin(*_CLF_STOPWORDS))) / n,
            6,
        ).alias("stop_share"),
        F.round(
            F.aggregate(
                F.transform(F.col("tk"), F.length), F.lit(0), lambda a, x: a + x
            )
            / n,
            6,
        ).alias("mean_len"),
    )
    logit = F.round(
        F.lit(_CLF_W["bias"])
        + F.lit(_CLF_W["ttr"]) * F.col("ttr")
        + F.lit(_CLF_W["stop_share"]) * F.col("stop_share")
        + F.lit(_CLF_W["mean_len"]) * (F.col("mean_len") - F.lit(4.0)),
        6,
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    ref = (
        (F.size("toks") >= _MIN_WORDS)
        & (
            F.length("text").cast("double")
            / F.greatest(F.size("toks"), F.lit(1))
            <= _MAX_MEAN_WORD_LEN
        )
        & (F.size(F.filter(F.col("toks"), lambda t: t.isin(*_STOP))) > 0)
        & (~F.col("text").contains("{"))
    )
    s2 = feat.select("doc_id", score.alias("score"), ref.alias("ref_keep"))
    return (
        s2.groupBy(
            F.least(F.floor(F.col("score") * 10), F.lit(9))
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum(F.round(F.col("score") * 1e6).cast("long")).cast("double")
                / F.count("*")
                / 1e6,
                6,
            ).alias("mean_score"),
            F.round(
                F.sum(F.when(F.col("ref_keep"), 1).otherwise(0))
                / F.count("*").cast("double"),
                6,
            ).alias("ref_rate"),
        )
    )


# ------------------------------------------------------- readability


@register(
    "q_readability",
    oracle=r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
       CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS n_sentences,
       CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
            AS BIGINT) AS n_syllables,
       round(206.835
             - 1.015 * (len(regexp_split_to_array(trim(text), '\s+'))
               / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                      AS DOUBLE))
             - 84.6 * (greatest(len(regexp_extract_all(lower(text),
                                                       '[aeiouy]+')), 1)
               / CAST(len(regexp_split_to_array(trim(text), '\s+'))
                      AS DOUBLE)), 4) AS flesch
FROM documents
""",
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the classic readability cut
    quality pipelines apply next to the ratio heuristics (very low
    scores flag legalese/boilerplate; impossibly high ones flag
    token-salad). Syllables use the standard vowel-group
    approximation (runs of [aeiouy]); sentences count terminal
    punctuation runs, floored at 1 so fragments don't divide by zero.
    All three counts and the score are scan-local column expressions
    in the RE2 ∩ java.util.regex common subset — zero shuffles, the
    pass costs one corpus read at any scale."""
    d = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)),
        F.lit(1),
    ).cast("long")
    sylls = F.greatest(
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), 0)
        ),
        F.lit(1),
    ).cast("long")
    staged = d.select(
        "doc_id",
        words.alias("n_words"),
        sents.alias("n_sentences"),
        sylls.alias("n_syllables"),
    )
    return staged.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            206.835
            - 1.015 * (F.col("n_words") / F.col("n_sentences"))
            - 84.6 * (F.col("n_syllables") / F.col("n_words")),
            4,
        ).alias("flesch"),
    )
