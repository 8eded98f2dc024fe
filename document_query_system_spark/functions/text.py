"""Text analysis for large-scale training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

These are the per-document scoring passes an LLM-data pipeline runs
over every document before filtering — all pure column expressions
(zero Python in the hot path), embarrassingly parallel over document
partitions at any scale. Intermediates are staged as columns
(see functions/vector.py staging note) so token arrays are computed
once per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load, spread
from .hashing import P, token_hashes, token_hashes_sql, tokens, tokens_sql

# Tiny per-language stopword profiles for the heuristic language-ID.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "of"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "la", "les", "et"),
}

STOPWORDS = ("the", "a")

_BPE_ISH = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@register(
    "q_token_count",
    oracle=f"""
WITH tok AS (SELECT doc_id, text, {tokens_sql('text')} AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_ISH}')) AS BIGINT) AS n_subtokens
FROM tok
""",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex piece count
    (letters / digits / punctuation runs) — the unit a data pipeline
    budgets by."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    s1 = docs.select("doc_id", "text", tokens(F.col("text")).alias("toks"))
    return s1.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_ISH), 0))
        .cast("long")
        .alias("n_subtokens"),
    )


@register(
    "q_quality_score",
    oracle=f"""
WITH tok AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_uniq
  FROM tok
  WHERE len(toks) > 0
)
SELECT doc_id,
       n_stop / n AS stopword_ratio,
       n_uniq / n AS unique_ratio,
       round(0.5 * (n_uniq / n) + 0.5 * (1.0 - n_stop / n), 6) AS quality
FROM m
""",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + vocabulary diversity → a
    filterable score, the shape of heuristic quality filters in
    web-scale corpus cleaning."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    s1 = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    m = s1.filter(F.size("toks") > 0).select(
        "doc_id",
        F.size("toks").cast("double").alias("n"),
        F.size(F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS)))
        .cast("double")
        .alias("n_stop"),
        F.size(F.array_distinct("toks")).cast("double").alias("n_uniq"),
    )
    return m.select(
        "doc_id",
        (F.col("n_stop") / F.col("n")).alias("stopword_ratio"),
        (F.col("n_uniq") / F.col("n")).alias("unique_ratio"),
        F.round(
            0.5 * (F.col("n_uniq") / F.col("n"))
            + 0.5 * (1.0 - F.col("n_stop") / F.col("n")),
            6,
        ).alias("quality"),
    )


def _lang_scores_sql() -> str:
    cols = []
    for lang, prof in LANG_PROFILES.items():
        arr = ", ".join(f"'{w}'" for w in prof)
        cols.append(
            f"CAST(len(list_filter([{arr}], w -> list_contains(toks, w))) AS BIGINT)"
            f" AS s_{lang}"
        )
    return ",\n         ".join(cols)


@register(
    "q_lang_id",
    oracle=f"""
WITH tok AS (SELECT doc_id, lang, {tokens_sql('text')} AS toks FROM documents),
sc AS (
  SELECT doc_id, lang,
         {_lang_scores_sql()}
  FROM tok
)
SELECT doc_id, lang AS lang_label,
       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS lang_guess,
       s_en, s_de, s_es, s_fr
FROM sc
""",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: score the token set against tiny
    per-language stopword profiles, argmax with a fixed preference
    order. (The synthetic corpus shares one vocabulary, so the guess
    column mostly lands on 'en' — the operator shape is what scales.)"""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "lang", "text"))
    s1 = docs.select("doc_id", "lang", tokens(F.col("text")).alias("toks"))
    score_cols = [
        F.size(
            F.filter(
                F.array(*[F.lit(w) for w in prof]),
                lambda w: F.array_contains(F.col("toks"), w),
            )
        )
        .cast("long")
        .alias(f"s_{lang}")
        for lang, prof in LANG_PROFILES.items()
    ]
    sc = s1.select("doc_id", "lang", "toks", *score_cols).drop("toks")
    guess = (
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_es")) & (F.col("s_de") >= F.col("s_fr")), "de")
        .when(F.col("s_es") >= F.col("s_fr"), "es")
        .otherwise("fr")
    )
    return sc.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        guess.alias("lang_guess"),
        "s_en",
        "s_de",
        "s_es",
        "s_fr",
    )


@register(
    "q_fingerprint",
    oracle=f"""
WITH th AS (SELECT doc_id, {token_hashes_sql('text')} AS ths FROM documents)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT), ths),
                   (acc, h) -> (acc * 31 + h) % {P}) AS fingerprint
FROM th
""",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: rolling polynomial hash over the token
    hash stream — order-sensitive (unlike the bag-of-words hash), so
    token permutations get distinct fingerprints. The exact-dedup key
    for content-defined chunking pipelines."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    s1 = docs.select("doc_id", token_hashes(F.col("text")).alias("ths"))
    fp = F.aggregate(
        F.col("ths"),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % P,
    )
    return s1.select("doc_id", "ths", fp.alias("fingerprint")).drop("ths")


# ---------------------------------------------------------- real BPE encode
#
# The regex split above (_BPE_ISH) approximates subword counts; this
# is the REAL algorithm: greedy byte-pair encoding with a fixed,
# ordered merge table (exactly how a trained GPT-2/tiktoken-style
# vocabulary applies — the merges file IS the model, the encoder is
# deterministic given it). The merge list here is hand-derived from
# the synthetic corpus vocabulary; a production tokenizer swaps in
# its trained merges and nothing else changes. Not SQL-expressible
# (iterative in-word merging), so the query is rows-only with an
# EXACT pure-Python reference check in tests/test_oracle.py — every
# row recomputed and matched, a stronger bound than any tolerance.

#: Ordered merge rules: earlier = higher priority (rank order, as in
#: a trained merges.txt). Derived from frequent pairs in the fixed
#: synthetic vocabulary.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),      # th(e)
    ("th", "e"),     # the
    ("e", "r"),      # ord(er), filt(er), custom(er), m(er)ge
    ("a", "n"),      # sc(an)
    ("o", "w"),      # r(ow), sl(ow), wind(ow)
    ("i", "n"),      # jo(in), l(in)e
    ("a", "t"),      # b(at)ch, d(at)a
    ("o", "r"),      # s(or)t, vect(or)
    ("s", "c"),      # sc(an)
    ("sc", "an"),    # scan
    ("h", "a"),      # ha(sh)
    ("ha", "s"),     # has(h)
    ("has", "h"),    # hash
    ("j", "o"),      # jo(in)
    ("jo", "in"),    # join
    ("c", "o"),      # co(lumn)
    ("u", "m"),      # col(um)n
    ("q", "u"),      # qu(ery)
    ("v", "a"),      # va(lue)
    ("l", "u"),      # value
    ("s", "m"),      # sm(all)
    ("l", "l"),      # sma(ll)
    ("k", "e"),      # ke(y)
    ("ke", "y"),     # key
)


def bpe_encode(word: str, merges: tuple[tuple[str, str], ...] = BPE_MERGES) -> list[str]:
    """Greedy BPE: start from characters, repeatedly apply the
    highest-priority (lowest-rank) applicable merge until none apply.
    Pure function — the executor kernel AND the test reference."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    parts = list(word)
    while len(parts) > 1:
        best_rank, best_i = None, None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


@register("q_bpe_tokens", oracle=None)  # iterative merging — not SQL
def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE subword encoding over every document: greedy ordered
    merges (the trained-tokenizer algorithm, BPE_MERGES standing in
    for a merges.txt) via an Arrow-batched mapInPandas kernel with a
    per-word memo — the corpus vocabulary is Zipfian, so nearly every
    word encode is a dict hit and the kernel runs at memo-lookup
    speed regardless of document length. Per doc: word count, BPE
    token count, bytes-per-token, and the first 8 subwords as a
    preview. Rows-only by necessity (iterative merging is not SQL);
    the local check recomputes EVERY row with the pure-Python
    reference — exact, not a tolerance."""
    import pandas as pd

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))

    def encode_batch(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            n_words, n_bpe, preview = [], [], []
            for text in pdf["text"]:
                words = text.split()
                toks: list[str] = []
                for wd in words:
                    enc = memo.get(wd)
                    if enc is None:
                        enc = bpe_encode(wd.lower())
                        memo[wd] = enc
                    toks.extend(enc)
                n_words.append(len(words))
                n_bpe.append(len(toks))
                preview.append("|".join(toks[:8]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": pd.array(n_words, dtype="int64"),
                    "n_bpe_tokens": pd.array(n_bpe, dtype="int64"),
                    "bpe_preview": preview,
                }
            )

    return docs.mapInPandas(
        encode_batch,
        "doc_id long, n_words long, n_bpe_tokens long, bpe_preview string",
    )
