"""Composed corpus-refresh recipe — the operators proven one-by-one
elsewhere (exact dedup, quality filtering, per-domain token budget)
chained as ONE declarative plan, the way a pretraining data refresh
actually runs them. The point of the query is composition: each stage
is a plain DataFrame transform, so Catalyst fuses the chain (the
quality rules evaluate inside the dedup window's exchange, column
pruning drops `text` the moment token counts are computed) — no
materialization between stages.

Stage order matches production practice: dedup BEFORE quality (a
duplicate should not vote on quality thresholds), quality BEFORE the
budget cut (the budget should buy clean tokens only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import tokens, tokens_sql
from ..registry import register
from ..sources.tables import load

_MIN_TOKENS = 30
_LANG_TOKEN_BUDGET = 50_000


_REFRESH_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, text, md5(text) AS h,
         len({tokens_sql('text')}) AS n_tokens
  FROM documents
),
dedup AS (
  SELECT * FROM (
    SELECT t.*, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM t)
  WHERE rn = 1
),
clean AS (
  SELECT doc_id, lang, n_tokens FROM dedup
  WHERE n_tokens >= {_MIN_TOKENS} AND list_contains({tokens_sql('text')}, 'the')
),
budget AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM clean
)
-- CASTs: DuckDB sum(BIGINT) is HUGEINT, which the driver's pandas
-- value hash renders as float64 vs Spark's int64 (r6 verdict #1).
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(cum_tokens) AS BIGINT) AS budget_used
FROM budget WHERE cum_tokens <= {_LANG_TOKEN_BUDGET}
GROUP BY lang
"""


@register("q_corpus_refresh", oracle=_REFRESH_SQL)
def q_corpus_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus refresh in one plan: exact dedup
    (keep-lowest per content hash) → quality gate (≥30 tokens, has a
    stopword) → per-language token budget in deterministic md5 order
    → per-language rollup of what survived.

    Plan: two windows (content-hash dedup, per-lang running budget)
    and one tiny aggregate — TWO exchanges end to end for the whole
    recipe (the rollup reuses the budget window's lang partitioning),
    with every stage a streamed transform in between. At
    100 TB each stage keeps the shape its standalone query proved
    (q_dedup_hash, q_quality_filter_chain, q_token_budget_cap); the
    composition adds nothing but plan fusion."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    t = docs.select(
        "doc_id",
        "lang",
        "text",
        F.md5("text").alias("h"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    wd = Window.partitionBy("h").orderBy("doc_id")
    dedup = t.withColumn("rn", F.row_number().over(wd)).filter(F.col("rn") == 1)
    clean = dedup.filter(
        (F.col("n_tokens") >= _MIN_TOKENS)
        & F.array_contains(tokens(F.col("text")), "the")
    ).select("doc_id", "lang", "n_tokens")
    wb = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = clean.withColumn("cum_tokens", F.sum("n_tokens").over(wb))
    return (
        budget.filter(F.col("cum_tokens") <= _LANG_TOKEN_BUDGET)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("cum_tokens").alias("budget_used"),
        )
    )
