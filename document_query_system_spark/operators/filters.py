"""Projections, filters, predicate chains (SURVEY.md §2.2).

All pure column expressions — Catalyst pushes every predicate here
into the Parquet scan, and at scale these queries are scan-bound with
zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load

MAX_FILE_SIZE = 50 * 1024 * 1024  # ref: ingestion_service.py:56


@register(
    "q_filter_isin",
    oracle="""
SELECT event_id, event_type, value
FROM events
WHERE event_type IN ('click', 'purchase')
""",
)
def q_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: membership filter — the reference's supported-MIME whitelist
    (ref: ingestion_service.py:157-177, whitelist :47-53)."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "event_type", "value")
    )


@register(
    "q_filter_range",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_quantity > 0 AND l_quantity <= 25
  AND l_discount BETWEEN 0.02 AND 0.08
""",
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: range predicate — the reference's 0 < size <= 50MB check
    (ref: ingestion_service.py:179-191)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 0)
        & (F.col("l_quantity") <= 25)
        & F.col("l_discount").between(0.02, 0.08)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "q_filter_length",
    oracle="""
SELECT doc_id, n_chars, CAST(length(text) AS BIGINT) AS text_len
FROM documents
WHERE length(text) > 300
""",
)
def q_filter_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: meaningful-paragraph length filter
    (ref: document_processing_service.py:295, 519 — keep > 50/20 chars)."""
    docs = load(spark, sf_dir, "documents")
    return docs.filter(F.length("text") > 300).select(
        "doc_id", "n_chars", F.length("text").cast("long").alias("text_len")
    )


@register(
    "q_project_truncate",
    oracle="""
SELECT doc_id,
       CASE WHEN length(text) > 500
            THEN substr(text, 1, 500) || '...'
            ELSE text END AS content_trunc,
       substr(text, 1, 100) AS preview
FROM documents
""",
)
def q_project_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: metadata projection with conditional truncation
    (ref: vectorizer.py:64 — 1000-char index payload;
    src/main.py:147 — 500-char fallback answer + '...')."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(
            F.length("text") > 500,
            F.concat(F.substring("text", 1, 500), F.lit("...")),
        )
        .otherwise(F.col("text"))
        .alias("content_trunc"),
        F.substring("text", 1, 100).alias("preview"),
    )


@register(
    "q_mime_sniff",
    oracle="""
SELECT doc_id,
       CASE WHEN substr(text, 1, 4) = 'the '            THEN 'article'
            WHEN contains(substr(text, 1, 32), 'query') THEN 'query_log'
            WHEN contains(substr(text, 1, 32), 'join')  THEN 'plan_dump'
            ELSE 'unknown' END AS sniffed_type
FROM documents
""",
)
def q_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F4: prefix magic-bytes dispatch chain, re-expressed on the
    text column (ref: ingestion_service.py:108-155 — %PDF / PK\\x03\\x04 /
    RFC-822 marker cascade as ordered WHEN chain on a binary prefix)."""
    docs = load(spark, sf_dir, "documents")
    head = F.substring("text", 1, 32)
    return docs.select(
        "doc_id",
        F.when(F.substring("text", 1, 4) == "the ", "article")
        .when(head.contains("query"), "query_log")
        .when(head.contains("join"), "plan_dump")
        .otherwise("unknown")
        .alias("sniffed_type"),
    )
