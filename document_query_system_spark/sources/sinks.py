"""Sinks and write-shaped operators (SURVEY.md §2.1 S7/S8).

The reference's Pinecone upsert (ref: pinecone_manager.py:61-103,
batches of 100) becomes last-writer-wins dedup over a keyed table —
a window rewrite on plain Parquet (Delta MERGE where available).
Its JSON serializer (ref: document_processing_service.py:752-781)
becomes ``to_json(struct(...))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .tables import load


@register(
    "q_to_json",
    oracle="""
SELECT doc_id,
       to_json(struct_pack(doc_id := doc_id, lang := lang, n_chars := n_chars)) AS doc_json
FROM documents
""",
)
def q_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: row → JSON document serialization
    (ref: document_processing_service.py:752-781)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("doc_json"),
    )


@register(
    "q_upsert_last_writer",
    oracle="""
SELECT user_id, event_type, event_id, value
FROM (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def q_upsert_last_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: upsert = last-writer-wins by key. The reference upserts
    vectors by chunk_id (ref: pinecone_manager.py:77-86); here the
    keyed stream is events keyed by (user_id, event_type), latest ts
    wins. One shuffle on the key — the same window rewrite implements
    idempotent re-ingestion at any scale."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


@register(
    "q_incremental_index",
    oracle="""
WITH todo AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id NOT IN (SELECT vec_id FROM embeddings)
)
SELECT CAST(count(*) AS BIGINT)   AS docs_to_embed,
       CAST(min(doc_id) AS BIGINT) AS first_new,
       CAST(max(doc_id) AS BIGINT) AS last_new
FROM todo
""",
)
def q_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase-5 incremental indexing: anti-join the corpus against the
    already-indexed id set so only NEW documents pay extraction +
    embedding (the cluster form of the reference's content-hash cache
    hit, ref: ingestion_service.py:294-299). The anti-join is a
    broadcast of the indexed-id projection at any realistic index/
    corpus ratio; the embed stage downstream then runs on the delta
    only."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    indexed = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id")
    )
    todo = docs.join(F.broadcast(indexed), "doc_id", "left_anti")
    return todo.agg(
        F.count("*").alias("docs_to_embed"),
        F.min("doc_id").alias("first_new"),
        F.max("doc_id").alias("last_new"),
    )


def upsert_parquet(
    spark: SparkSession, updates: DataFrame, path: str, key: str, order_col: str
) -> None:
    """Library helper: merge ``updates`` into the Parquet table at
    ``path`` with last-writer-wins semantics on ``key`` (S8). On a
    cluster this is a Delta/Iceberg MERGE; on plain Parquet we
    union + window-dedup + atomic overwrite."""
    try:
        current = spark.read.parquet(path)
        unioned = current.unionByName(updates)
    except Exception:
        unioned = updates
    w = Window.partitionBy(key).orderBy(F.desc(order_col))
    deduped = (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # Materialize before overwrite (reading and overwriting the same
    # path in one job would race); localCheckpoint keeps it in memory.
    deduped.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
