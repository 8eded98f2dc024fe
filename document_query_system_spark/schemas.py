"""Authoritative StructTypes for the engine's document/chunk/vector
data model (SURVEY.md §1.1) — every schema the reference declares as
a dataclass/Pydantic model, fixed here in one module.

Reference shapes: DocumentInfo (ingestion_service.py:20-31),
ExtractedDocument (document_processing_service.py:60-71), TextChunk
(:43-58), VectorMetadata (vector_engine/types.py:4-18). Schemas are
declared, never inferred: Parquet writes bind to these exactly, so
schema drift is an error at write time, not a surprise at read time
(the reference itself drifts — schemas/models.py:9 declares a
response shape main.py doesn't produce; pinning one authority here is
the fix).
"""

from __future__ import annotations

from pyspark.sql import types as T

# S1 landing row — the binaryFile-scan shape plus ingest provenance
# (ref DocumentInfo, ingestion_service.py:20-31).
DOCUMENT_RAW = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("file_name", T.StringType(), False),
        T.StructField("file_size", T.LongType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("file_hash", T.StringType()),
        T.StructField("download_ts", T.TimestampType()),
        T.StructField("is_valid", T.BooleanType()),
        T.StructField("validation_errors", T.ArrayType(T.StringType())),
        T.StructField("payload", T.BinaryType()),
    ]
)

# Extracted document header (ref ExtractedDocument,
# document_processing_service.py:60-71); chunks normalize into CHUNK
# rows instead of nesting, tables into DOC_TABLE rows.
DOCUMENT = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source_file", T.StringType()),
        T.StructField("file_type", T.StringType()),
        T.StructField("full_text", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("extraction_ts", T.TimestampType()),
    ]
)

# The engine's core row type (ref TextChunk,
# document_processing_service.py:43-58). (page_number, chunk_seq) are
# explicit because Spark has no implicit row order (SURVEY §2.6 O3).
CHUNK = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("chunk_seq", T.IntegerType(), False),
        T.StructField("chunk_type", T.StringType()),  # section|paragraph|table|...
        T.StructField("page_number", T.IntegerType()),
        T.StructField("section_title", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("word_count", T.LongType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

# Flattened table extraction (ref document_processing_service.py:
# 207-228 — {headers, rows} nested lists).
DOC_TABLE = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("table_seq", T.IntegerType(), False),
        T.StructField("headers", T.ArrayType(T.StringType())),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType()))),
    ]
)

# Vector row (ref VectorMetadata vector_engine/types.py:4-18 +
# payload pinecone_manager.py:77-81): array<float> — Parquet-native
# and SQL-operable; VectorUDT only at the MLlib boundary.
EMBEDDING = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("doc_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("chunk_type", T.StringType()),
        T.StructField("content", T.StringType()),  # truncated to 1000 chars
        T.StructField("word_count", T.LongType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)

# QA answer row — the one authoritative response schema (api.run_query).
ANSWER = T.StructType(
    [
        T.StructField("question_id", T.IntegerType(), False),
        T.StructField("question_text", T.StringType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("snippet", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("search_method", T.StringType(), False),
    ]
)
