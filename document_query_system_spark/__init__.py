"""document_query_system_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine with the query and data-processing
capabilities of the reference RAG document-QA system
(HackRX60/Document-Query-System, surveyed in SURVEY.md): document
ingestion/chunking/embedding as batch DataFrame pipelines, keyword and
vector top-k search as declarative queries, plus the full relational
surface (joins, aggregations, windows, set ops, scalar functions,
streaming) and large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Design principles (SURVEY.md §7):
- DataFrame/SQL first; Catalyst/Tungsten pick the physical plan.
- No row-at-a-time Python in the hot path; Pandas UDFs only where
  built-ins genuinely cannot express the semantics.
- Every operator ships with a DuckDB-oracle SQL equivalent where
  ANSI-SQL-expressible (driver correctness gate).
"""

__version__ = "0.1.0"
