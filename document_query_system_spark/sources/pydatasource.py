"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic feed, registered with spark.dataSource.register and read
through the normal spark.read.format(...) path.

Why this exists: the reference ingests from external feeds its engine
doesn't natively speak (HTTP uploads → blob storage,
ref: src/services/document_processing/document_processing_service.py).
Spark 4's Python DataSource API is the engine-native way to wrap such
a feed as a first-class table: the source declares its schema and its
partitioning (one InputPartition per feed shard → Spark schedules one
task per shard, exactly like a Parquet split), and rows stream out of
plain Python generators Arrow-batched into the scan. This module's
feed is deterministic (pure function of the row id) so the query is
oracle-checkable; swapping the generator body for real feed I/O (an
HTTP page iterator, a queue shard) changes nothing structurally.

Scale: partitions() is the parallelism contract — a real feed returns
one partition per shard/page-range and Spark fans tasks out across
the cluster; there is no driver-side materialization anywhere (the
driver sees only the partition LIST, each executor generates/fetches
its own slice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import register

_FEED_PARTITIONS = 8
_FEED_ROWS_PER_PARTITION = 1000
# Knuth multiplicative hash constant and a prime modulus: a score
# that is deterministic, integer-exact in both engines, and spread
# uniformly enough that the aggregate is a real check.
_FEED_MULT = 2654435761
_FEED_MOD = 1000003


class FeedPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class FeedReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(
            options.get("rows_per_partition", str(_FEED_ROWS_PER_PARTITION))
        )
        self.parts = int(options.get("partitions", str(_FEED_PARTITIONS)))

    def partitions(self):
        return [
            FeedPartition(i * self.rows, (i + 1) * self.rows)
            for i in range(self.parts)
        ]

    def read(self, part: FeedPartition):
        for i in range(part.start, part.end):
            yield (i, chr(ord("a") + i % 5), (i * _FEED_MULT) % _FEED_MOD)


class SyntheticFeed(DataSource):
    """spark.read.format("synthetic_feed") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_feed"

    def schema(self) -> str:
        return "event_id BIGINT, bucket STRING, score BIGINT"

    def reader(self, schema):
        return FeedReader(self.options)


_REGISTERED: set[int] = set()


def register_feed(spark: SparkSession) -> None:
    """Idempotent per-session registration of the custom source."""
    key = id(spark.sparkContext)
    if key not in _REGISTERED:
        from ..session import ensure_worker_imports

        ensure_worker_imports(spark)  # workers unpickle classes by ref
        spark.dataSource.register(SyntheticFeed)
        _REGISTERED.add(key)


@register(
    "q_python_datasource",
    oracle=f"""
WITH feed AS (
  SELECT i AS event_id,
         chr(97 + CAST(i % 5 AS INT)) AS bucket,
         (i * {_FEED_MULT}) % {_FEED_MOD} AS score
  FROM (SELECT unnest(generate_series(0,
          {_FEED_PARTITIONS * _FEED_ROWS_PER_PARTITION - 1})) AS i)
)
SELECT bucket,
       CAST(count(*) AS BIGINT)     AS n,
       CAST(sum(score) AS BIGINT)   AS total_score,
       CAST(min(event_id) AS BIGINT) AS first_event,
       CAST(max(event_id) AS BIGINT) AS last_event
FROM feed GROUP BY bucket
""",
)
def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the custom Python DataSource end-to-end and aggregate per
    bucket — proves schema declaration, the InputPartition
    parallelism contract (8 partitions → 8 tasks), and the Python
    generator → Arrow batch → scan path. The oracle regenerates the
    identical feed arithmetically in DuckDB, so the check covers the
    full custom-source read, not just the aggregate."""
    register_feed(spark)
    df = (
        spark.read.format("synthetic_feed")
        .option("rows_per_partition", _FEED_ROWS_PER_PARTITION)
        .option("partitions", _FEED_PARTITIONS)
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum("score").alias("total_score"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )
