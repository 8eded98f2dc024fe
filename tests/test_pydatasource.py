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
    checkpoint replay depends on for exactly-once. Drives the REAL
    reader from stream_classes() (no Spark session needed)."""
    from document_query_system_spark.sources.pydatasource import stream_classes

    FeedStreamReader, _ = stream_classes()
    # The registered QUERY runs one 500-row batch (fixed micro-batch
    # cost, r9 verdict #4); the multi-batch contract is pinned HERE by
    # driving the real reader with a smaller batch_rows option.
    reader = FeedStreamReader({"batch_rows": "100"})

    served = []
    offsets = [reader.initialOffset()]
    while True:
        rows, nxt = reader.read(offsets[-1])
        rows = list(rows)
        if not rows:
            assert nxt == offsets[-1], "fixpoint must not advance"
            break
        served.append((offsets[-1], nxt, rows))
        offsets.append(nxt)
    flat = [r for _, _, b in served for r in b]
    assert len(flat) == _STREAM_MAX_ROWS
    assert len(served) == _STREAM_MAX_ROWS // 100
    # The registered query's default config is a SINGLE batch.
    assert _STREAM_MAX_ROWS // _STREAM_BATCH_ROWS == 1
    # Every served batch must replay identically from its offsets...
    for start, end, rows in served:
        assert list(reader.readBetweenOffsets(start, end)) == rows
    # ...including ranges SPANNING multiple original batches (a
    # restart can replay several committed batches in one call).
    assert (
        list(reader.readBetweenOffsets(offsets[0], offsets[-1])) == flat
    )
    mid = {"pos": 150}
    assert list(reader.readBetweenOffsets(mid, {"pos": 420})) == flat[150:420]
    # Deterministic content spot-check against the shared arithmetic.
    assert flat[17] == (17, "c", (17 * _FEED_MULT) % _FEED_MOD)
    # Batches tile the feed with no gaps or overlaps.
    assert offsets[0]["pos"] == 0 and offsets[-1]["pos"] == _STREAM_MAX_ROWS
    assert all(
        a["pos"] < b["pos"] for a, b in zip(offsets, offsets[1:])
    )


def test_register_feed_unconditional_and_sibling_behavior(spark):
    """Two pins on the r8 ADVICE fix (no applicationId memo):

    1. Same-session re-registration is safe — register_feed twice on
       the session that owns the source, reads still work (the memo
       removal must not have made repeat calls throw).
    2. The VERIFIED engine limitation on newSession() siblings
       (Spark 4.1.2: a sibling can neither re-register a name another
       session registered — JVM-wide exists-check — nor resolve it —
       per-session lookup) surfaces as register_feed's one CLEAR
       RuntimeError, never as a mystery DATA_SOURCE_NOT_FOUND at
       read time."""
    register_feed(spark)
    register_feed(spark)  # idempotent on the owning session
    df = (
        spark.read.format("synthetic_feed")
        .option("rows_per_partition", 5)
        .option("partitions", 2)
        .load()
    )
    assert df.count() == 10

    import pytest

    sibling = spark.newSession()
    with pytest.raises(RuntimeError, match="cloneSession"):
        register_feed(sibling)


def test_pstream_reader_partition_contract():
    """Partition-based stream reader (the executor-side scale twin):
    latestOffset plans one batch-range per micro-batch up to the
    fixpoint; partitions(start, end) ceil-splits the range into the
    configured shard count (each read(partition) runs on an executor);
    the shards tile each batch exactly — no gap, no overlap."""
    from document_query_system_spark.sources.pydatasource import (
        _PSTREAM_BATCH_ROWS,
        _PSTREAM_MAX_ROWS,
        _PSTREAM_PARTS,
        pstream_classes,
    )

    Reader, _ = pstream_classes()
    # The registered query admits the whole feed in ONE batch (fixed
    # micro-batch cost, r9 verdict #4); drive the multi-batch offset
    # advance here with an explicit half-feed batch_rows.
    half = _PSTREAM_MAX_ROWS // 2
    r = Reader({"batch_rows": str(half)})
    o0 = r.initialOffset()
    assert o0 == {"pos": 0}
    o1, o2, o3 = r.latestOffset(), r.latestOffset(), r.latestOffset()
    assert o1 == {"pos": half}
    assert o2 == {"pos": _PSTREAM_MAX_ROWS}
    assert o3 == {"pos": _PSTREAM_MAX_ROWS}, "fixpoint must not advance"

    all_rows = []
    for start, end in ((o0, o1), (o1, o2)):
        parts = r.partitions(start, end)
        assert len(parts) == _PSTREAM_PARTS
        spans = [(p.start, p.end) for p in parts]
        # shards tile [start, end) exactly
        assert spans[0][0] == start["pos"] and spans[-1][1] == end["pos"]
        assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
        for p in parts:
            all_rows.extend(r.read(p))
    assert [row[0] for row in all_rows] == list(range(_PSTREAM_MAX_ROWS))
    assert all_rows[17] == (17, "c", (17 * _FEED_MULT) % _FEED_MOD)
    # An empty batch (restart race: head <= committed) plans one no-op
    # partition, never a negative range.
    (empty,) = r.partitions(o2, o3)
    assert (empty.start, empty.end) == (o2["pos"], o3["pos"])
    assert list(r.read(empty)) == []
    # The registered query's default config is a SINGLE batch.
    assert _PSTREAM_MAX_ROWS // _PSTREAM_BATCH_ROWS == 1


def test_pstream_restarted_reader_never_reports_behind_committed():
    """The in-memory head cursor is not checkpoint-recovered (r9
    ADVICE): a restarted reader's _pos starts at 0 while Spark replays
    committed offset ranges through partitions(start, end). The reader
    must clamp its cursor forward to every planned range, so the next
    latestOffset() is never BEHIND the committed offset (which would
    burn empty catch-up micro-batches)."""
    from document_query_system_spark.sources.pydatasource import (
        _PSTREAM_MAX_ROWS,
        pstream_classes,
    )

    Reader, _ = pstream_classes()
    restarted = Reader({"batch_rows": "100"})
    # Simulate restart replay: Spark hands the committed range first.
    committed = {"pos": 400}
    restarted.partitions({"pos": 250}, committed)
    nxt = restarted.latestOffset()
    assert nxt["pos"] >= committed["pos"], nxt
    assert nxt["pos"] <= _PSTREAM_MAX_ROWS
    # Clean-commit restart (nothing to replay): the fresh reader's
    # first latestOffset precedes any replay, so Spark plans
    # (committed, fresh_hi) with fresh_hi BEHIND committed — the
    # no-op-partition guard keeps it correct, and the clamp must
    # take the committed START bound so the next head is at or past
    # it (one catch-up call, not ceil(committed/batch) empty rounds).
    r2 = Reader({"batch_rows": "100"})
    first_head = r2.latestOffset()
    assert first_head == {"pos": 100}
    (noop,) = r2.partitions({"pos": 400}, first_head)
    assert list(r2.read(noop)) == []
    assert r2.latestOffset()["pos"] >= 400


def test_pstream_cursor_path_makes_head_monotonic_across_restart(tmp_path):
    """With cursor_path set, the head cursor is PERSISTENT (r10
    ADVICE): a fresh reader after a cleanly committed checkpoint
    resumes from the persisted head, so its very first latestOffset()
    — called before any partitions() replay — is already at or past
    the committed offset. Without it, that first call reports behind
    the commit, Spark records the regressed batch end, and the next
    batch re-reads [regressed_end, committed) (the documented
    in-memory-cursor limitation)."""
    from document_query_system_spark.sources.pydatasource import (
        pstream_classes,
    )

    Reader, _ = pstream_classes()
    cursor = str(tmp_path / "deep" / "feed.cursor")
    opts = {"batch_rows": "100", "max_rows": "600", "cursor_path": cursor}
    r1 = Reader(opts)
    committed = None
    for _ in range(4):  # 4 clean batches → committed head 400
        committed = r1.latestOffset()
    assert committed == {"pos": 400}
    # Clean-commit restart: a brand-new reader (fresh process in real
    # deployments) with the same options.
    r2 = Reader(opts)
    first_head = r2.latestOffset()
    assert first_head["pos"] >= committed["pos"], first_head
    # ... and it still advances toward the fixpoint, capped at max.
    assert r2.latestOffset()["pos"] == 600
    assert r2.latestOffset()["pos"] == 600
    # Without cursor_path the same restart regresses (the documented
    # double-read window this option exists to close).
    r3 = Reader({"batch_rows": "100", "max_rows": "600"})
    assert r3.latestOffset()["pos"] < committed["pos"]


def test_register_source_connect_style_reraises_engine_error():
    """On an engine without the private _jsparkSession probe (Spark
    Connect, or a future relocation of dataSourceManager), a
    DATA_SOURCE_ALREADY_EXISTS registration failure must surface as
    the ORIGINAL AnalysisException — never the probe's own
    AttributeError (r9 ADVICE / r10 verdict #5). Pure-unit: a fake
    session whose register raises ALREADY_EXISTS and which has no
    _jsparkSession at all."""
    import pytest
    from pyspark.errors import AnalysisException

    from document_query_system_spark.sources.pydatasource import (
        SyntheticFeed,
        _register_source,
    )

    class FakeDataSourceReg:
        def register(self, cls):
            raise AnalysisException(
                "[DATA_SOURCE_ALREADY_EXISTS] Data source "
                f"'{cls.name()}' already exists."
            )

    class FakeConnectSession:
        dataSource = FakeDataSourceReg()
        # no _jsparkSession attribute at all

    with pytest.raises(AnalysisException, match="DATA_SOURCE_ALREADY_EXISTS"):
        _register_source(FakeConnectSession(), SyntheticFeed)


def test_available_now_python_source_single_batch_fallback(spark):
    """Pin the ENGINE behavior the availableNow stream drives rely on
    (r15 ADVICE): PythonMicroBatchStream does not implement
    SupportsTriggerAvailableNow, so Trigger.AvailableNow falls back to
    single-batch execution — one micro-batch spanning initialOffset →
    the prefetching wrapper's first read() head, i.e. exactly the
    FIRST batch for a simple reader — then self-terminates. Drive a
    deliberately MULTI-batch feed (batch_rows < max_rows) and assert
    only the first batch arrives. If an engine upgrade adds real
    availableNow planning for Python sources (draining EVERY pending
    batch before terminating), this pin fails and the registered
    queries' single-batch reasoning must be re-derived — their results
    stay correct either way (their feeds are one batch by construction
    and _run_available_now's under-delivery check refuses short reads),
    but the documented engine contract would have changed."""
    from document_query_system_spark.sources.pydatasource import (
        register_feed_stream,
    )

    register_feed_stream(spark)
    sdf = (
        spark.readStream.format("synthetic_feed_stream")
        .option("batch_rows", 100)
        .option("max_rows", 300)
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("pyfeed_availablenow_pin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120), (
            "availableNow drive did not self-terminate within 120 s"
        )
    finally:
        q.stop()
    got = spark.table("pyfeed_availablenow_pin").count()
    assert got == 100, (
        f"single-batch availableNow fallback served {got} rows of a "
        "300-row/3-batch feed; 100 (the first batch) pins the current "
        "non-SupportsTriggerAvailableNow fallback — a different count "
        "means the engine's availableNow planning for Python sources "
        "changed"
    )
