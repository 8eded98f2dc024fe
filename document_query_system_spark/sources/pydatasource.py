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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..registry import register


def _register_source(spark: SparkSession, cls) -> None:
    """Register ``cls`` on THIS session; same-session re-registration
    silently replaces (runtime layer), so unconditional calls are safe
    — the r8 ADVICE fix (a memo keyed on applicationId skipped
    registration for brand-new sessions).

    VERIFIED ENGINE LIMITATION (r9, Spark 4.1.2): once ANY session in
    the JVM has registered a Python data source name, a
    spark.newSession() SIBLING can neither re-register it
    (DATA_SOURCE_ALREADY_EXISTS from a JVM-wide exists-check) nor
    resolve it (DATA_SOURCE_NOT_FOUND from the per-session lookup) —
    the two checks consult different layers. Measured directly:
    sibling dataSourceExists()=False while registerPython throws
    ALREADY_EXISTS. Nothing a library can do makes the sibling read
    work, so this surfaces the condition as one clear error at
    registration time instead of a mystery NOT_FOUND at read time.
    Use the session that first registered the source (or cloneSession,
    which copies session state)."""
    from pyspark.errors import AnalysisException

    try:
        spark.dataSource.register(cls)
    except AnalysisException as exc:
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(exc):
            raise
        try:
            # Private-JVM-internals probe: distinguishes "this session
            # already owns the source" (benign) from the sibling
            # limitation above. On Spark Connect (no _jsparkSession) or
            # a future engine that moves dataSourceManager, the probe
            # itself fails — re-raise the ORIGINAL AnalysisException
            # then, so registration failures always surface with the
            # engine's own message (r9 ADVICE).
            dsm = spark._jsparkSession.sessionState().dataSourceManager()
            session_has_it = bool(dsm.dataSourceExists(cls.name()))
        except Exception:
            raise exc from None
        if not session_has_it:
            raise RuntimeError(
                f"Python data source {cls.name()!r} was registered by a "
                "different session in this JVM; this session (a "
                "newSession() sibling) can neither re-register nor "
                "resolve it on this engine version — run the read on "
                "the registering session, or derive sessions with "
                "cloneSession() so registrations copy over."
            ) from exc


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


def register_feed(spark: SparkSession) -> None:
    """Register the custom source on THIS session, unconditionally:
    spark.dataSource.register is SparkSession-scoped, so any memo
    keyed on applicationId would skip a brand-new session with the
    same app id (r8 ADVICE). Registration is a cheap runtime-layer
    put; see _register_source for the verified newSession-sibling
    engine limitation it surfaces. ensure_worker_imports memoizes
    itself per SparkContext."""
    from ..session import ensure_worker_imports

    ensure_worker_imports(spark)  # workers unpickle classes by ref
    _register_source(spark, SyntheticFeed)


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


# ------------------------------------------------ streaming variant
#
# The same feed as an unbounded STREAM source: SimpleDataSourceStream-
# Reader serves the feed in offset-tracked micro-batches — initial
# offset, read(start) -> (rows, next_offset), and readBetweenOffsets
# for exactly-once replay after a failure (the contract a real queue/
# log wrapper implements; Spark persists the offsets in the streaming
# checkpoint). The feed is finite (_STREAM_MAX_ROWS) so the query has
# a deterministic fixpoint the oracle can check.
#
# SCALE CAVEAT (by Spark-4 API design): SimpleDataSourceStreamReader's
# read(start) runs ON THE DRIVER — every row funnels through the
# driver-side Python runner before being shipped to executors. That is
# the documented low-volume variant (control streams, small change
# feeds). A high-volume feed must use the partition-based
# DataSourceStreamReader below (pstream_classes): the driver plans
# only OFFSETS; executors read their own partitions.
#
# ONE batch of 500, not two of 250 (r9 verdict #4, after r8's 5→2):
# per-micro-batch overhead (offset planning + runner round-trip + sink
# commit) dominates a demo-sized feed and is pure fixed cost on a slow
# box — the driver artifact measured 4.49 s where the plan itself is
# milliseconds. A single batch still exercises initialOffset → read →
# fixpoint; multi-batch offset advance and replay SPANS are pinned by
# tests/test_pydatasource.py driving the real reader directly with
# small batch_rows (the contract is option-driven, not constant-
# driven).

_STREAM_BATCH_ROWS = 500
_STREAM_MAX_ROWS = 500


def stream_classes():
    """Build (FeedStreamReader, SyntheticFeedStream). The classes are
    defined INSIDE a function on purpose: Spark runs the streaming
    source's planning loop in a separate driver-side Python process
    that does NOT see sc.addPyFile includes (unlike executor workers,
    which resolved the batch source's module import fine) —
    cloudpickle serializes function-scoped classes BY VALUE, so the
    runner needs no import of this package at all. A real connector
    shipped as a library would instead install itself on the runner's
    PYTHONPATH; by-value pickling is the zero-deploy form. Exposed as
    a factory (rather than closures inside register_feed_stream) so
    tests drive the REAL reader's offset/replay contract directly."""
    mult, mod = _FEED_MULT, _FEED_MOD
    batch_default, max_default = _STREAM_BATCH_ROWS, _STREAM_MAX_ROWS

    def gen(lo: int, hi: int):
        return iter(
            [(i, chr(ord("a") + i % 5), (i * mult) % mod) for i in range(lo, hi)]
        )

    class FeedStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.batch = int(options.get("batch_rows", str(batch_default)))
            self.max_rows = int(options.get("max_rows", str(max_default)))

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            if pos >= self.max_rows:
                return iter([]), {"pos": pos}
            end = min(pos + self.batch, self.max_rows)
            return gen(pos, end), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return gen(start["pos"], end["pos"])

    class SyntheticFeedStream(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_feed_stream"

        def schema(self) -> str:
            return "event_id BIGINT, bucket STRING, score BIGINT"

        def simpleStreamReader(self, schema):
            return FeedStreamReader(self.options)

    return FeedStreamReader, SyntheticFeedStream


def register_feed_stream(spark: SparkSession) -> None:
    """Session-scoped registration, unconditional (see register_feed:
    a memo keyed on applicationId would skip a spark.newSession()
    sibling, whose source registry starts empty)."""
    _, SyntheticFeedStream = stream_classes()
    _register_source(spark, SyntheticFeedStream)


@register(
    "q_stream_python_source",
    oracle=f"""
WITH feed AS (
  SELECT i AS event_id,
         chr(97 + CAST(i % 5 AS INT)) AS bucket,
         (i * {_FEED_MULT}) % {_FEED_MOD} AS score
  FROM (SELECT unnest(generate_series(0, {_STREAM_MAX_ROWS - 1})) AS i)
)
SELECT bucket,
       CAST(count(*) AS BIGINT)   AS n,
       CAST(sum(score) AS BIGINT) AS total_score
FROM feed GROUP BY bucket
""",
)
def q_stream_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python STREAM source driven to its fixpoint: one
    offset-tracked 500-row micro-batch into a complete-mode
    memory aggregate (multi-batch offset advance + replay spans are
    pinned by tests driving the reader directly — the micro-batch
    count here is fixed cost, not coverage). Exercises initialOffset /
    read / readBetweenOffsets — the exactly-once replay contract a
    real queue or log wrapper implements.

    Driven with trigger(availableNow=True) (r15 opt pass): for a
    Python simple stream reader availableNow snapshots exactly the
    FIRST batch, and this feed IS one batch by construction
    (batch_rows == max_rows — asserted below so a constant change
    cannot silently under-read), so the self-terminating trigger
    replaces the former processingTime(10ms) + poll-the-sink + stop()
    drive loop: same 500 rows into the same complete-mode aggregate,
    minus ~2-3 s of polling jobs and stop negotiation per run
    (measured 5.6 → 2.3 s steady). The poll-to-fixpoint drive remains
    the right shape for a feed whose head keeps moving; tests drive
    the reader's multi-batch offset contract directly.

    SCALE CAVEAT: the simple reader reads rows ON THE DRIVER (Spark-4
    API design — the documented low-volume variant); the executor-side
    shape for a real high-volume feed is
    q_stream_python_source_partitioned below."""
    assert _STREAM_BATCH_ROWS >= _STREAM_MAX_ROWS, (
        "availableNow snapshots only the FIRST batch of a Python "
        "simple stream reader; a multi-batch feed needs the "
        "poll-to-fixpoint drive"
    )
    register_feed_stream(spark)
    sdf = (
        spark.readStream.format("synthetic_feed_stream")
        .option("batch_rows", _STREAM_BATCH_ROWS)
        .option("max_rows", _STREAM_MAX_ROWS)
        .load()
    )
    agg = sdf.groupBy("bucket").agg(
        F.count("*").alias("n"), F.sum("score").alias("total_score")
    )
    return _run_available_now(
        spark, agg, "pyfeed_stream_sink", _STREAM_MAX_ROWS
    )


_STREAM_STATE_PARTITIONS = 4


def _run_available_now(spark, agg, name: str, expected_rows: int):
    """Run the complete-mode memory sink under trigger(availableNow):
    the stream plans every batch available at start, processes them,
    and TERMINATES ITSELF — no sink polling, no stop() negotiation
    (the pre-r15 drive loop polled the memory table every 50 ms under
    a processingTime trigger and then negotiated stop(); on a
    single-batch feed that was ~2-3 s of pure fixed cost per run).
    Fails loud on stream exception or a 120 s stall, and — like the
    drive loop it replaced — never returns a partial table: after
    termination ONE bounded check verifies the aggregate accounts for
    every feed row (``expected_rows``), so a reader that under-delivers
    at runtime (reader bug, engine-version change in availableNow
    snapshot semantics) raises instead of silently shipping a short
    aggregate. The module-constant asserts at the call sites guard
    only the single-batch PRECONDITION and vanish under ``python -O``;
    this check guards the runtime OUTCOME and does not.

    ENGINE-CONTRACT NOTE (r15 ADVICE): the snapshot-first-batch
    behavior is not an availableNow API promise — PythonMicroBatchStream
    does not implement SupportsTriggerAvailableNow, so the engine takes
    its documented FALLBACK ("source does not support
    Trigger.AvailableNow. Falling back to single batch execution") and
    plans exactly one batch. An engine upgrade that adds real
    availableNow planning for Python sources would process EVERY
    pending batch instead — MORE rows, never fewer, so the
    under-delivery check above still holds and results stay correct;
    tests/test_pydatasource.py pins the single-batch fallback so the
    semantic change is surfaced, not silent.

    The streaming aggregate's STATE partition count is scoped to 4 for
    the stream's lifetime (saved/restored around start): state-store
    partitioning is locked per query at first start and is a per-job
    deployment sizing decision — the session's 32 scan-sized shuffle
    partitions would run 6× empty state tasks per micro-batch for a
    5-key aggregate, pure stage-latency overhead (measured ~2× on the
    former fixpoint drive). Batch queries are unaffected: the conf is
    restored before this returns."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_STREAM_STATE_PARTITIONS)
    )
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        # Restore immediately: the partition count is captured at
        # stream start; nothing later reads the conf.
        spark.conf.set("spark.sql.shuffle.partitions", old)
    try:
        # awaitTermination re-raises a failed stream's exception;
        # False return = still running at the deadline.
        if not q.awaitTermination(120):
            raise TimeoutError(
                f"feed stream {name!r} did not terminate within the "
                "120 s deadline under availableNow"
            )
    finally:
        q.stop()
    got = spark.sql(f"SELECT coalesce(sum(n), 0) FROM {name}").first()[0]
    if got < expected_rows:
        raise RuntimeError(
            f"feed stream {name!r} under-delivered: the terminated "
            f"availableNow run aggregated {got}/{expected_rows} rows — "
            "partial table refused"
        )
    return spark.table(name)


# --------------------------------- partitioned streaming variant
#
# The executor-side twin (r8 verdict #3): DataSourceStreamReader plans
# OFFSET RANGES on the driver (initialOffset/latestOffset — cheap
# metadata, like Kafka's "what's the head offset?") and splits each
# micro-batch into InputPartitions whose read(partition) runs ON
# EXECUTORS — the shape a real 100 TB queue/log wrapper needs: row
# bytes never transit the driver, and per-batch parallelism is the
# partition count (one task per shard, like a Parquet split).
# Reference analog: the ingestion fan-out at ingestion_service.py:
# 376-416 (N workers each pulling its own shard of the upload batch).

_PSTREAM_BATCH_ROWS = 600  # rows ADMITTED per micro-batch (driver plan)
_PSTREAM_MAX_ROWS = 600  # one batch: fixed micro-batch cost, see above
_PSTREAM_PARTS = 4  # InputPartitions per micro-batch (executor tasks)


def pstream_classes():
    """Build (PartitionedFeedStreamReader, SyntheticFeedPStream).
    Function-scoped for the same by-value-pickling reason as
    stream_classes: the streaming plan runner is a separate driver-side
    Python process that does not see sc.addPyFile. Exposed as a factory
    so tests drive the real reader's offset/partition contract
    directly."""
    mult, mod = _FEED_MULT, _FEED_MOD
    batch_default, max_default = _PSTREAM_BATCH_ROWS, _PSTREAM_MAX_ROWS
    parts_default = _PSTREAM_PARTS

    class RangePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class PartitionedFeedStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.batch = int(options.get("batch_rows", str(batch_default)))
            self.max_rows = int(options.get("max_rows", str(max_default)))
            self.parts = int(options.get("partitions", str(parts_default)))
            # Head-offset cursor (see latestOffset). With cursor_path
            # set, the head is RECOVERABLE: a fresh reader resumes
            # from the last persisted head instead of 0, so
            # latestOffset never reports behind an offset a previous
            # incarnation already planned (r10 ADVICE — a real
            # queue/log wrapper gets this for free because the
            # external system's head offset IS persistent; the
            # synthetic feed must persist its own). The cursor file's
            # lifecycle is tied to the CHECKPOINT's: deleting the
            # checkpoint but keeping a stale cursor makes the first
            # micro-batch span (0, stale_head+batch] — exactly like
            # restarting a fresh subscription against a real queue
            # whose head has moved on; delete both together to replay
            # the paced arrival sequence. OWNERSHIP: a cursor_path
            # belongs to exactly ONE streaming query, like the
            # checkpointLocation it mirrors — the file carries no
            # lock or owner id, so two concurrent streams (or a
            # second run of the same query) sharing one path would
            # interleave _persist_head() writes and silently skew
            # each other's paced arrival sequence (r11 ADVICE); point
            # each query at its own path, co-located with its own
            # checkpoint.
            self._cursor_path = options.get("cursor_path") or None
            self._pos = 0
            if self._cursor_path and os.path.exists(self._cursor_path):
                with open(self._cursor_path) as f:
                    self._pos = int(f.read().strip() or 0)

        def _persist_head(self):
            if not self._cursor_path:
                return
            tmp = self._cursor_path + ".tmp"
            parent = os.path.dirname(self._cursor_path)
            if parent:  # bare filename -> cwd, nothing to create
                os.makedirs(parent, exist_ok=True)
            with open(tmp, "w") as f:
                f.write(str(self._pos))
            os.replace(tmp, self._cursor_path)

        def initialOffset(self):
            return {"pos": 0}

        def latestOffset(self):
            # A real wrapper asks the external system for its head
            # offset; this synthetic feed "arrives" one batch per
            # micro-batch, capped at the fixpoint. The head is
            # persisted BEFORE the batch runs (a died-then-restarted
            # stream replays the uncommitted range via
            # partitions(start, end) from Spark's own offset WAL; the
            # feed is range-replayable, so nothing is lost or
            # duplicated). WITHOUT cursor_path the cursor is
            # in-memory only, and a restart from a CLEANLY COMMITTED
            # checkpoint mid-feed double-reads: the fresh reader's
            # first latestOffset() (called before any partitions()
            # replay) reports a head behind the committed offset,
            # Spark commits that regressed end, and the next batch
            # re-reads [regressed_end, committed) into the stateful
            # aggregate. The partitions() forward-clamp below narrows
            # the window to that one regressed commit but cannot
            # close it — only a persistent head (cursor_path, or a
            # real external system) can, which is why the option
            # exists.
            self._pos = min(self._pos + self.batch, self.max_rows)
            self._persist_head()
            return {"pos": self._pos}

        def partitions(self, start, end):
            lo, hi = start["pos"], end["pos"]
            # Restart catch-up: never let the in-memory head cursor
            # report behind an offset Spark has already planned
            # (latestOffset docstring). BOTH bounds clamp: after a
            # clean commit (nothing to replay) the first planned range
            # can be (committed_lo, fresh_hi) with fresh_hi <
            # committed_lo — clamping on hi alone would still burn
            # ceil(lo/batch) empty catch-up rounds (r10 review).
            self._pos = max(self._pos, lo, hi)
            if hi <= lo:  # empty batch (restart races) — one no-op task
                return [RangePartition(lo, lo)]
            step = -(-(hi - lo) // self.parts)  # ceil-split the range
            return [
                RangePartition(a, min(a + step, hi))
                for a in range(lo, hi, step)
            ]

        def read(self, partition):  # EXECUTOR-side: the scale property
            for i in range(partition.start, partition.end):
                yield (i, chr(ord("a") + i % 5), (i * mult) % mod)

        def commit(self, end):
            pass  # nothing to release: the feed is arithmetic

    class SyntheticFeedPStream(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_feed_pstream"

        def schema(self) -> str:
            return "event_id BIGINT, bucket STRING, score BIGINT"

        def streamReader(self, schema):
            return PartitionedFeedStreamReader(self.options)

    return PartitionedFeedStreamReader, SyntheticFeedPStream


def register_feed_pstream(spark: SparkSession) -> None:
    """Session-scoped registration, unconditional (see register_feed)."""
    _, SyntheticFeedPStream = pstream_classes()
    _register_source(spark, SyntheticFeedPStream)


@register(
    "q_stream_python_source_partitioned",
    oracle=f"""
WITH feed AS (
  SELECT i AS event_id,
         chr(97 + CAST(i % 5 AS INT)) AS bucket,
         (i * {_FEED_MULT}) % {_FEED_MOD} AS score
  FROM (SELECT unnest(generate_series(0, {_PSTREAM_MAX_ROWS - 1})) AS i)
)
SELECT bucket,
       CAST(count(*) AS BIGINT)   AS n,
       CAST(sum(score) AS BIGINT) AS total_score,
       CAST(min(event_id) AS BIGINT) AS first_event,
       CAST(max(event_id) AS BIGINT) AS last_event
FROM feed GROUP BY bucket
""",
)
def q_stream_python_source_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PARTITION-BASED Python stream source driven to its
    fixpoint: one 600-row micro-batch split into 4
    InputPartitions read executor-side, into a complete-mode memory
    aggregate — the high-volume twin of q_stream_python_source (whose
    simple reader reads on the driver by API design). The driver plans
    only offset ranges; row generation/fetch happens in executor
    tasks, so throughput scales with the partition count — the shape a
    real queue/log wrapper at 100 TB needs. min/max event_id in the
    aggregate prove no range was dropped or double-read across the
    batch splits (exactly-once across partitions)."""
    register_feed_pstream(spark)
    sdf = (
        spark.readStream.format("synthetic_feed_pstream")
        .option("batch_rows", _PSTREAM_BATCH_ROWS)
        .option("max_rows", _PSTREAM_MAX_ROWS)
        .option("partitions", _PSTREAM_PARTS)
        .load()
    )
    agg = sdf.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum("score").alias("total_score"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )
    # availableNow (r15 opt pass, see q_stream_python_source): the
    # wrapper calls latestOffset once at start — one 600-row batch IS
    # the whole feed (batch_rows == max_rows, asserted) — then the
    # stream terminates itself; the poll + stop() drive loop's fixed
    # cost is gone. Multi-batch offset planning, restart catch-up and
    # the cursor contract stay pinned by tests driving the reader.
    assert _PSTREAM_BATCH_ROWS >= _PSTREAM_MAX_ROWS, (
        "availableNow plans one latestOffset() head snapshot; a "
        "multi-batch feed needs the poll-to-fixpoint drive"
    )
    return _run_available_now(
        spark, agg, "pyfeed_pstream_sink", _PSTREAM_MAX_ROWS
    )
