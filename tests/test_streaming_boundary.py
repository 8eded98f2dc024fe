"""Session-window watermark boundary semantics (r5 ADVICE item 2).

q_stream_session's oracle models the append-mode holdback as
``last_ts + gap <= max(ts) - delay`` — an INCLUSIVE comparison at the
watermark. The advisor flagged that if Spark's state eviction were
strict at the boundary, a session ending exactly at the final
watermark would diverge. This fixture constructs that exact tie and
pins the observed Spark behavior: the tied session IS emitted, i.e.
eviction is ``session_end <= watermark``, matching the oracle. If a
Spark upgrade flips this comparison, this test fails before the
driver's correctness gate does.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tie_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wm_tie"))
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def us(t):
        return int(t.timestamp() * 1_000_000)

    # user 1: one event at t0 → session end = t0 + 30 min (the gap).
    # user 2: one event at t0 + 60 min → final watermark =
    # max(ts) − 30 min = t0 + 30 min — EXACTLY user 1's session end.
    rows = [
        (1, us(t0), 1, "view", 1.0, "{}"),
        (2, us(t0 + dt.timedelta(minutes=60)), 2, "view", 1.0, "{}"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    return d


def test_session_ending_exactly_at_watermark_is_emitted(spark, tie_dir):
    from document_query_system_spark.streaming.event_windows import (
        q_stream_session,
    )

    res = {(r.user_id, r.n_events) for r in q_stream_session(spark, tie_dir).collect()}
    # user 1's session end == final watermark: inclusive eviction
    # emits it (matching the oracle's <=); user 2's session is still
    # open at shutdown and must NOT appear.
    assert res == {(1, 1)}


def test_transform_with_state_against_oracle(spark, duck):
    """Opt-in: transformWithStateInPandas needs google.protobuf in the
    Python env (absent in this sandbox). Where available, the modern
    stateful operator must reproduce the same per-(user, type) totals
    as the SQL oracle."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas state server needs protobuf",
    )
    from conftest import SF_DIR

    from document_query_system_spark.streaming.event_windows import (
        TRANSFORM_WITH_STATE_ORACLE,
        stream_transform_with_state,
    )

    got = {
        (r.user_id, r.event_type, r.n_events, r.max_value)
        for r in stream_transform_with_state(spark, SF_DIR).collect()
    }
    want = set(map(tuple, duck.execute(TRANSFORM_WITH_STATE_ORACLE).fetchall()))
    assert got == want
