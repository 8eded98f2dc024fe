"""As-of join semantics on an adversarial fixture: exact timestamp
ties, duplicate order dates, matches exactly at the tolerance
boundary, users with no orders, and orders with no events. The oracle
tests prove Spark==DuckDB on the driver data; these prove the
union+window implementations compute the *defined* semantics —
backward: latest order at-or-before (ties → max orderkey per date);
forward: earliest order strictly after within 7 days (ties → min
orderkey per date) — against a brute-force Python reference.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
DAY = dt.timedelta(days=1)
HOUR = dt.timedelta(hours=1)

# (o_orderkey, o_custkey, o_orderdate)
ORDERS = [
    (10, 1, T0),
    (11, 1, T0 + DAY),
    (13, 1, T0 + DAY),  # same (cust, date) as 11 — tie on the date
    (12, 1, T0 + 9 * DAY),
    (30, 3, T0 + 3 * DAY),
    (40, 4, T0 + 2 * DAY),  # customer with orders but no events
]

# (event_id, ts, user_id)
EVENTS = [
    (100, T0 - HOUR, 1),        # before every order
    (101, T0, 1),               # exactly ON an order date
    (102, T0 + 2 * DAY, 1),     # forward gap to next order exactly 7 days
    (103, T0 + DAY, 1),         # exactly on the duplicated date
    (200, T0 + DAY, 2),         # user with no orders at all
    (300, T0 + 3 * DAY + HOUR, 3),  # after user 3's only order
]


@pytest.fixture(scope="module")
def asof_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("asof_prop"))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([e[0] for e in EVENTS], pa.int64()),
                "ts": pa.array([e[1] for e in EVENTS], pa.timestamp("us")),
                "user_id": pa.array([e[2] for e in EVENTS], pa.int64()),
                "event_type": pa.array(["view"] * len(EVENTS), pa.string()),
                "value": pa.array([1.0] * len(EVENTS), pa.float64()),
                "props": pa.array(["{}"] * len(EVENTS), pa.string()),
            }
        ),
        f"{d}/events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in ORDERS], pa.int64()),
                "o_custkey": pa.array([o[1] for o in ORDERS], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(ORDERS), pa.string()),
                "o_totalprice": pa.array([1.0] * len(ORDERS), pa.float64()),
                "o_orderdate": pa.array(
                    [o[2] for o in ORDERS], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1"] * len(ORDERS), pa.string()),
            }
        ),
        f"{d}/orders.parquet",
    )
    return d


def _brute_backward(event_ts, user):
    # latest o_orderdate <= ts; among same-date orders, max orderkey
    cands = [o for o in ORDERS if o[1] == user and o[2] <= event_ts]
    if not cands:
        return None
    best_date = max(o[2] for o in cands)
    return max(o[0] for o in cands if o[2] == best_date)


def _brute_forward(event_ts, user):
    # earliest o_orderdate > ts within 7 days; ties → min orderkey
    cands = [
        o
        for o in ORDERS
        if o[1] == user and event_ts < o[2] <= event_ts + 7 * DAY
    ]
    if not cands:
        return None
    best_date = min(o[2] for o in cands)
    return min(o[0] for o in cands if o[2] == best_date)


def test_backward_asof_matches_brute_force(spark, asof_dir):
    from document_query_system_spark.operators.joins import q_join_asof

    got = {
        r.event_id: r.last_orderkey
        for r in q_join_asof(spark, asof_dir).collect()
    }
    want = {e[0]: _brute_backward(e[1], e[2]) for e in EVENTS}
    assert got == want
    # the cases that make this fixture adversarial actually differ:
    assert want[100] is None          # before all orders
    assert want[101] == 10            # inclusive at-or-before
    assert want[103] == 13            # duplicated date → max orderkey
    assert want[200] is None          # user with no orders


def test_forward_asof_matches_brute_force(spark, asof_dir):
    from document_query_system_spark.operators.joins import q_join_asof_forward

    got = {
        r.event_id: r.next_orderkey
        for r in q_join_asof_forward(spark, asof_dir).collect()
    }
    want = {e[0]: _brute_forward(e[1], e[2]) for e in EVENTS}
    assert got == want
    assert want[101] == 11            # strictly-after skips the same-t order
    assert want[102] == 12            # gap of exactly 7 days is IN tolerance
    assert want[103] is None          # next order 8 days out — past tolerance
    assert want[300] is None          # only order is in the past


def _brute_nearest(event_ts, user):
    # min |gap| within ±3 days; representative = min orderkey per
    # (cust, date); exact before/after tie → earlier date
    tol = 3 * DAY
    by_date = {}
    for o in ORDERS:
        if o[1] == user and abs(o[2] - event_ts) <= tol:
            by_date[o[2]] = min(by_date.get(o[2], o[0]), o[0])
    if not by_date:
        return None
    best = min(by_date, key=lambda d: (abs(d - event_ts), d))
    return by_date[best]


def test_nearest_asof_matches_brute_force(spark, asof_dir):
    from document_query_system_spark.operators.joins import q_join_asof_nearest

    got = {
        r.event_id: r.nearest_orderkey
        for r in q_join_asof_nearest(spark, asof_dir).collect()
    }
    want = {e[0]: _brute_nearest(e[1], e[2]) for e in EVENTS}
    assert got == want
    assert want[100] == 10            # 1h before t0 → nearest is t0
    assert want[102] == 11            # 1d back vs 7d fwd → backward
    assert want[103] == 11            # gap 0: exactly on the dup date, min key
    assert want[200] is None          # user with no orders
