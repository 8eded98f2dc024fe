"""Behavioral analytics: marketing attribution and cohort retention —
the two event-log rollups every product-analytics stack ships
(Amplitude/Mixpanel shapes), expressed as single-window plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load

_ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback


@register(
    "q_attribution_last_touch",
    oracle=f"""
WITH ce AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type IN ('click', 'purchase')
),
carried AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w AS last_click_id,
         last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
           OVER w AS last_click_us
  FROM ce
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id AS purchase_id, user_id,
       CASE WHEN last_click_us IS NOT NULL
                 AND epoch_us(ts) - last_click_us <= {_ATTR_WINDOW_US}
            THEN last_click_id END AS attributed_click_id,
       CASE WHEN last_click_us IS NOT NULL
                 AND epoch_us(ts) - last_click_us <= {_ATTR_WINDOW_US}
            THEN epoch_us(ts) - last_click_us END AS gap_us
FROM carried WHERE event_type = 'purchase'
""",
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent click within a 7-day lookback (NULL if none) — the
    conversion-credit join ad analytics runs constantly. Expressed
    with the forward-fill machinery (q_forward_fill): one user-keyed
    ordered window carries the last click id/timestamp forward with a
    1-PRECEDING frame end (a click at the same instant as the
    purchase does not credit itself), so there is NO as-of join —
    clicks and purchases ride the same partition.

    Shape: one filter (two event types), one user-keyed window, one
    final filter. Single exchange; per-task window state is one
    (id, ts) pair."""
    ce = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .filter(F.col("event_type").isin("click", "purchase"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_us = F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    carried = ce.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
        F.last(click_us, ignorenulls=True).over(w).alias("last_click_us"),
    )
    in_window = F.col("last_click_us").isNotNull() & (
        F.unix_micros("ts") - F.col("last_click_us") <= _ATTR_WINDOW_US
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(in_window, F.col("last_click_id")).alias("attributed_click_id"),
        F.when(in_window, F.unix_micros("ts") - F.col("last_click_us")).alias(
            "gap_us"
        ),
    )


@register(
    "q_cohort_retention",
    oracle="""
WITH firstday AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_date,
         CAST((CAST(e.ts AS DATE) - f.cohort_date) // 7 AS BIGINT) AS week_offset
  FROM events e JOIN firstday f ON f.user_id = e.user_id
)
SELECT cohort_date, week_offset, count(*) AS n_users
FROM activity GROUP BY cohort_date, week_offset
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen date,
    counted once per 7-day offset bucket they return in — the
    retention triangle every growth dashboard renders. Offsets are
    integer day-arithmetic buckets from each user's own cohort start
    (NOT calendar-week truncation, whose week-start convention
    varies across engines).

    Shape: a per-user min (partial-aggregable), a user-keyed join
    that rides the same partitioning, a distinct on (user, offset)
    — user-keyed again — and the final small rollup. At 100 TB
    everything keys on user_id until the last |cohorts|×|offsets|
    aggregate."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    firstday = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_date")
    )
    activity = (
        ev.join(firstday, "user_id")
        .select(
            "user_id",
            "cohort_date",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_date")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_date", "week_offset").agg(
        F.count("*").alias("n_users")
    )


@register(
    "q_hourly_seasonality",
    oracle="""
WITH h AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hour_of_day, count(*) AS n
  FROM events GROUP BY event_type, hour(ts)
),
tot AS (SELECT event_type, sum(n) AS t FROM h GROUP BY event_type)
SELECT h.event_type AS event_type, h.hour_of_day, h.n AS n,
       round(h.n / tot.t::DOUBLE, 6) AS share
FROM h JOIN tot ON tot.event_type = h.event_type
""",
)
def q_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile per event type — the seasonality
    baseline anomaly monitors normalize against (an alert threshold
    that ignores the 3 a.m. trough pages people for nothing). Hours
    are UTC by the session-timezone pin (registry.py), so both
    engines bucket identically.

    Shape: one (type, hour) hash aggregate — at most |types|·24
    groups regardless of corpus size — and a broadcast of per-type
    totals back over it. Everything after the first partial agg is
    constant-cardinality."""
    ev = load(spark, sf_dir, "events").select("event_type", "ts")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour_of_day")
    ).agg(F.count("*").alias("n"))
    h = h.localCheckpoint(eager=False)  # feeds totals + the share join
    tot = h.groupBy("event_type").agg(F.sum("n").alias("t"))
    return h.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hour_of_day",
        "n",
        F.round(F.col("n") / F.col("t"), 6).alias("share"),
    )


_GAP_TYPE, _GAP_THR = "error", 250.0


@register(
    "q_gapfill_daily",
    oracle=f"""
WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
                FROM events),
spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
          FROM bounds),
daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events
          WHERE event_type = '{_GAP_TYPE}' AND value > {_GAP_THR}
          GROUP BY CAST(ts AS DATE))
SELECT s.day AS day, coalesce(d.n, 0) AS n_events, d.n IS NULL AS is_gap
FROM spine s LEFT JOIN daily d ON d.day = s.day
""",
)
def q_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap filling: a generated calendar spine (min..max
    event date) left-joined to daily counts of a sparse event slice
    (high-value errors), zero-filled with the gap flagged — the step
    every time-series rollup needs before charting or
    window-averaging, because a groupBy alone silently omits empty
    days and downstream moving averages skip them.

    Shape: the spine comes from one sequence() over a 1-row bounds
    aggregate (|days| rows — tiny at any corpus size); the daily
    counts are a scan-filtered partial aggregate; the join is
    broadcast. Full-corpus cost is the filtered scan, nothing else
    scales with data."""
    ev = load(spark, sf_dir, "events").select("event_type", "value", "ts")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    daily = (
        ev.filter((F.col("event_type") == _GAP_TYPE) & (F.col("value") > _GAP_THR))
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    return spine.join(F.broadcast(daily), "day", "left").select(
        "day",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.col("n").isNull().alias("is_gap"),
    )
