"""Window functions and sorts (SURVEY.md §2.5, §2.6).

Every ORDER BY inside a window carries a full deterministic tiebreak
(Spark has no implicit row order — SURVEY §2.6 O3); window frames are
identical ROWS frames on both engines so running values agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load


@register(
    "q_topk_per_group",
    oracle="""
SELECT c_mktsegment, c_custkey, c_name, c_acctbal
FROM (
  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
WHERE rn <= 3
""",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/O2: top-k per group — the per-question top-k ranking shape
    (ref: src/main.py:97,103,156-157) over a relational table."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        load(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal")
    )


@register(
    "q_rank_family",
    oracle="""
SELECT p_partkey, p_brand, p_retailprice,
       rank()         OVER w AS price_rank,
       dense_rank()   OVER w AS price_dense_rank,
       percent_rank() OVER w AS price_pct_rank,
       ntile(4)       OVER w AS price_quartile
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
""",
)
def q_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: the ranking family over brand partitions with a stable
    tiebreak (p_partkey) so ntile/row-dependent functions agree."""
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
    )


@register(
    "q_lag_lead",
    oracle="""
SELECT event_id, user_id, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       value - lag(value) OVER w AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: analytic lag/lead over per-user event-time order."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "q_running_sum",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_quantity) OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                            l_quantity, l_extendedprice
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             2) AS running_qty
FROM lineitem
""",
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: running sum with an explicit ROWS frame — the frame-spec
    analog of the reference's overlapping windows
    (ref: document_processing_service.py:676-678). The ORDER BY ends
    in the value columns: the sf0.1 generator emits a duplicate
    (suppkey, shipdate, orderkey, linenumber) pair, and a ROWS frame
    over a tied order is engine-ambiguous — extending the key to
    (quantity, extendedprice) totalizes the order (rows identical in
    ALL key columns are swap-invariant for the output multiset)."""
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
    )


@register(
    "q_sort_limit",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: global top-k — orderBy+limit compiles to
    TakeOrderedAndProject (per-partition heaps, no full sort), the
    engine analog of the reference's sort()[:3]
    (ref: src/main.py:156-157)."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@register(
    "q_user_drawdown",
    oracle="""
WITH series AS (
  SELECT user_id, ts, event_id,
         sum(value - 50.0) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS cum
  FROM events
),
dd AS (
  SELECT user_id,
         max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - cum AS drawdown
  FROM series
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(max(drawdown), 4) AS max_drawdown
FROM dd GROUP BY user_id
""",
)
def q_user_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user maximum drawdown of the centered cumulative value
    series (peak-to-trough of Σ(value−50) in event-time order) — the
    grouped-map Pandas UDF form (applyInPandas): each user's whole
    series arrives as ONE Arrow batch and a sequential pandas kernel
    (cumsum → cummax → max gap) computes the metric. The windowed SQL
    rewrite exists (it is the oracle), so this query is the measured
    demonstration that a grouped kernel and the relational form agree
    bit-for-bit — the pattern to reach for when the per-group
    algorithm ISN'T window-expressible.

    Scale shape: one shuffle on user_id; group = one user's events
    (bounded by the watermark horizon in streaming ingest, by user
    activity here) — the kernel's memory is the group, never the
    partition. Rounding happens in the DataFrame (SQL round), not in
    Python (half-even), per the registry convention."""
    import pandas as pd

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )

    def drawdown(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"])
        cum = (pdf["value"] - 50.0).cumsum()
        peak = cum.cummax()
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "max_drawdown": [float((peak - cum).max())],
            }
        )

    out = ev.groupBy("user_id").applyInPandas(
        drawdown, "user_id long, n_events long, max_drawdown double"
    )
    return out.select(
        "user_id", "n_events", F.round("max_drawdown", 4).alias("max_drawdown")
    )


# ------------------------------------------------ weighted sampling
#
# Efraimidis–Spirakis (2006) weighted sampling without replacement as
# a pure top-k: key_i = ln(u_i) / w_i with u_i uniform in (0,1),
# take the k LARGEST keys (monotone-equivalent to the paper's
# u_i^(1/w_i) form, numerically tamer). u_i comes from the same
# md5-bucket hash as q_sample_hash, so the sample is deterministic —
# stable under repartition, retry, and re-run — while still being
# exactly weighted: P(i in sample) rises with w_i precisely as E-S
# guarantees. Weight here is document length; any positive per-row
# quality score drops in unchanged.

_WS_K = 50
_WS_M = 16777216  # 2^24 — md5 6-hex-digit bucket space


@register(
    "q_sample_weighted",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
              AS BIGINT) + 1) / {_WS_M + 1}.0) / n_chars AS k
  FROM documents
)
SELECT doc_id, lang, n_chars, round(k, 6) AS sample_key
FROM keyed
ORDER BY k DESC, doc_id
LIMIT {_WS_K}
""",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic E-S weighted sample (k=50, weight = n_chars).

    Plan: scan-local key expression + TakeOrdered(k) — per-partition
    top-k then a k-row merge on the driver, never a full sort or
    shuffle of the corpus. At 100 TB this is the cheapest possible
    shape for a weighted draw: one pass, O(k) state per task. Lives
    in the top-k family (not operators/sampling.py) so the already-
    verified driver-coverage prefix keeps its exact registration
    slots this round; rotate with the other post-prefix r6 queries."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
        ).cast("long")
        + 1
    ) / F.lit(float(_WS_M + 1))
    k = F.log(u) / F.col("n_chars")
    return (
        d.withColumn("k", k)
        .orderBy(F.desc("k"), "doc_id")
        .limit(_WS_K)
        .select(
            "doc_id", "lang", "n_chars", F.round("k", 6).alias("sample_key")
        )
    )


_EWMA_ALPHA = 0.8  # decay per step back
_EWMA_N = 10  # trailing events per user


@register(
    "q_ewma_latest",
    oracle=f"""
WITH r AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
m AS (SELECT user_id, max(rn) AS mrn FROM r GROUP BY user_id)
SELECT r.user_id AS user_id,
       count(*) AS n_tail,
       -- integer micro-unit sums (the q_tfidf_topk/q_bm25_topk
       -- pattern): float += across partitions is summation-order-
       -- dependent; summing round(term*1e6) AS BIGINT is exact and
       -- order-free in both engines, and the 1e6 cancels in the
       -- quotient.
       round(CAST(sum(CAST(round(r.value * pow({_EWMA_ALPHA}, m.mrn - r.rn) * 1e6)
                           AS BIGINT)) AS DOUBLE)
             / CAST(sum(CAST(round(pow({_EWMA_ALPHA}, m.mrn - r.rn) * 1e6)
                             AS BIGINT)) AS DOUBLE), 6) AS ewma
FROM r JOIN m ON r.user_id = m.user_id
WHERE r.rn > m.mrn - {_EWMA_N}
GROUP BY r.user_id
""",
)
def q_ewma_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of each user's trailing
    10 event values (α=0.8 decay per step back from the latest
    event) — the smoothed "current state" feature stores compute per
    entity. The EWMA recursion is inherently sequential; truncating
    to a trailing window turns it into a weighted sum any engine can
    parallelize, with the dropped tail bounded by α^10 ≈ 0.107 of
    the total weight.

    Shape: one user-keyed window for row numbers, a user-keyed max,
    and a weighted aggregate — all three hash-partition on user_id,
    so AQE fuses them into a single exchange's worth of movement; no
    self-join, no per-row state. Weights come from pow() on both
    engines; numerator and denominator are summed as integer
    micro-units (round(term*1e6) AS BIGINT — the q_tfidf_topk /
    q_bm25_topk discipline) so the aggregate is summation-order-free
    across partitions, and the 1e6 scale cancels in the quotient."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.withColumn("rn", F.row_number().over(w))
    m = r.groupBy("user_id").agg(F.max("rn").alias("mrn"))
    wt = F.pow(F.lit(_EWMA_ALPHA), F.col("mrn") - F.col("rn"))
    num = F.sum(F.round(F.col("value") * wt * 1e6).cast("long"))
    den = F.sum(F.round(wt * 1e6).cast("long"))
    return (
        r.join(m, "user_id")
        .filter(F.col("rn") > F.col("mrn") - _EWMA_N)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_tail"),
            F.round(
                num.cast("double") / den.cast("double"), 6
            ).alias("ewma"),
        )
    )


@register(
    "q_forward_fill",
    oracle="""
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 7 < 2 THEN NULL ELSE round(value, 6) END AS v
  FROM events
)
SELECT event_id, user_id,
       round(last_value(v IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING), 6) AS filled_value,
       CAST(v IS NULL AS BOOLEAN) AS was_filled
FROM g
""",
)
def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill / last-observation-carried-forward: null readings
    (a deterministic ~29% mask here, standing in for sensor dropout)
    take the user's most recent non-null value in event-time order —
    the standard time-series imputation pass. Rows before a user's
    first reading legitimately stay null.

    Shape: one user-keyed ordered window with `last(..., ignorenulls)`
    over an unbounded-preceding frame — running-state semantics the
    engine evaluates in a single pass per partition after one
    user-keyed exchange; at scale this is the same shuffle the
    surrounding per-user analytics already pay, and range-partitioned
    event logs evaluate it scan-locally."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    v = F.when(F.col("event_id") % 7 < 2, F.lit(None)).otherwise(
        F.round(F.col("value"), 6)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = ev.withColumn("v", v)
    return g.select(
        "event_id",
        "user_id",
        F.round(F.last("v", ignorenulls=True).over(w), 6).alias("filled_value"),
        F.col("v").isNull().alias("was_filled"),
    )


_NEYMAN_BUDGET = 100


@register(
    "q_sample_neyman",
    oracle=f"""
WITH st AS (
  SELECT lang, count(*) AS nh, round(stddev_samp(n_chars), 6) AS sh
  FROM documents GROUP BY lang
),
tot AS (SELECT sum(nh * sh) AS t FROM st),
alloc AS (
  SELECT lang, nh, sh,
         CAST(floor(round({_NEYMAN_BUDGET} * nh * sh / tot.t, 9)) AS BIGINT) AS n_take
  FROM st CROSS JOIN tot
),
rk AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
  FROM documents
)
SELECT rk.doc_id AS doc_id, rk.lang AS lang, a.n_take AS n_take
FROM rk JOIN alloc a ON a.lang = rk.lang
WHERE rk.r <= a.n_take
""",
)
def q_sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sampling: a 100-row budget is
    split across language strata ∝ N_h·σ_h (stratum size × stddev of
    the target variable), the allocation that minimizes estimator
    variance for a fixed budget — the statistically-correct upgrade
    of proportional stratified sampling (q_sample_stratified). Rows
    within a stratum are taken in md5 order (deterministic, like
    q_sample_hash); floor allocation leaves ≤ |strata| unspent slots
    by design. σ is rounded to 6 and the allocation ratio to 9
    BEFORE flooring, so the per-stratum quota is engine-identical.

    Shape: one per-stratum moment aggregate (tiny), the scalar total
    cross-joined back, and one per-stratum ranking window over the
    corpus — the same single user-keyed exchange every per-stratum
    top-k here pays. Lives in this module, not sampling.py, so the
    verified prefix slots stay fixed (q_sample_weighted precedent).
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    st = docs.groupBy("lang").agg(
        F.count("*").alias("nh"),
        F.round(F.stddev_samp("n_chars"), 6).alias("sh"),
    ).localCheckpoint(eager=False)
    tot = st.agg(F.sum(F.col("nh") * F.col("sh")).alias("t"))
    alloc = st.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.floor(
            F.round(F.lit(_NEYMAN_BUDGET) * F.col("nh") * F.col("sh") / F.col("t"), 9)
        )
        .cast("long")
        .alias("n_take"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    rk = docs.select("doc_id", "lang", F.row_number().over(w).alias("r"))
    return (
        rk.join(F.broadcast(alloc), "lang")
        .filter(F.col("r") <= F.col("n_take"))
        .select("doc_id", "lang", "n_take")
    )
