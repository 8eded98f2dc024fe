"""Data-governance operators: k-anonymity auditing and blocked
record linkage (entity resolution) — the privacy/compliance passes a
training-data platform runs next to PII redaction
(operators/pipeline.py) before a corpus ships.

Shapes:
- k-anonymity: ONE groupBy on the quasi-identifier tuple; the audit
  is the size histogram of its own output. Nothing is row-wise.
- entity resolution: cross-TABLE fuzzy match, blocked on an exact
  key (nation) so the quadratic edit-distance comparison runs only
  within blocks — the same blocking discipline as the
  q_dedup_levenshtein near-dup pass, pointed across two tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load

# ------------------------------------------------------- k-anonymity audit
#
# A release is k-anonymous iff every quasi-identifier (QI) combination
# is shared by ≥ k rows; groups below k are re-identification risks
# (Sweeney 2002). QI here: (nation, market segment, account-balance
# thousand-bucket) — the classic "demographics + coarse numeric"
# combination. The audit reports every below-k group with its size.

_KANON_K = 5


@register(
    "q_k_anonymity",
    oracle=f"""
SELECT c_nationkey, c_mktsegment,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
       CAST(count(*) AS BIGINT) AS group_size
FROM customer
GROUP BY c_nationkey, c_mktsegment, floor(c_acctbal / 1000)
HAVING count(*) < {_KANON_K}
""",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5): every quasi-identifier group —
    (nation, segment, account-balance/1000 bucket) — with fewer than
    k members, i.e. the rows a linkage attack could re-identify.
    The fix pipeline (generalize buckets, suppress groups) hangs off
    this report.

    Plan: one hash aggregate on the QI tuple, HAVING-filtered — the
    audit costs exactly one shuffle at any scale, and the QI
    cardinality (not the row count) bounds the output."""
    c = load(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    return (
        c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        )
        .agg(F.count("*").cast("long").alias("group_size"))
        .filter(F.col("group_size") < _KANON_K)
    )


# --------------------------------------------------- entity resolution
#
# Cross-table record linkage: match customer records to supplier
# records that plausibly denote the same entity. Synthetic TPC-H
# names carry their identity in the numeric suffix, so "same entity"
# is modeled as edit-distance ≤ 1 between the last 4 name digits —
# the SHAPE (exact-key blocking + in-block edit distance + emit
# scored pairs) is the production record-linkage pattern; swap the
# comparator for Jaro-Winkler/embedding similarity on real names.

_ER_MAX_DIST = 1


@register(
    "q_entity_resolution",
    oracle=f"""
SELECT c.c_custkey, s.s_suppkey,
       c.c_nationkey AS nationkey,
       CAST(levenshtein(substr(c.c_name, -4), substr(s.s_name, -4)) AS BIGINT)
         AS edit_dist
FROM customer c JOIN supplier s
  ON c.c_nationkey = s.s_nationkey
WHERE levenshtein(substr(c.c_name, -4), substr(s.s_name, -4)) <= {_ER_MAX_DIST}
""",
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity resolution: candidate (customer, supplier)
    pairs whose last-4 name digits are within edit distance 1,
    compared only within the same nation block. Emits the exact
    match set with its distance — deterministic, no ranking needed.

    Plan: an equi-join on the blocking key does the heavy lifting
    (shuffle ∝ rows, co-partitioned on nation); the quadratic
    comparator runs only inside each block's join matches. At 100 TB
    blocks come from a cheap blocking-key generator (sorted
    neighborhood / phonetic keys) and the in-block comparison stays
    the bounded part — the q_dedup_levenshtein scale notes apply."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").alias("nationkey"),
        F.substring(F.col("c_name"), -4, 4).alias("c_suffix"),
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_nationkey").alias("nationkey"),
        F.substring(F.col("s_name"), -4, 4).alias("s_suffix"),
    )
    dist = F.levenshtein(F.col("c_suffix"), F.col("s_suffix"))
    return (
        c.join(s, "nationkey")
        .withColumn("edit_dist", dist.cast("long"))
        .filter(F.col("edit_dist") <= _ER_MAX_DIST)
        .select("c_custkey", "s_suppkey", "nationkey", "edit_dist")
    )
