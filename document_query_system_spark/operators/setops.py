"""Set operations (SURVEY.md §2.7).

The reference's chunk-list concatenation
(ref: document_processing_service.py:567-580, optimized_chunks.extend)
is a bag UNION ALL; the full distinct set-op family is engine parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "q_union_all",
    oracle="""
SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
UNION ALL
SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
""",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — no shuffle, partitions simply concatenate
    (ref analog: chunk-strategy list extend, :567-580)."""
    c = _cust_nations(spark, sf_dir).withColumn("side", F.lit("customer"))
    s = _supp_nations(spark, sf_dir).withColumn("side", F.lit("supplier"))
    return c.unionByName(s)


@register(
    "q_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT = union + hash dedup on the key."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@register(
    "q_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "q_except",
    oracle="""
SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 0
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — nations with negative-balance
    customers but no high-balance suppliers."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


@register(
    "q_intersect_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics): each nation key survives
    min(customer-count, supplier-count) times — the bag-algebra twin
    of q_intersect, implemented by the engine as a count-compare
    aggregate, not a quadratic join."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersectAll(s)


@register(
    "q_except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset semantics): each nation key survives
    max(customer-count − supplier-count, 0) times — bag difference,
    the form dedup accounting actually needs (how many EXTRA copies
    exist), vs q_except's set difference."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.exceptAll(s)
