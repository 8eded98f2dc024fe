"""Native Parquet scans (SURVEY.md §2.1 S10).

These queries exist to pin the scan shape: projection + predicate must
reach the Parquet reader (``PushedFilters``/``ReadSchema`` in
.explain), so at 100 TB the engine reads only the referenced columns
and skips row groups by min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .tables import load


@register(
    "q_scan_lineitem",
    oracle="""
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_discount > 0.05
""",
)
def q_scan_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: projected, filtered fact-table scan. Both the column list
    and both predicates push into the Parquet scan node."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1995-06-01") & (F.col("l_discount") > 0.05))
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    )


@register(
    "q_scan_part_pruned",
    oracle="""
SELECT p_partkey, p_brand, p_retailprice
FROM part
WHERE p_size < 15 AND p_type LIKE '%O%'
""",
)
def q_scan_part_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: dimension scan with LIKE predicate; column pruning keeps
    ReadSchema to 4 of 6 columns."""
    return (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") < 15) & F.col("p_type").like("%O%"))
        .select("p_partkey", "p_brand", "p_retailprice")
    )
