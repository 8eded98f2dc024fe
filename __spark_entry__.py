"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``document_query_system_spark`` package;
this file only adapts the registry to the driver's contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the sibling package importable regardless of the driver's cwd.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Keyword QA: 10 golden questions, broadcast-cross-scored against
    documents, window top-3 per question (SURVEY.md §7 Phase 1).
    """
    from document_query_system_spark.operators.search import flagship
    from document_query_system_spark.session import ensure_worker_imports

    ensure_worker_imports(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from document_query_system_spark import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query in queries()."""
    from document_query_system_spark import registry

    return registry.oracles()
