"""Central query registry — the driver-contract surface.

Every operator from SURVEY.md §2 registers here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus, when the semantics
are ANSI-SQL-expressible, an equivalent DuckDB oracle SQL string.
``__spark_entry__.py`` exposes this registry to the driver, which
runs Spark query and oracle side-by-side and compares row-count +
schema + order-insensitive value-hash.

Conventions (FIXTURES.md):
- alias every computed column identically in Spark and SQL;
- round float aggregates *inside both queries* (sum order differs
  across engines; rounding inside the query makes the hashed values
  identical) — wide sums to 2 decimals, per-row floats to 6;
- top-k queries tiebreak on a stable key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # UDF-backed plans need the package importable on executor
            # Python workers regardless of the driver's cwd/PYTHONPATH.
            from .session import ensure_worker_imports

            ensure_worker_imports(spark)
            # Calendar functions (year/date_trunc/session windows) are
            # session-timezone-dependent; the engine's semantics — and
            # the DuckDB oracle, which reads parquet timestamps as
            # naive UTC — are defined in UTC. Pin it per call so
            # results do not depend on the host session's zone.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__module__ = fn.__module__
        _REGISTRY[name] = QuerySpec(name, wrapped, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (side-effect imports)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are inside the function to avoid import cycles: these
    # modules import ``register`` from here.
    from .operators import (  # noqa: F401
        aggregates,
        analytics,
        dedup,
        filters,
        joins,
        multimodal,
        sampling,
        search,
        setops,
        similarity,
        textpipe,
        windows,
    )
    from . import api  # noqa: F401
    from .functions import scalar, text, vector  # noqa: F401
    from .sources import extraction, scans, sinks  # noqa: F401
    from .streaming import event_windows  # noqa: F401

    _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}
