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
            # Pin the generate-filter-inference exclusion for driver
            # sessions not built by session.get_spark (see the
            # rationale there: the rule un-stages expensive exprs
            # above a Generate into a per-row quadratic Filter).
            spark.conf.set(
                "spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
            )
            # Subset-key co-partitioning (see session.get_spark): lets
            # composed joins reuse an existing partitioning on a
            # subset of the join keys instead of re-exchanging.
            spark.conf.set(
                "spark.sql.requireAllClusterKeysForCoPartition", "false"
            )
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__module__ = fn.__module__
        _REGISTRY[name] = QuerySpec(name, wrapped, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


# REGISTRATION ORDER IS THE DRIVER-COVERAGE ROTATION. The external
# harness verifies a ~50-query prefix of ``queries()`` dict order per
# round, so queries needing a FRESH driver row must come first. Until
# round 6 the rotation was driven by module IMPORT order, which cannot
# select queries registered at a late module's tail — exactly how 50
# round-6 registrations (scattered across 15 module tails) ended the
# round with no driver row (r6 verdict item 2). The rotation is now an
# explicit NAME list: ``all_specs()`` emits ``_ROTATION_PREFIX`` names
# first (in listed order), then everything else in registration order.
# Unknown names fail loudly (a typo would silently burn a prefix slot).
#
# Round-15 prefix (r14 verdict "Next round" #1 and #2, followed
# exactly): (1) the FIVE r14 lifecycle registrations — built +
# oracle-pinned in r14 (tests/test_layout.py), pre-flighted
# engine-vs-oracle MATCH at sf0.001/0.01/0.1
# (tools/preflight_staged.py, re-run on this round's opening tree),
# registered this round in operators/pipeline.py; (2) the NEW
# composed CRUD row q_ivf_lifecycle_roundtrip (verdict #2: one
# oracled row proving append_ivf_delta → delete_from_ivf →
# compact_ivf_cells cross-engine); (3) 44 of the 49 staged
# r10-VINTAGE oracled rows (name order) — the oldest rows left in
# the ledger — so the oldest oracled vintage moves r10 → mostly-r11.
# 6 + 44 = exactly the 50 driver slots, all ORACLED (no rows-only
# rows this rotation). Positions 51+ stage the remaining 5
# r10-vintage rows as the ready-made r16 prefix tail (the
# r14-refreshed cohort follows in registration order after them;
# nothing else is older than r11).
_ROTATION_PREFIX: tuple[str, ...] = (
    # --- the five r14 lifecycle pairs, first driver rows (r15) ---
    "q_incremental_ivf_scaled",
    "q_ivf_layout_stats",
    "q_ivf_cell_psi",
    "q_stream_ivf_maintenance",
    "q_vector_topk_published",
    # --- the composed physical-CRUD row, first driver row (r15) ---
    "q_ivf_lifecycle_roundtrip",
    # --- r10-vintage refresh (44 of the 49 oldest oracled rows) ---
    "q_agg_distinct",
    "q_agg_doc_stats",
    "q_agg_index_stats",
    "q_agg_rollup",
    "q_agg_success_rate",
    "q_answer_summary",
    "q_binaryfile_scan",
    "q_bucketed_join",
    "q_corpus_datacard",
    "q_delete_anti_join",
    "q_extract_chunks",
    "q_extract_real_containers",
    "q_extract_sniff",
    "q_extract_tables",
    "q_extract_text",
    "q_filter_isin",
    "q_filter_length",
    "q_filter_range",
    "q_golden_vector_search",
    "q_hybrid_rrf",
    "q_incremental_index",
    "q_incremental_lsh",
    "q_join_broadcast",
    "q_join_hash",
    "q_join_left_nomatch",
    "q_join_range",
    "q_join_semi",
    "q_join_sortmerge",
    "q_late_interaction",
    "q_mime_sniff",
    "q_mmr_ann_pool",
    "q_mmr_diversify",
    "q_ocr_text",
    "q_partition_pruned_read",
    "q_project_truncate",
    "q_retention_sweep",
    "q_sliding_window_events",
    "q_stream_dedup",
    "q_stream_python_source",
    "q_stream_python_source_partitioned",
    "q_stream_session",
    "q_stream_stateful_counts",
    "q_stream_stream_join",
    "q_stream_tumbling",
    # --- positions 51+: the 5 remaining r10-vintage rows (name ---
    # --- order; the ready-made r16 prefix tail)                ---
    "q_stream_upsert_foreachbatch",
    "q_to_json",
    "q_training_triplets",
    "q_upsert_last_writer",
    "q_vocab_coverage",
)


def _load_all() -> None:
    """Import every module that registers queries (side-effect imports)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are inside the function to avoid import cycles: these
    # modules import ``register`` from here. Import order no longer
    # matters for driver coverage (see _ROTATION_PREFIX above); kept
    # roughly grouped by package for readability.
    from .operators import similarity  # noqa: F401
    from .operators import dedup  # noqa: F401
    from .operators import pipeline  # noqa: F401
    from .operators import sampling  # noqa: F401
    from .operators import corpus  # noqa: F401
    from .operators import scoring  # noqa: F401
    from .operators import graph  # noqa: F401
    from .sources import layout  # noqa: F401
    from .operators import analytics  # noqa: F401
    from .operators import setops  # noqa: F401
    from .operators import clustering  # noqa: F401
    from .operators import sketches  # noqa: F401
    from .operators import graph_metrics  # noqa: F401
    from .operators import recipes  # noqa: F401
    from .operators import behavior  # noqa: F401
    from .operators import governance  # noqa: F401
    from .operators import sql_surface  # noqa: F401
    from .sources import pydatasource  # noqa: F401
    from .functions import vector  # noqa: F401
    from .operators import textpipe  # noqa: F401
    from .sources import scans  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .streaming import event_windows  # noqa: F401
    from .operators import joins  # noqa: F401
    from . import api  # noqa: F401
    from .operators import search  # noqa: F401
    from .sources import extraction  # noqa: F401
    from .sources import sinks  # noqa: F401
    from .operators import filters  # noqa: F401
    from .operators import aggregates  # noqa: F401
    from .sources import http_ingest  # noqa: F401
    from .operators import windows  # noqa: F401
    from .functions import text  # noqa: F401
    from .functions import scalar  # noqa: F401

    _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    missing = [n for n in _ROTATION_PREFIX if n not in _REGISTRY]
    if missing:
        raise KeyError(f"_ROTATION_PREFIX names not registered: {missing}")
    prefix = {n: _REGISTRY[n] for n in _ROTATION_PREFIX}
    rest = {n: s for n, s in _REGISTRY.items() if n not in prefix}
    return {**prefix, **rest}


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_specs().items()}


def oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}
