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
# Round-10 prefix (r9 verdict "Next round" #2): rotation stays on ROW
# AGE, oldest vintage first. Order: (1) the six new r10 registrations
# plus every query whose IMPLEMENTATION changed this round (a changed
# plan needs a fresh row regardless of vintage: the Arrow embed path,
# the bounded vocab window, the single-batch stream drives, the
# refactored MMR rounds); (2) ALL 39 r5-vintage rows — the oldest in
# the ledger (document-pipeline + streaming originals) — so the
# oldest green row becomes r6; (3) backfill to 50 with the riskiest
# r6 rows (timestamp intervals; float-score index probes; log-double
# statistics — the value classes the r7 HUGEINT/date episodes bit).
_ROTATION_PREFIX: tuple[str, ...] = (
    # --- new r10 registrations + r10-changed implementations ---
    "q_mmr_ann_pool",  # NEW: MMR over the multiprobe-LSH stored pool
    "q_late_interaction",  # NEW: ColBERT-style MaxSim re-rank
    "q_mmr_pool_recall",  # NEW: driver-checkable ANN-pool recall report
    "q_corpus_datacard",  # NEW: per-source datasheet aggregate
    "q_incremental_lsh",  # NEW: delta-merge ≡ rebuild for the ANN layout
    "q_training_triplets",  # NEW: contrastive triplet export
    "q_golden_vector_search",  # corpus leg moved to the Arrow embedder
    "q_mmr_diversify",  # greedy rounds refactored into shared helper
    "q_vocab_coverage",  # rank window now bounded by a top-cut take
    "q_stream_python_source",  # single-micro-batch drive
    "q_stream_python_source_partitioned",  # single batch + restart clamp
    # --- r5-vintage refresh (all 39: the oldest rows in the ledger) ---
    "q_agg_distinct",
    "q_agg_doc_stats",
    "q_agg_index_stats",
    "q_agg_rollup",
    "q_agg_success_rate",
    "q_answer_summary",
    "q_binaryfile_scan",
    "q_bucketed_join",
    "q_delete_anti_join",
    "q_extract_chunks",
    "q_extract_real_containers",
    "q_extract_sniff",
    "q_extract_tables",
    "q_extract_text",
    "q_filter_isin",
    "q_filter_length",
    "q_filter_range",
    "q_hybrid_rrf",
    "q_incremental_index",
    "q_join_broadcast",
    "q_join_hash",
    "q_join_left_nomatch",
    "q_join_range",
    "q_join_semi",
    "q_join_sortmerge",
    "q_mime_sniff",
    "q_ocr_text",
    "q_partition_pruned_read",
    "q_project_truncate",
    "q_retention_sweep",
    "q_sliding_window_events",
    "q_stream_dedup",
    "q_stream_session",
    "q_stream_stateful_counts",
    "q_stream_stream_join",
    "q_stream_tumbling",
    "q_stream_upsert_foreachbatch",
    "q_to_json",
    "q_upsert_last_writer",
    # --- no r6 backfill: the six new r10 registrations fill the
    # --- remaining slots (new registrations MUST hold checked prefix
    # --- slots, the r6-debt lesson; the r6-vintage value-rendering
    # --- rows head the r11 rotation instead) ---
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
