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
# Round-14 prefix (r13 verdict "Next round" #1): rotation stays on
# ROW AGE, budget ZERO new/changed registrations — the registry's own
# r14 note said so and the verdict repeated it; all new operator work
# this round (scaled-IVF incremental maintenance + retrain trigger)
# lands as library + tests and registers in r15. Order: (1) the 3
# staged r8-vintage rows-only KLL sketch rows — r13's positions 51-53,
# promoted to head the prefix exactly as the verdict orders
# (q_agg_percentiles_approx, q_quantile_bins_approx, q_winsorize_approx
# — the oldest rows of any kind left in the ledger, each rows-only by
# design with a local KLL error-bound check in tests/test_oracle.py);
# (2) the 47 r9-VINTAGE ORACLED rows — the oldest oracled rows — so
# the oldest ORACLED vintage becomes r10, the verdict bar.
# 3 + 47 = exactly the 50 driver slots. Positions 51+ stage the
# next-oldest re-observations (the full 49-row r10-vintage cohort)
# for whatever the driver reaches, and as the ready-made r15 prefix
# tail behind r15's new registrations (planned, all already built +
# oracle-pinned in tests/test_layout.py: q_incremental_ivf_scaled =
# operators/pipeline.incremental_ivf(scaled=True) with
# _inc_ivf_oracle(scaled=True); q_ivf_layout_stats =
# operators/pipeline.ivf_layout_stats with _ivf_layout_stats_oracle;
# q_ivf_cell_psi = operators/pipeline.ivf_cell_psi with
# _ivf_cell_psi_oracle; q_stream_ivf_maintenance =
# operators/pipeline.stream_ivf_maintenance against the same
# full-rebuild oracle as the scaled incremental row; and
# q_vector_topk_published = operators/pipeline.published_ivf_topk
# with _published_topk_oracle — the read side of the blue/green
# manifest (version+cells pinned columns) — all five pre-flighted
# engine-vs-oracle MATCH at sf0.001/0.01/0.1, BENCH_NOTES r14).
_ROTATION_PREFIX: tuple[str, ...] = (
    # --- staged rows-only KLL rows (r13 verdict #1; last rows r8) ---
    "q_agg_percentiles_approx",  # rows-only by design (KLL), last row r8
    "q_quantile_bins_approx",  # rows-only by design (KLL), last row r8
    "q_winsorize_approx",  # rows-only by design (KLL), last row r8
    # --- r9-vintage refresh (the 47 oracled rows) ---
    "q_agg_pricing_summary",
    "q_agg_wordcount",
    "q_api_run_keyword",
    "q_api_run_vector",
    "q_array_funcs",
    "q_cross_score",
    "q_date_funcs",
    "q_dedup_hash",
    "q_embed_pandas",
    "q_embed_quantize_int8",
    "q_except",
    "q_extract_cascade",
    "q_filter_chunk_type",
    "q_fingerprint",
    "q_http_ingest",
    "q_intersect",
    "q_join_asof",
    "q_json_corrupt_tolerant",
    "q_json_funcs",
    "q_l2_normalize",
    "q_lag_lead",
    "q_lang_id",
    "q_map_funcs",
    "q_math_funcs",
    "q_merge_small_chunks",
    "q_paragraph_explode",
    "q_prf_expansion",
    "q_quality_score",
    "q_rank_family",
    "q_regex_sections",
    "q_running_sum",
    "q_sentence_split",
    "q_session_window",
    "q_sort_limit",
    "q_source_csv",
    "q_source_json",
    "q_source_orc",
    "q_string_funcs",
    "q_table_flatten",
    "q_token_count",
    "q_topk_per_group",
    "q_topk_per_question",
    "q_tumbling_window",
    "q_udtf_sentences",
    "q_union_all",
    "q_union_distinct",
    "q_vector_topk_filtered",
    # --- positions 51+: staged re-observations (the r10-vintage ---
    # --- cohort, in name order; the ready-made r15 prefix tail)  ---
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
