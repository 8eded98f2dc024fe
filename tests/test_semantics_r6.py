"""Semantic invariants for round-6 operators, beyond engine equality:
the oracle suite proves Spark==DuckDB; these prove the operators
compute the *right thing* on the driver corpus (reassembly really
reassembles, funnels really shrink, the classifier really decides,
PageRank really conserves its floor)."""

from __future__ import annotations

from conftest import SF_DIR


def test_dedup_lines_reassembles_kept_segments(spark):
    from document_query_system_spark.operators.corpus import q_dedup_lines

    rows = q_dedup_lines(spark, SF_DIR).collect()
    assert len(rows) > 0
    seen_any_drop = False
    for r in rows:
        assert 0 <= r.n_kept <= r.n_segments
        # the reassembled text holds exactly n_kept segments
        n_text_segments = len(r.dedup_text.split()) if r.dedup_text else 0
        # segments are 3 tokens except possibly the last one of a doc
        assert r.n_kept == 0 or n_text_segments >= r.n_kept
        if r.n_kept < r.n_segments:
            seen_any_drop = True
    # the synthetic corpus has real duplication — the pass must drop
    # something somewhere or it is vacuous
    assert seen_any_drop


def test_funnel_stage_counts_shrink(spark):
    from document_query_system_spark.operators.analytics import (
        q_funnel_conversion,
    )

    rows = {r.stage: r for r in q_funnel_conversion(spark, SF_DIR).collect()}
    assert set(rows) == {"1_view", "2_click", "3_purchase"}
    assert (
        rows["1_view"].n_users
        >= rows["2_click"].n_users
        >= rows["3_purchase"].n_users
        > 0
    )
    assert rows["2_click"].avg_sec_from_prev >= 0
    assert rows["3_purchase"].avg_sec_from_prev >= 0


def test_quality_classifier_decision_is_nondegenerate(spark):
    from document_query_system_spark.operators.scoring import (
        q_quality_classifier,
    )

    rows = q_quality_classifier(spark, SF_DIR).collect()
    kept = sum(1 for r in rows if r.keep)
    # a useful decision boundary splits the corpus — all-keep or
    # all-drop means the weights degenerated against this data
    assert 0 < kept < len(rows)
    for r in rows:
        assert 0.0 <= r.score <= 1.0
        assert r.keep == (r.score >= 0.5)


def test_pagerank_respects_floor_and_order(spark):
    from document_query_system_spark.operators.graph import (
        _PR_DAMP,
        q_pagerank,
    )

    rows = q_pagerank(spark, SF_DIR).collect()
    assert len(rows) == 20
    ranks = [r.rank for r in rows]
    # top-k must arrive sorted descending with the node tiebreak
    assert ranks == sorted(ranks, reverse=True)
    # every rank respects the teleport floor (1 - damping)
    floor = round(1 - _PR_DAMP, 6)
    assert all(r >= floor for r in ranks)
    # destinations receive mass, so the top node must exceed the floor
    assert ranks[0] > floor


def test_merge_into_actions_partition(spark):
    from document_query_system_spark.sources.sinks import q_merge_into

    rows = {r.action: r for r in q_merge_into(spark, SF_DIR).collect()}
    assert set(rows) == {"inserted", "kept", "updated"}
    for r in rows.values():
        assert r.n_rows > 0
        assert r.sum_price_cents > 0
