"""Golden QA set checks (SURVEY.md §5 item 2): the 10-question
keyword and vector QA pipelines at sf0.001 — structural invariants +
determinism. Exact value parity with SQL is covered by the oracle
differential tests; here we pin the *query contract* the reference's
API promises (ref: src/main.py:93-127 — one answer set per question,
top-k bounded, scores ranked)."""

from __future__ import annotations

import pytest

from document_query_system_spark.operators.search import (
    GOLDEN_QUESTIONS,
    TOP_K,
    keyword_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def topk_rows(spark):
    return keyword_topk(spark, SF_DIR).collect()


def test_every_question_answered(topk_rows):
    assert {r.question_id for r in topk_rows} == {q for q, _ in GOLDEN_QUESTIONS}


def test_topk_bounded_and_ranked(topk_rows):
    by_q: dict[int, list] = {}
    for r in topk_rows:
        by_q.setdefault(r.question_id, []).append(r)
    for qid, rows in by_q.items():
        assert 1 <= len(rows) <= TOP_K
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True), f"question {qid}"
        assert all(0.0 <= s <= 1.0 for s in scores)


def test_scores_nonzero_for_golden_set(topk_rows):
    # The golden questions use the corpus vocabulary (FIXTURES.md §13):
    # every question must hit at least one document.
    best = {}
    for r in topk_rows:
        best[r.question_id] = max(best.get(r.question_id, 0.0), r.score)
    assert all(v > 0 for v in best.values())


def test_deterministic_across_runs(spark, topk_rows):
    again = keyword_topk(spark, SF_DIR).collect()
    key = lambda r: (r.question_id, r.doc_id)  # noqa: E731
    assert sorted(map(key, again)) == sorted(map(key, topk_rows))


def test_vector_and_keyword_pipelines_agree_on_shape(spark):
    from document_query_system_spark.registry import queries

    vec = queries()["q_golden_vector_search"](spark, SF_DIR).collect()
    assert {r.question_id for r in vec} == {q for q, _ in GOLDEN_QUESTIONS}
    by_q: dict[int, int] = {}
    for r in vec:
        by_q[r.question_id] = by_q.get(r.question_id, 0) + 1
    assert all(n <= 3 for n in by_q.values())


def _topdocs(spark, name, k=5):
    from document_query_system_spark.registry import queries

    out: dict[int, list] = {}
    for r in queries()[name](spark, SF_DIR).collect():
        out.setdefault(r.question_id, []).append(r)
    return out


def test_bm25_and_tfidf_substantially_agree(spark):
    """The two tf-weighted lexical rankers rank the same corpus with
    related statistics — their golden top-5 sets must overlap well
    above chance (measured 0.56 mean at sf0.001; chance ≈ 5/500).
    A collapse to ~0 means one ranker's index or scoring broke in a
    way the per-ranker oracles cannot see."""
    bm = _topdocs(spark, "q_bm25_topk")
    tf = _topdocs(spark, "q_tfidf_topk")
    assert set(bm) == set(tf)
    overlaps = []
    for q in bm:
        sa = {r.doc_id for r in bm[q][:5]}
        sb = {r.doc_id for r in tf[q][:5]}
        overlaps.append(len(sa & sb) / 5)
    assert sum(overlaps) / len(overlaps) >= 0.3, overlaps


def test_keyword_ranker_ties_explain_its_ranking(spark):
    """The reference's overlap-fraction scorer saturates on this
    corpus (most documents contain every question word), so its top-k
    is a tie broken by doc_id — pin that structure: within each
    question's top-5, every score equals the question's maximum.
    If scores ever differentiate (corpus change), this documents the
    moment the keyword ranking becomes meaningful."""
    kw = _topdocs(spark, "q_topk_per_question")
    for q, rows in kw.items():
        top = max(r.score for r in rows)
        assert all(r.score == top for r in rows[:5]), (q, rows[:5])
