"""Dedup semantic properties on a corpus with KNOWN duplicates:
exact copies must collide everywhere, disjoint-vocabulary docs must
not, and clustering must put copies in one component with the min id
canonical. (The oracle tests prove Spark==DuckDB; these prove both
compute the *right thing*.)"""

from __future__ import annotations

import pytest

from document_query_system_spark.operators.dedup import (
    N_PERM,
    minhash_signatures,
    q_dedup_clusters,
    q_dedup_minhash_pairs,
    q_dedup_ngram_jaccard,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches the bird fly over the green hill near the old mill "
)
OTHER = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
)


@pytest.fixture(scope="module")
def dup_dir(spark, tmp_path_factory):
    sf_dir = str(tmp_path_factory.mktemp("dedup_prop"))
    rows = [
        (0, BASE, "en", "web", len(BASE)),          # original
        (1, BASE, "en", "web", len(BASE)),          # exact copy
        (2, BASE + "extra tail", "en", "web", len(BASE) + 10),  # near copy
        (3, OTHER, "en", "web", len(OTHER)),        # unrelated
        (4, OTHER, "en", "web", len(OTHER)),        # unrelated's copy
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_exact_copies_have_identical_signatures(spark, dup_dir):
    sigs = {r.doc_id: tuple(r.minhash) for r in
            minhash_signatures(spark, dup_dir).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[3] == sigs[4]
    assert sigs[0] != sigs[3]


def test_exact_copies_are_candidate_pairs_with_est_one(spark, dup_dir):
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard for r in
             q_dedup_minhash_pairs(spark, dup_dir).collect()}
    assert pairs.get((0, 1)) == 1.0
    assert pairs.get((3, 4)) == 1.0
    assert (0, 3) not in pairs and (0, 4) not in pairs


def test_ngram_jaccard_scores(spark, dup_dir):
    jac = {(r.doc_a, r.doc_b): r.jaccard for r in
           q_dedup_ngram_jaccard(spark, dup_dir).collect()}
    assert jac.get((0, 1)) == 1.0
    # near-copy overlaps strongly but not fully
    assert (0, 2) in jac and 0.5 < jac[(0, 2)] < 1.0
    assert (0, 3) not in jac  # disjoint vocabulary never reported


def test_connected_components_chain_converges_logarithmically(spark):
    """r5 verdict item 4: the CC loop must be pointer-doubling, not
    plain propagation — a 64-node chain (diameter 63) has to converge
    in ~log2 rounds, every label must reach the chain min, and the
    hard round cap must make a hypothetical non-convergence an error
    instead of an unbounded job loop."""
    import math

    from document_query_system_spark.operators.dedup import connected_components

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src LONG, dst LONG"
    )
    labels, rounds = connected_components(edges)
    got = {r.v: r.label for r in labels.collect()}
    assert got == {v: 0 for v in range(n)}
    # diameter 63: plain propagation needs ~63 rounds; doubling needs
    # ~log2(63)=6 plus slack for the final no-change round.
    assert rounds <= 2 * math.ceil(math.log2(n)) + 2, rounds

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=2)


def test_clusters_group_copies_with_min_canonical(spark, dup_dir):
    rows = {r.doc_id: r for r in q_dedup_clusters(spark, dup_dir).collect()}
    # {0,1,2} form one component with 0 canonical; {3,4} another with 3.
    assert rows[0].cluster_id == rows[1].cluster_id == rows[2].cluster_id == 0
    assert rows[3].cluster_id == rows[4].cluster_id == 3
    assert rows[0].is_canonical and rows[3].is_canonical
    assert not rows[1].is_canonical and not rows[4].is_canonical
    assert all(r.cluster_id <= d for d, r in rows.items())


def test_signature_width_is_constant(spark, dup_dir):
    for r in minhash_signatures(spark, dup_dir).collect():
        assert len(r.minhash) == N_PERM


@pytest.fixture(scope="module")
def short_dir(spark, tmp_path_factory):
    """Corpus containing sub-shingle-width documents: empty, one- and
    two-token texts. Spark's sequence(1, 0) is DESCENDING [1, 0]
    (unlike DuckDB's empty generate_series), so without the explicit
    short-doc branch in _shingle_hashes these rows abort the job with
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT."""
    sf_dir = str(tmp_path_factory.mktemp("dedup_short"))
    rows = [
        (0, "", "en", "web", 0),
        (1, "one", "en", "web", 3),
        (2, "two tokens", "en", "web", 10),
        (3, BASE, "en", "web", len(BASE)),
        (4, BASE, "en", "web", len(BASE)),
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_short_docs_get_empty_shingles_not_crash(spark, short_dir):
    from document_query_system_spark.operators.dedup import P

    sigs = {r.doc_id: tuple(r.minhash) for r in
            minhash_signatures(spark, short_dir).collect()}
    assert len(sigs) == 5
    # empty shingle set → sentinel signature [P] * N_PERM
    assert sigs[0] == sigs[1] == sigs[2] == (P,) * N_PERM
    assert sigs[3] == sigs[4] != sigs[0]


def test_short_docs_never_pair(spark, short_dir):
    pairs = {(r.doc_a, r.doc_b) for r in
             q_dedup_minhash_pairs(spark, short_dir).collect()}
    # The two real duplicates pair; sentinel signatures do collide in
    # bands (all-P), so short docs may pair with each other but never
    # with a real document.
    assert (3, 4) in pairs
    assert not any((a in {0, 1, 2}) != (b in {0, 1, 2}) for a, b in pairs)


@pytest.fixture(scope="module")
def boiler_dir(spark, tmp_path_factory):
    """Corpus where every document shares a boilerplate prefix (a hot
    shingle family with df = |corpus|) but only two docs are real
    near-dups. Uncapped, the boilerplate connects every doc pair;
    capped, only the true near-dups survive."""
    sf_dir = str(tmp_path_factory.mktemp("dedup_boiler"))
    bp = "copyright notice all rights reserved "
    bodies = [
        "alpha beta gamma delta epsilon zeta",
        "eta theta iota kappa lambda mu",
        "nu xi omicron pi rho sigma",
        "tau upsilon phi chi psi omega",
        "alpha beta gamma delta epsilon zeta",  # dup of doc 0
    ]
    rows = [
        (i, bp + b, "en", "web", len(bp + b)) for i, b in enumerate(bodies)
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_df_cap_drops_boilerplate_pairs(spark, boiler_dir):
    from document_query_system_spark.operators.dedup import _ngram_jaccard

    uncapped = {(r.doc_a, r.doc_b) for r in
                _ngram_jaccard(spark, boiler_dir, None).collect()}
    capped = {(r.doc_a, r.doc_b) for r in
              _ngram_jaccard(spark, boiler_dir, 4).collect()}
    # boilerplate connects unrelated docs without the cap
    assert len(uncapped) > 1 and (0, 4) in uncapped
    # with the cap (df<=4 < corpus of 5) the boilerplate shingles drop;
    # the true duplicate pair survives through its rare body shingles
    assert (0, 4) in capped
    assert all({a, b} == {0, 4} for a, b in capped)


def test_short_docs_ngram_jaccard_no_crash(spark, short_dir):
    jac = {(r.doc_a, r.doc_b): r.jaccard for r in
           q_dedup_ngram_jaccard(spark, short_dir).collect()}
    assert jac.get((3, 4)) == 1.0
    assert all({a, b} == {3, 4} for a, b in jac)
