"""Mathematical guarantees of the portable sketches and the seeded
k-means — properties the oracle match alone does not assert (a
matching-but-broken estimator passed the oracle before the HLL hash
fix; these tests pin the *quality* contracts).

Runs on the DuckDB oracle side: the oracles are the same arithmetic
as the Spark plans (value-matched in test_oracle.py), and DuckDB
evaluates them in milliseconds, so property depth costs no Spark
session time.
"""

from __future__ import annotations

import duckdb
import pytest

from conftest import SF_DIR

from document_query_system_spark import registry

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_cms_never_underestimates(duck):
    """The count-min guarantee: est >= true for every probed term,
    and at least one collision is visible at the demo width (w=16 on
    a 31-term vocab) so the overcount column is a live diagnostic."""
    rows = duck.execute(
        registry.all_specs()["q_heavy_hitters_cms"].oracle
    ).fetchall()
    assert rows, "CMS probe set is empty"
    overcounts = {term: over for term, _true, _est, over in rows}
    assert all(o >= 0 for o in overcounts.values()), overcounts
    assert any(o > 0 for o in overcounts.values()), (
        "no collisions at demo width — overcount column is vacuous"
    )


def test_hll_estimate_within_error_bound(duck):
    """Raw-HLL relative error for m=256 buckets is ~1.04/sqrt(m) =
    6.5% (1 sigma); assert a 4-sigma band. The pre-fix polynomial
    hash failed this at 735%.

    The asymptotic band only holds when n is comfortably past m: in
    the n ≲ m regime most buckets are empty and the raw estimator is
    biased high by design — the regime production HLL hands to the
    LinearCounting correction (sketches.py documents the small-range
    seam). sf0.01's 2000 distinct keys are in-regime; at sf0.001 the
    fixture has only ~200 (< m), so the band assertion is skipped
    there rather than mislabeling the documented small-range bias as
    a regression (found by the r12 full-suite-at-every-scale run)."""
    ((exact, est, rel_err),) = duck.execute(
        registry.all_specs()["q_hll_portable"].oracle
    ).fetchall()
    assert exact > 0
    assert rel_err == pytest.approx(abs(est - exact) / exact, abs=1e-4)
    if exact < 2 * 256:
        pytest.skip(
            f"n={exact} < 2m: raw-HLL small-range regime "
            "(LinearCounting territory); asymptotic band not applicable"
        )
    assert rel_err <= 4 * 1.04 / (256 ** 0.5), (exact, est, rel_err)


def test_kmeans_update_does_not_increase_inertia(duck):
    """Lloyd monotonicity: total inertia after (update, re-assign)
    must be <= inertia of the seed assignment — the property that
    makes k-means converge. Computed by re-running the oracle's CTE
    chain with both assignments exposed."""
    oracle = registry.all_specs()["q_cluster_kmeans"].oracle
    prefix = oracle[: oracle.index(", fin AS")]
    i1, i2 = duck.execute(
        prefix
        + """
SELECT (SELECT sum(d2) FROM a1) AS inertia_seed,
       (SELECT sum(d2) FROM a2) AS inertia_updated
"""
    ).fetchone()
    assert i2 <= i1 + 1e-6, (i1, i2)


def test_kmeans_partitions_all_vectors(duck):
    """Cluster sizes sum to the vector count (every vector assigned
    exactly once) and every cluster id is one of the seed ids."""
    rows = duck.execute(
        registry.all_specs()["q_cluster_kmeans"].oracle
    ).fetchall()
    n = duck.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert sum(r[1] for r in rows) == n
    assert len(rows) <= 8


def test_semantic_dedup_subset_of_corpus(duck):
    """Every dropped id is a real vec_id, none is dropped twice, and
    best_cos respects the threshold."""
    rows = duck.execute(
        registry.all_specs()["q_dedup_semantic"].oracle
    ).fetchall()
    from document_query_system_spark.operators.clustering import _SEM_TAU

    ids = [r[0] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(r[2] >= _SEM_TAU for r in rows)
    vec_ids = {
        v for (v,) in duck.execute("SELECT vec_id FROM embeddings").fetchall()
    }
    assert set(ids) <= vec_ids
