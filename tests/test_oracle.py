"""Differential correctness: every registered query vs its DuckDB oracle.

Mirrors the driver's t2 gate: row-count + column names + exact,
order-insensitive value comparison. Exact float equality is
intentional — queries are required to round any cross-engine-unstable
float *inside* the query (registry.py conventions), so a mismatch
here means the driver's value-hash would mismatch too.
"""

from __future__ import annotations

import datetime
import math

import pytest

from conftest import SF_DIR

from document_query_system_spark import registry


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0 and float32-vs-float64 representations
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [c for _, c in sorted(enumerate(cols), key=lambda p: p[1])], out


_SPECS = registry.all_specs()


# ------------------------------------------------------------------
# Bounded checks for no-oracle queries (r5 verdict item 3): sketch
# outputs can't be value-matched across engines, but they CAN be
# bounded — every rows-only query must have an entry here, so the
# local suite has no assertion-free queries.

_HLL_RSD = 0.05  # Spark approx_count_distinct default rsd


def _chk_approx_distinct(duck, cols, rows):
    (row,) = rows
    got = dict(zip(cols, row))
    exact_parts, exact_orders = duck.execute(
        "SELECT count(DISTINCT l_partkey), count(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()
    for key, exact in (
        ("approx_parts", exact_parts),
        ("approx_orders", exact_orders),
    ):
        # 6-sigma bound on the HLL++ relative standard deviation — a
        # sketch outside this is broken, not unlucky.
        tol = max(6 * _HLL_RSD * exact, 10)
        assert abs(got[key] - exact) <= tol, (key, got[key], exact, tol)


def _chk_percentiles_approx(duck, cols, rows):
    # percentile_approx(accuracy=10000) guarantees rank error <=
    # n/10000 (~2 rows per group here); bound each approx value by the
    # exact quantiles at p +/- 0.001 (a 10x rank margin).
    for row in rows:
        got = dict(zip(cols, row))
        flag = got["l_returnflag"]
        for key, p in (("p50_approx", 0.5), ("p95_approx", 0.95)):
            lo, hi = duck.execute(
                "SELECT quantile_cont(l_extendedprice, ?),"
                "       quantile_cont(l_extendedprice, ?)"
                " FROM lineitem WHERE l_returnflag = ?",
                [max(p - 0.001, 0.0), min(p + 0.001, 1.0), flag],
            ).fetchone()
            assert lo <= got[key] <= hi, (flag, key, got[key], lo, hi)


def _chk_quantile_bins_approx(duck, cols, rows):
    # percentile_approx(accuracy=10000) bounds each boundary's rank
    # error by n/10000; bracket every cumulative bin fraction by the
    # target decile ± 0.005 (a 50× rank margin absorbing the 4-decimal
    # boundary rounding), and require exact partition of the scan.
    (n_total,) = duck.execute("SELECT count(*) FROM lineitem").fetchone()
    got = {r[cols.index("bin")]: dict(zip(cols, r)) for r in rows}
    assert set(got) == set(range(1, 11)), sorted(got)
    assert sum(g["n"] for g in got.values()) == n_total
    cum = 0
    for k in range(1, 10):
        cum += got[k]["n"]
        frac = cum / n_total
        assert abs(frac - k / 10) <= 0.005, (k, frac)
    for g in got.values():
        # lo/hi are rounded to 2 decimals, avg_v to 4 — a bin whose
        # values cluster within half a cent of its minimum can have
        # round(min, 2) exceed round(avg, 4); the 0.005 epsilon
        # absorbs that asymmetric rounding (r8 ADVICE).
        assert g["lo"] - 0.005 <= g["avg_v"] <= g["hi"] + 0.005, g


def _chk_winsorize_approx(duck, cols, rows):
    # Clamped-tail fractions must sit within the sketch rank-error
    # bracket of their 5% targets, and each flag's winsorized mean
    # must lie between the EXACT winsorized means computed at clamp
    # quantiles p ∓ 0.001 (mean_w(lo, hi) is monotone increasing in
    # both bounds, so shifting both down/up gives hard envelopes; the
    # sketch guarantees rank error ≤ 1e-4 ≪ the 1e-3 margin).
    (n_total,) = duck.execute("SELECT count(*) FROM lineitem").fetchone()
    n_lo = sum(r[cols.index("n_lo")] for r in rows)
    n_hi = sum(r[cols.index("n_hi")] for r in rows)
    assert sum(r[cols.index("n")] for r in rows) == n_total
    assert abs(n_lo / n_total - 0.05) <= 0.005, n_lo / n_total
    assert abs(n_hi / n_total - 0.05) <= 0.005, n_hi / n_total
    env = {
        flag: (mw_lo, mw_hi)
        for flag, mw_lo, mw_hi in duck.execute(
            """
WITH b AS (
  SELECT quantile_cont(l_extendedprice, 0.049) AS lo_dn,
         quantile_cont(l_extendedprice, 0.051) AS lo_up,
         quantile_cont(l_extendedprice, 0.949) AS hi_dn,
         quantile_cont(l_extendedprice, 0.951) AS hi_up
  FROM lineitem
)
SELECT l_returnflag,
       avg(least(greatest(l_extendedprice, b.lo_dn), b.hi_dn)),
       avg(least(greatest(l_extendedprice, b.lo_up), b.hi_up))
FROM lineitem CROSS JOIN b GROUP BY l_returnflag
"""
        ).fetchall()
    }
    for r in rows:
        g = dict(zip(cols, r))
        mw_lo, mw_hi = env[g["flag"]]
        # 0.02 slack absorbs the 4-decimal boundary rounding and the
        # integer-cents accounting.
        assert mw_lo - 0.02 <= g["mean_winsorized"] <= mw_hi + 0.02, (
            g,
            mw_lo,
            mw_hi,
        )


def _chk_mllib_lsh(duck, cols, rows):
    # The MLlib hash family decides WHICH candidates surface (not
    # checkable cross-engine), but every surfaced row must be a real
    # pair with the exact normalized-L2 distance, every query id must
    # be present, and distances must respect the join threshold.
    import math

    emb = {
        vid: v
        for vid, v in duck.execute(
            "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM embeddings"
        ).fetchall()
    }

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    seen_queries = set()
    for row in rows:
        got = dict(zip(cols, row))
        q, m, d = got["query_id"], got["match_id"], got["l2_dist"]
        assert q in range(5) and m in emb and m != q, row
        seen_queries.add(q)
        assert 0.0 < d <= 1.3, row
        uq, um = unit(emb[q]), unit(emb[m])
        exact = math.sqrt(sum((a - b) ** 2 for a, b in zip(uq, um)))
        assert abs(d - exact) <= 1e-4, (q, m, d, exact)
    assert seen_queries == set(range(5)), seen_queries


def _chk_bpe_tokens(duck, cols, rows):
    # Exact reference check, not a tolerance: recompute every row's
    # BPE encode with the same pure-Python function over the oracle
    # engine's copy of the text.
    from document_query_system_spark.functions.text import bpe_encode

    got = {r[cols.index("doc_id")]: r for r in rows}
    for doc_id, text in duck.execute(
        "SELECT doc_id, text FROM documents"
    ).fetchall():
        words = text.split()
        toks = []
        for wd in words:
            toks.extend(bpe_encode(wd.lower()))
        row = dict(zip(cols, got[doc_id]))
        assert row["n_words"] == len(words), doc_id
        assert row["n_bpe_tokens"] == len(toks), doc_id
        assert row["bpe_preview"] == "|".join(toks[:8]), doc_id
    assert len(rows) == len(got)


_BOUND_CHECKS = {
    "q_agg_approx_distinct": _chk_approx_distinct,
    "q_agg_percentiles_approx": _chk_percentiles_approx,
    "q_quantile_bins_approx": _chk_quantile_bins_approx,
    "q_winsorize_approx": _chk_winsorize_approx,
    "q_ann_mllib_lsh": _chk_mllib_lsh,
    "q_bpe_tokens": _chk_bpe_tokens,
}


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_vs_oracle(name, spark, duck):
    spec = _SPECS[name]
    df = spec.fn(spark, SF_DIR)
    s_rows = [tuple(r) for r in df.collect()]
    s_cols = df.columns

    if spec.oracle is not None:
        # Driver-canonicalizer contract: the external harness sorts and
        # hashes result values with pandas, which cannot hash lists /
        # dicts — every oracle-checked query must emit scalar-only
        # top-level columns (stringify or explode arrays instead).
        from pyspark.sql import types as T

        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        assert not bad, (
            f"{name}: non-scalar top-level columns {bad} break the "
            "driver's pandas canonicalizer"
        )

    if spec.oracle is None:
        # No assertion-free queries: a no-oracle registration must
        # ship a bounded checker above or this fails loudly.
        chk = _BOUND_CHECKS.get(name)
        assert chk is not None, f"{name}: rows-only query without a bound check"
        chk(duck, s_cols, s_rows)
        return

    res = duck.execute(spec.oracle)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} (spark) != {len(d_rows)} (duckdb)"
    )
    _, s_norm = _norm_rows(s_cols, s_rows)
    _, d_norm = _norm_rows(d_cols, d_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


@pytest.mark.parametrize(
    "name", sorted(n for n, s in _SPECS.items() if s.oracle is not None)
)
def test_oracle_types_match_spark(name, spark, duck):
    """Driver-hash type parity (r6 verdict #1): the external harness
    hashes values via pandas, where a DuckDB HUGEINT (uncast sum())
    renders float64 against Spark's int64 — identical values, red
    hash. fetchall() converts HUGEINT to Python int, so the value
    test above can NEVER catch this; this test checks the oracle's
    arrow schema against Spark's analyzed schema instead. The oracle
    side is LIMIT 0 (never executed); the Spark side is analysis-only
    for batch queries, but q_stream_* fns DO run their stream to the
    memory sink before .schema is readable — accepted cost (sf0.001,
    sub-second each): streaming fixed-point display rounding was a
    real cross-engine divergence class this test exists to catch."""
    import pyarrow as pa
    from pyspark.sql import types as T

    spec = _SPECS[name]
    s_types = {f.name: f.dataType for f in spec.fn(spark, SF_DIR).schema.fields}
    d_schema = duck.execute(
        f"SELECT * FROM ({spec.oracle}) oracle_q LIMIT 0"
    ).fetch_arrow_table().schema
    for field in d_schema:
        st = s_types.get(field.name)
        if st is None:
            continue  # column-name parity is the value test's job
        at = field.type
        bad = None
        if isinstance(
            st, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ) and not pa.types.is_integer(at):
            bad = "integral"
        elif isinstance(st, (T.FloatType, T.DoubleType)) and not pa.types.is_floating(
            at
        ):
            bad = "floating"
        elif isinstance(st, T.BooleanType) and not pa.types.is_boolean(at):
            bad = "boolean"
        elif isinstance(st, T.StringType) and not (
            pa.types.is_string(at) or pa.types.is_large_string(at)
        ):
            bad = "string"
        assert bad is None, (
            f"{name}.{field.name}: spark={st.simpleString()} but oracle "
            f"emits arrow {at} — driver's pandas hash will diverge "
            f"(CAST the oracle output AS {bad.upper()}-compatible type)"
        )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "question_id" in df.columns


def test_oracle_keys_subset():
    q = set(registry.queries())
    o = set(registry.oracles())
    assert o <= q
