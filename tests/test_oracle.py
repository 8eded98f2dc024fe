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
        assert len(s_rows) >= 0  # rows-only smoke, mirrors driver's weak check
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
