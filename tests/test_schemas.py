"""Schema authority checks: the declared StructTypes are what the
pipelines actually produce (SURVEY §1.1 — one module owns the
shapes; the reference's declared-vs-actual drift is the failure mode
this prevents)."""

from __future__ import annotations

from document_query_system_spark import schemas
from document_query_system_spark.api import run_query


def test_answer_schema_matches_api(spark):
    df = run_query(spark, "/root/testdata/sf0.001", method="keyword")
    declared = {(f.name, f.dataType.simpleString()) for f in schemas.ANSWER.fields}
    actual = {(f.name, f.dataType.simpleString()) for f in df.schema.fields}
    assert declared == actual


def test_chunk_schema_covers_extraction(spark):
    from document_query_system_spark.registry import queries

    df = queries()["q_extract_chunks"](spark, "/root/testdata/sf0.001")
    chunk_fields = {f.name for f in schemas.CHUNK.fields}
    assert {c for c in df.columns} <= chunk_fields | {"doc_id"}


def test_all_declared_schemas_are_valid():
    for name in ("DOCUMENT_RAW", "DOCUMENT", "CHUNK", "DOC_TABLE",
                 "EMBEDDING", "ANSWER"):
        st = getattr(schemas, name)
        assert len(st.fields) > 0
        assert len({f.name for f in st.fields}) == len(st.fields)


def test_driver_canonicalizer_contract(spark):
    """Every oracle-checked query must return SCALAR-only top-level
    columns: the external harness's canonicalizer sorts/hashes pandas
    values and cannot hash Python lists/dicts (the r1
    q_dedup_minhash_sig red row — an array<bigint> column — was
    exactly this class; it was fixed ad hoc by string-reshaping, this
    test closes the class). Arrays must be exploded to rows or joined
    to strings before registration."""
    from pyspark.sql import types as T

    from document_query_system_spark.registry import all_specs

    from conftest import SF_DIR

    complex_types = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
    offenders = []
    for name, spec in sorted(all_specs().items()):
        if spec.oracle is None:
            continue  # rows-only checks never reach the value hasher
        df = spec.fn(spark, SF_DIR)
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, complex_types)
        ]
        if bad:
            offenders.append((name, bad))
    assert offenders == []


def test_events_ts_span_matches_duckdb(spark, duck):
    """Canary for silent driver data-format changes on events.ts.

    Round 4 shipped red because the driver regenerated events.parquet
    with ts as TIMESTAMP(MICROS) while load() assumed raw INT64 nanos
    — a 30-day timeline silently collapsed to ~43 minutes and four
    green driver rows went red. This pins load()'s epoch-micros span
    to DuckDB's reading of the SAME file, so the next unit flip is a
    one-line test failure instead of a cross-round regression."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from document_query_system_spark.sources.tables import load

    lo, hi = (
        load(spark, SF_DIR, "events")
        .agg(
            F.unix_micros(F.min("ts")).alias("lo"),
            F.unix_micros(F.max("ts")).alias("hi"),
        )
        .first()
    )
    d_lo, d_hi = duck.sql(
        f"SELECT epoch_us(min(ts)), epoch_us(max(ts)) "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()
    assert (lo, hi) == (d_lo, d_hi)
    # And the span must be event-scale (days), not the collapsed
    # ~43 minutes the unit bug produced.
    assert hi - lo > 24 * 3600 * 1_000_000


def test_events_loader_handles_nanos_parquet(spark, duck, tmp_path):
    """The ns branch of events_ts_unit is dormant while the driver
    ships TIMESTAMP(MICROS); pin it with a synthetic TIMESTAMP(NANOS)
    file so a future flip back to nanos (the r1-r3 format) stays a
    no-op instead of a regression."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from document_query_system_spark.sources.tables import events_ts_unit, load

    base_us = 1_700_000_000_000_000  # epoch micros, well past 1970
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [base_us * 1000, (base_us + 5) * 1000, (base_us + 9) * 1000],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/events.parquet", store_schema=False)
    assert events_ts_unit(sf_dir) == "ns"
    lo, hi = (
        load(spark, sf_dir, "events")
        .agg(
            F.unix_micros(F.min("ts")).alias("lo"),
            F.unix_micros(F.max("ts")).alias("hi"),
        )
        .first()
    )
    d_lo, d_hi = duck.sql(
        f"SELECT epoch_us(min(ts)), epoch_us(max(ts)) "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    assert (lo, hi) == (d_lo, d_hi) == (base_us, base_us + 9)
