"""Physical-layout claims behind sources/layout.py: the oracle test
proves compaction and Z-ordering preserve CONTENT; these prove the
layouts themselves — file count collapses to the size target, and the
Z-ordered files hold tight per-file min/max ranges on BOTH cluster
columns (what makes parquet row-group pruning work for either
predicate, where a single-column sort helps one and ruins the
other)."""

from __future__ import annotations

import pyarrow.parquet as pq

from conftest import SF_DIR

from document_query_system_spark.sources.layout import (
    _COMPACT_TARGET_BYTES,
    _FRAG_FILES,
    _Z_FILES,
    _ensure_fragmented_docs,
    ensure_compacted_docs,
    ensure_zordered_lineitem,
)


def _data_files(spark, path):
    df = spark.read.parquet(path)
    return [f.removeprefix("file:") for f in df.inputFiles()]


def test_compaction_collapses_file_count(spark):
    import math
    import os

    frag = _ensure_fragmented_docs(spark, SF_DIR)
    out = ensure_compacted_docs(spark, SF_DIR)
    frag_files = _data_files(spark, frag)
    out_files = _data_files(spark, out)
    assert len(frag_files) == _FRAG_FILES
    total = sum(os.path.getsize(f) for f in frag_files)
    assert len(out_files) == max(1, math.ceil(total / _COMPACT_TARGET_BYTES))
    assert len(out_files) < len(frag_files)


def _per_file_ranges(files, col):
    spans = []
    lo_g, hi_g = None, None
    for f in files:
        t = pq.read_table(f, columns=[col])[col]
        lo, hi = min(t.to_pylist()), max(t.to_pylist())
        spans.append(hi - lo)
        lo_g = lo if lo_g is None else min(lo_g, lo)
        hi_g = hi if hi_g is None else max(hi_g, hi)
    return sum(spans) / len(spans), (hi_g - lo_g)


def test_zorder_keeps_both_dimensions_tight(spark):
    path = ensure_zordered_lineitem(spark, SF_DIR)
    files = _data_files(spark, path)
    assert len(files) == _Z_FILES
    # Morton range partitioning: each file covers a contiguous slab of
    # the interleaved key, so BOTH dimensions' per-file spans shrink
    # well below the global span. (A single-column sort would give
    # ~1/files on that column and ~1.0 on the other.)
    ranges = {
        col: _per_file_ranges(files, col) for col in ("l_partkey", "l_suppkey")
    }
    for col, (avg_span, global_span) in ranges.items():
        assert avg_span < 0.7 * global_span, (col, avg_span, global_span)
    # and at least one of the two must be strongly clustered
    spans = {col: a / g for col, (a, g) in ranges.items()}
    assert min(spans.values()) < 0.45, spans


def test_ivf_layouts_partition_each_vector_exactly_once(spark):
    """Integrity of the two k-means-trained IVF serving layouts (r11):
    every vector lands in EXACTLY one cell directory (an IVF index
    that drops or duplicates a vector silently corrupts every recall
    number downstream), the cell ids are a subset of the stored
    centroid ids, the centroid count is bounded by IVF_CELLS (Lloyd
    dropout may shrink it), and each probe's literal cell set is a
    subset of the stored cells with |probe| = IVF_NPROBE per
    question/anchor."""
    import os

    from document_query_system_spark.api import (
        IVF_CELLS,
        IVF_NPROBE,
        ensure_embeddings_index_ivf,
        ensure_vector_index_ivf,
    )
    from document_query_system_spark.functions.vector import (
        _triplet_probe_literals,
    )
    from document_query_system_spark.operators.pipeline import (
        _ivf_probe_literals,
    )

    from document_query_system_spark.functions.vector import (
        _TRIPLET_NPROBE,
    )

    for ensure, probe, base_tbl, id_col, nprobe in (
        (ensure_vector_index_ivf, _ivf_probe_literals, "documents", "doc_id", IVF_NPROBE),
        (ensure_embeddings_index_ivf, _triplet_probe_literals, "embeddings", "vec_id", _TRIPLET_NPROBE),
    ):
        layout, cents_path = ensure(spark, SF_DIR)
        cents = {r.cid for r in spark.read.parquet(cents_path).collect()}
        assert 0 < len(cents) <= IVF_CELLS
        rows = spark.read.parquet(layout).select(id_col, "cell").collect()
        ids = [r[0] for r in rows]
        assert len(ids) == len(set(ids)), "a vector landed in two cells"
        base_n = spark.read.parquet(f"{SF_DIR}/{base_tbl}.parquet").count()
        assert len(ids) == base_n, "layout dropped vectors"
        cells_on_disk = {r.cell for r in rows}
        assert cells_on_disk <= cents
        # Physical partitioning: one directory per cell, nothing else.
        dirs = {
            d for d in os.listdir(layout) if d.startswith("cell=")
        }
        assert dirs == {f"cell={c}" for c in cells_on_disk}
        probe_rows, probe_cells = probe(spark, SF_DIR)
        assert set(probe_cells) <= cents
        per_key: dict = {}
        for row in probe_rows:
            per_key.setdefault(row[0], set()).add(row[-1])
        assert all(len(v) == nprobe for v in per_key.values())


def test_incremental_ivf_append_equals_rebuild(spark, duck):
    """The trained-IVF layout's delta path (pipeline.incremental_ivf —
    r12 registration pending, see its docstring): base-minus-batch ∪
    batch-assigned-to-STORED-centroids must equal the full-rebuild
    per-cell checksums the DuckDB oracle computes by retraining on
    the whole corpus — append ≡ rebuild while centroids are fixed."""
    from document_query_system_spark.operators.pipeline import (
        _inc_ivf_oracle,
        incremental_ivf,
    )

    got = sorted(
        tuple(r) for r in incremental_ivf(spark, SF_DIR).collect()
    )
    want = sorted(tuple(r) for r in duck.execute(_inc_ivf_oracle()).fetchall())
    assert got == want
