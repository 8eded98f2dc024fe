"""Property tests for the chunking pipeline (SURVEY.md §5 item 4):

- sliding windows: starts form an arithmetic ladder; windows cover
  every token; every window is full-size except the tail; tails are
  never empty;
- merge-small fold: differential against a pure-Python twin of the
  reference's accumulate-consecutive-small-chunks loop
  (ref: document_processing_service.py:629-663).

One Spark round-trip per corpus (edge cases + seeded random docs);
hypothesis drives the merge differential with bounded examples.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from document_query_system_spark.operators.textpipe import (
    MIN_CHUNK_CHARS,
    STOPWORDS,
    WINDOW_SIZE,
    WINDOW_STEP,
    sliding_chunks,
)

WORDS = ["spark", "merge", "sort", "data", "the", "a", "join", "scan", "x"]


def _corpus() -> list[tuple[int, str]]:
    rng = random.Random(7)
    docs = [
        (0, ""),
        (1, "word"),
        (2, "the a the a"),  # all stopwords
        (3, " ".join(WORDS[:3] * (WINDOW_SIZE // 3))),  # exactly window-ish
        (4, " ".join(rng.choice(WORDS) for _ in range(WINDOW_SIZE + 1))),
        (5, "  double  spaces   here  "),
    ]
    docs += [
        (10 + i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 200))))
        for i in range(40)
    ]
    return docs


@pytest.fixture(scope="module")
def chunked(spark, tmp_path_factory):
    sf_dir = str(tmp_path_factory.mktemp("chunk_prop"))
    df = spark.createDataFrame(_corpus(), "doc_id LONG, text STRING")
    df.selectExpr(
        "doc_id", "text", "'en' AS lang", "'synth' AS source",
        "length(text) AS n_chars",
    ).write.parquet(f"{sf_dir}/documents.parquet")
    rows = sliding_chunks(spark, sf_dir).collect()
    toks = {
        d: [t for t in text.split(" ") if t and t not in STOPWORDS]
        for d, text in _corpus()
    }
    return rows, toks


def test_window_starts_are_ladder(chunked):
    rows, _ = chunked
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.chunk_pos)
    for doc_id, starts in by_doc.items():
        assert sorted(starts) == list(
            range(0, max(starts) + 1, WINDOW_STEP)
        ), f"doc {doc_id}"


def test_windows_cover_all_tokens(chunked):
    rows, toks = chunked
    for doc_id, tlist in toks.items():
        covered: set[int] = set()
        for r in rows:
            if r.doc_id == doc_id:
                covered.update(range(r.chunk_pos, r.chunk_pos + r.word_count))
        assert covered == set(range(len(tlist))), f"doc {doc_id}"


def test_window_contents_match_tokens(chunked):
    rows, toks = chunked
    for r in rows:
        expect = toks[r.doc_id][r.chunk_pos : r.chunk_pos + WINDOW_SIZE]
        assert r.content == " ".join(expect)
        assert r.word_count == len(expect)
        assert r.word_count > 0  # tails are never empty


def test_only_tail_windows_are_short(chunked):
    rows, toks = chunked
    for r in rows:
        n = len(toks[r.doc_id])
        if r.chunk_pos + WINDOW_SIZE <= n:
            assert r.word_count == WINDOW_SIZE


# ---------------------------------------------------------- merge fold


def _merge_py(chunks: list[str]) -> list[str]:
    """Pure-Python twin of the merge-consecutive-small-chunks fold
    (ref: document_processing_service.py:629-663): accumulate runs of
    chunks shorter than MIN_CHUNK_CHARS; a big chunk flushes the run
    (prepended) and stands alone."""
    out: list[str] = []
    buf: list[str] = []
    for c in chunks:
        if len(c) < MIN_CHUNK_CHARS:
            buf.append(c)
        else:
            if buf:
                out.append("\n\n".join(buf + [c]))
                buf = []
            else:
                out.append(c)
    if buf:
        out.append("\n\n".join(buf))
    return out


@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=2 * MIN_CHUNK_CHARS),
        min_size=1,
        max_size=12,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_small_differential(spark, chunks):
    """Spark's windowed gaps-and-islands merge == the reference's
    sequential fold, for arbitrary chunk streams."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(chunks)], "chunk_seq LONG, content STRING"
    )
    w = Window.orderBy("chunk_seq")
    small = F.length("content") < MIN_CHUNK_CHARS
    # Group id: a big chunk closes the group it joins; the NEXT chunk
    # after a big one starts a new group.
    prev_big = F.lag((~small).cast("int"), 1, 0).over(w)
    grp = F.sum(prev_big).over(w)
    merged = (
        df.withColumn("grp", grp)
        .groupBy("grp")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_seq", "content"))
                ).getField("content"),
                "\n\n",
            ).alias("content"),
            F.min("chunk_seq").alias("first_seq"),
        )
        .orderBy("first_seq")
    )
    got = [r.content for r in merged.collect()]
    assert got == _merge_py(list(chunks))
