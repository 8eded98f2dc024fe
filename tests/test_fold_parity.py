"""Cross-implementation parity pins for the driver-side literal
fold-ins (r10): q_late_interaction and mmr_ann_pool_candidates compute
the QUESTION side of their probes in Python (so the probe keys become
plan-time literals / static partition filters), while the DOCUMENT
side runs the same arithmetic as Spark column expressions. The oracle
tests catch divergence on the golden data; these pin the folds
directly over a wider input space — including the non-ASCII range the
corpus could contain but the golden questions don't."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from document_query_system_spark.functions.hashing import MULT, P


def _py_tri_hashes(t: str) -> list[int]:
    return [
        ((ord(t[i]) * MULT + ord(t[i + 1])) % P * MULT + ord(t[i + 2])) % P
        for i in range(len(t) - 2)
    ]


def test_li_trigram_spark_fold_matches_python_twin(spark):
    """_li_tri_hashes (the doc-side Spark expression) must agree with
    the Python loop q_late_interaction uses for the literal question
    side — same fold, same guard for len<3 — across ASCII, digits,
    punctuation, accented Latin, and CJK (Spark's ascii() returns the
    Unicode code point of the first char, i.e. ord())."""
    from document_query_system_spark.operators.pipeline import _li_tri_hashes

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789éñüßαβγ日本語-_'#%"
    toks = ["", "a", "ab", "abc", "abcd", "héllo", "ñandú", "日本語テスト"]
    toks += [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(t,) for t in toks], "tok STRING").select(
        "tok", _li_tri_hashes(F.col("tok")).alias("h")
    )
    got = {}
    for r in df.collect():
        got.setdefault(r.tok, r.h)
    for t in set(toks):
        assert got[t] == _py_tri_hashes(t), repr(t)


def test_mmr_literal_buckets_match_spark_bucket_expr(spark):
    """The Python plane-sign fold in mmr_ann_pool_candidates (literal
    probe keys → static PartitionFilters) must reproduce the Spark
    _bucket_expr the stored LSH index was BUILT with, for every golden
    question — a one-sided divergence would silently drop the
    question's own bucket from the probe set."""
    from document_query_system_spark.functions.embed import (
        _hash_embed_py,
        embed_df,
    )
    from document_query_system_spark.operators.questions import (
        GOLDEN_QUESTIONS,
        questions_df,
    )
    from document_query_system_spark.operators.similarity import (
        N_PLANES,
        N_TABLES,
        PLANES,
        _bucket_expr,
    )

    q = embed_df(questions_df(spark), "question_text", out_col="q_v")
    spark_buckets = {
        r.question_id: r.bl
        for r in q.select(
            "question_id",
            F.array(
                *[_bucket_expr(F.col("q_v"), t) for t in range(N_TABLES)]
            ).alias("bl"),
        ).collect()
    }
    for qid, qtext in GOLDEN_QUESTIONS:
        q_v = _hash_embed_py(qtext)
        py_buckets = []
        for t in range(N_TABLES):
            b0 = 0
            for i, plane in enumerate(PLANES[t]):
                acc = 0.0
                for x, y in zip(q_v, plane):
                    acc += x * y
                if acc > 0:
                    b0 += 2 ** (N_PLANES - 1 - i)
            py_buckets.append(b0)
        assert py_buckets == list(spark_buckets[qid]), qid


def test_hash_embed_batch_matches_per_row_twin_corpus_wide():
    """_hash_embed_batch (the vectorized Arrow kernel, r10 verdict #4)
    must be BIT-identical to _hash_embed_py on every document of the
    sf0.01 corpus — the kernel's np.unique+round() scatter exists
    precisely so decimal rounding is the same correctly-rounded
    Python round() the per-row twin uses, never np.round's
    scale/rint/unscale approximation."""
    import pyarrow.parquet as pq

    from document_query_system_spark.functions.embed import (
        _hash_embed_batch,
        _hash_embed_py,
    )

    texts = (
        pq.read_table("/root/testdata/sf0.01/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    got = _hash_embed_batch(texts)
    assert len(got) == len(texts)
    for t, g in zip(texts, got):
        assert g == _hash_embed_py(t), t[:80]


def test_hash_embed_batch_matches_per_row_twin_adversarial():
    """Same pin over inputs the corpus may not exercise: empty text,
    whitespace runs, single repeated token (count == sqrt pressure),
    non-ASCII, and random token soup — plus cache-reuse across calls
    (the token memo must never change a result, only its cost)."""
    import random

    from document_query_system_spark.functions.embed import (
        _hash_embed_batch,
        _hash_embed_py,
    )

    rng = random.Random(11)
    vocab = ["alpha", "bê:ta", "γάμμα", "日本語", "x", "-", "word" * 30]
    cases = ["", " ", "   ", "a", "a a a a a a a a", "日本語 日本語 ñ"]
    cases += [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 200)))
        for _ in range(300)
    ]
    for got, t in zip(_hash_embed_batch(cases), cases):
        assert got == _hash_embed_py(t), t[:80]
    # Second call: every token now hits the memo — results identical.
    for got, t in zip(_hash_embed_batch(cases), cases):
        assert got == _hash_embed_py(t), t[:80]


def test_token_cache_trim_is_bounded_and_keeps_young_half():
    """The memo's eviction must be a bounded HALF-trim, oldest
    inserted first (r11 ADVICE: a wholesale clear() also evicted the
    Zipf-head tokens the memo exists for) — and trimming must never
    change results, only costs."""
    from document_query_system_spark.functions import embed as E

    cache = {f"t{i}": i for i in range(10)}
    E._trim_token_cache(cache)
    assert cache == {f"t{i}": i for i in range(5, 10)}
    # Parity under forced trims: shrink the cap so the batch kernel
    # trims mid-batch, and pin results against the per-row twin.
    texts = [" ".join(f"tok{j}" for j in range(i, i + 40)) for i in range(50)]
    old_max, old_cache = E._TOKEN_CACHE_MAX, dict(E._TOKEN_BUCKETS)
    E._TOKEN_CACHE_MAX = 64
    E._TOKEN_BUCKETS.clear()
    try:
        got = E._hash_embed_batch(texts)
        assert len(E._TOKEN_BUCKETS) <= 64 + 1  # trim keeps the bound
        for g, t in zip(got, texts):
            assert g == E._hash_embed_py(t)
    finally:
        E._TOKEN_CACHE_MAX = old_max
        E._TOKEN_BUCKETS.clear()
        E._TOKEN_BUCKETS.update(old_cache)
