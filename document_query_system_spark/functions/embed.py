"""Vector math + the deterministic embedder, in a module with NO
query registrations (the registered vector queries live in
functions/vector.py, which re-exports everything here).

Split out so early-rotation modules (the api facade, corpus-hygiene
operators) can use ``embed_df``/``dot`` without dragging vector.py's
seven already-driver-verified registrations into their registry
position — registration order is the driver's verification order.

Cosine similarity is a pure SQL expression over array<double> — dot
product via zip_with + left-fold — so search plans stay in
whole-stage codegen with zero Python in the hot path. The default
embedder is the deterministic hashing bag-of-words (SURVEY §7
Phase 4): token char-fold hash → one of DIM buckets → count → L2
normalize. Deterministic ⇒ the DuckDB oracle can verify the *entire*
embed→search pipeline, not just the search half. The
sentence-transformers embedder (ref: embedding_generator.py:82-167)
has the same mapInPandas shape — see embed_pandas, which also serves
as the Arrow-path implementation of the hashing embedder.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import P, MULT, token_hashes, token_hashes_sql

DIM = 64  # matches the driver embeddings table (FIXTURES.md: list<float>[64])


# ---------------------------------------------------------------- cosine

def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns — left fold, matching
    DuckDB's list_dot_product evaluation order (rounding at the
    consumer absorbs any residual last-ulp differences)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda s, p: s + p,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# ------------------------------------------------- deterministic embedder
#
# Staging discipline: each intermediate (token hashes → bucket counts
# → norm) is materialized as a real column in its own select, with a
# passthrough reference so Catalyst's CollapseProject won't inline a
# non-cheap alias into a lambda body (which would re-evaluate it once
# per array element — O(DIM·T) blowing up to O(DIM²·T) per row).
# The DuckDB oracle uses nested subqueries for the same reason.


def embed_df(df: DataFrame, text_col: str, out_col: str = "embedding") -> DataFrame:
    """Append a hashing bag-of-words embedding column (array<double>
    [DIM], L2-normalized, rounded to 6): token char-fold hash → bucket
    histogram → normalize. One pass per stage, per row."""
    keep = [c for c in df.columns]
    s1 = df.withColumn("__ths", token_hashes(F.col(text_col)))
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: F.size(
            F.filter(F.col("__ths"), lambda h: h % DIM == i.cast("long"))
        ).cast("double"),
    )
    s2 = s1.select(*keep, "__ths", counts.alias("__counts")).drop("__ths")
    nrm = F.sqrt(
        F.aggregate(F.col("__counts"), F.lit(0.0), lambda s, x: s + x * x)
    )
    s3 = s2.select(*keep, "__counts", nrm.alias("__nrm"))
    normalized = F.transform(
        F.col("__counts"),
        lambda x: F.round(
            F.when(F.col("__nrm") > 0, x / F.col("__nrm")).otherwise(F.lit(0.0)), 6
        ),
    )
    return s3.select(*keep, "__counts", "__nrm", normalized.alias(out_col)).drop(
        "__counts", "__nrm"
    )


def embed_subquery_sql(source: str, id_expr: str, text_expr: str) -> str:
    """DuckDB subquery producing (id, embedding) with the same staged
    evaluation — each intermediate is a column of an inner subquery so
    it is computed once per row."""
    ths = token_hashes_sql(text_expr)
    return f"""(
  SELECT id, list_transform(counts, x ->
           round(CASE WHEN nrm > 0 THEN x / nrm ELSE 0.0 END, 6)) AS embedding
  FROM (
    SELECT id, counts, sqrt(list_dot_product(counts, counts)) AS nrm
    FROM (
      SELECT id, list_transform(generate_series(0, {DIM - 1}),
               i -> CAST(len(list_filter(ths, h -> h % {DIM} = i)) AS DOUBLE)) AS counts
      FROM (SELECT {id_expr} AS id, {ths} AS ths FROM {source})
    )
  )
)"""


# Driver-facing shape: the vector is exploded to one row per
# dimension — (doc_id, dim_idx, val) — because the external harness's
# canonicalizer sorts/hashes pandas values and cannot hash Python
# lists. Exploding (rather than stringifying) also sidesteps
# float-to-string formatting divergence between engines; values stay
# doubles and hash exactly (they are rounded to 6 inside embed_df).


def explode_dims(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Explode vec_col (array<double>[DIM]) to (id, dim_idx, val) rows.

    Deliberately explodes a LITERAL index sequence and picks
    element_at(vec, i) AFTER the Generate, instead of
    posexplode(vec_col): InferFiltersFromGenerate infers
    ``size(child) > 0`` on the generator child, and predicate
    pushdown then substitutes the column's full defining expression
    into that filter — un-staging the embed pipeline (see the staging
    note above embed_df) into a single inlined tree whose norm is
    re-evaluated per element: O(DIM²·T) per row, measured 58 s for
    100 docs at DIM=64. With a literal sequence the inferred filter
    constant-folds away and vec_col flows through the Generate as a
    plain attribute, evaluated once per row (2.8 s same workload)."""
    return df.select(
        id_col,
        vec_col,
        F.posexplode(F.sequence(F.lit(0), F.lit(DIM - 1))).alias("dim_idx", "__i"),
    ).select(
        id_col,
        F.col("dim_idx").cast("long").alias("dim_idx"),
        F.element_at(vec_col, F.col("__i").cast("int") + 1).alias("val"),
    )


def _hash_embed_py(text: str) -> list[float]:
    """Python twin of embed_df — exact same integer arithmetic, so
    the Arrow path is bit-compatible with the SQL path."""
    counts = [0] * DIM
    for tok in text.split(" "):
        if not tok:
            continue
        h = 0
        for ch in tok:
            h = (h * MULT + ord(ch)) % P
        counts[h % DIM] += 1
    norm = sum(c * c for c in counts) ** 0.5  # exact: integer-valued floats
    if norm == 0:
        return [0.0] * DIM
    return [round(c / norm, 6) for c in counts]


# Per-process token→bucket memo for the batch kernel: corpus vocab is
# Zipfian, so the char-fold hash — the dominant cost of the per-row
# embedder — is computed once per TYPE instead of once per token
# occurrence. Bounded: when it would exceed _TOKEN_CACHE_MAX entries,
# the OLDEST-INSERTED half is evicted (dict preserves insertion
# order) instead of a wholesale clear — a full clear also evicted the
# Zipf-head tokens the memo exists for, causing a periodic full
# re-hash stall on open-vocabulary corpora (r11 ADVICE). Eviction is
# FIFO, not LRU (r12 ADVICE): hits do NOT refresh insertion order —
# a per-hit del+reinsert would tax the memo's hot path (every token
# occurrence) to optimize its cold one — so the FIRST trim after
# warm-up evicts the long-resident head tokens too; they re-hash
# once, re-insert at the young end, and only from the second trim
# cycle onward does the half-trim actually spare them. Still strictly
# better than a clear (half the misses per trim, stall amortized),
# and correctness is unaffected either way (a miss only costs the
# char fold).
_TOKEN_CACHE_MAX = 1 << 20
_TOKEN_BUCKETS: dict[str, int] = {}


def _trim_token_cache(cache: dict) -> None:
    """Drop the oldest-inserted half of the memo (bounded eviction —
    see the comment above)."""
    from itertools import islice

    for k in list(islice(iter(cache), len(cache) // 2)):
        del cache[k]


def _hash_embed_batch(texts) -> list[list[float]]:
    """Batch twin of _hash_embed_py over an iterable of strings —
    bit-identical by construction, vectorized where it matters
    (r10 verdict #4; the hash embedder stands in for a real encoder,
    so its throughput IS the B1 index-build number):

    - token→bucket via the memo above (same integer char fold on a
      miss — the arithmetic never changes, only how often it runs);
    - bucket histograms for the WHOLE batch in one np.bincount over
      row-offset bucket ids;
    - norms as exact int64 sum-of-squares (no float accumulation
      order to diverge) → np.sqrt. NOTE: the per-row twin's ** 0.5
      goes through libm pow(), which matches a correctly-rounded
      sqrt() only on libms that round pow correctly for the 0.5
      exponent (e.g. glibc >= 2.28) — the bit parity between the two
      paths is pinned EMPIRICALLY on this platform by
      tests/test_fold_parity.py, not guaranteed by the language;
    - decimal rounding: np.round's scale/rint/unscale can differ from
      Python's correctly-rounded round() in the last ulp, so round()
      runs on the batch's UNIQUE quotients (np.unique) and the
      results scatter back — bit-identical to the per-row path at a
      small fraction of the calls (distinct (count, norm) pairs per
      batch ≪ nonzero cells). Parity is pinned corpus-wide and on
      adversarial inputs by tests/test_fold_parity.py."""
    import numpy as np

    texts = list(texts)
    n = len(texts)
    if n == 0:
        return []
    cache = _TOKEN_BUCKETS
    row_ids: list[int] = []
    buckets: list[int] = []
    for i, text in enumerate(texts):
        for tok in text.split(" "):
            if not tok:
                continue
            b = cache.get(tok)
            if b is None:
                if len(cache) >= _TOKEN_CACHE_MAX:
                    _trim_token_cache(cache)
                h = 0
                for ch in tok:
                    h = (h * MULT + ord(ch)) % P
                b = h % DIM
                cache[tok] = b
            row_ids.append(i)
            buckets.append(b)
    counts = np.zeros((n, DIM), dtype=np.int64)
    if buckets:
        rid = np.asarray(row_ids, dtype=np.int64)
        bk = np.asarray(buckets, dtype=np.int64)
        counts = np.bincount(rid * DIM + bk, minlength=n * DIM).reshape(
            n, DIM
        )
    sumsq = (counts * counts).sum(axis=1)  # int64: exact, order-free
    norms = np.sqrt(sumsq.astype(np.float64))
    out = np.zeros((n, DIM), dtype=np.float64)
    rows, cols = counts.nonzero()
    if rows.size:
        q = counts[rows, cols] / norms[rows]  # IEEE divide == Python /
        uq, inv = np.unique(q, return_inverse=True)
        ur = np.fromiter(
            (round(float(x), 6) for x in uq), dtype=np.float64, count=uq.size
        )
        out[rows, cols] = ur[inv]
    return out.tolist()


def embed_pandas(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    keep: list[str] | None = None,
) -> DataFrame:
    """U1 Arrow path: mapInPandas embedder — the executor-side batch
    shape of the reference's encode loop (ref:
    embedding_generator.py:119-157, batch 32 + per-process model lock;
    here: one Arrow batch per call, model state would live in a
    module-level singleton per executor process).

    This is the engine's DEFAULT path for corpus-scale embedding
    (q_golden_vector_search's document leg, api.ensure_vector_index,
    the B1 index-build bench). Measured at the B1 workload (100k docs,
    sf0.1 × 20 replicas, local[32]): 77k docs/s vs 4k docs/s for the
    embed_df SQL fold — 19×. The kernel itself is the batched
    _hash_embed_batch (r10 verdict #4): token-memoized hashing + one
    bincount per Arrow batch + unique-quotient rounding, measured
    3.3× the per-row map at the sf0.1 text profile, bit-identical by
    tests/test_fold_parity.py. The SQL fold produces NO whole-stage
    codegen unit at all (probed r10: higher-order functions are
    CodegenFallback, so Spark excludes the embed Projects from every
    WholeStageCodegen span) and therefore runs on the interpreted
    expression path, whose throughput is allocation-heavy and
    JVM-profile-sensitive — the r9 driver artifact showed the same
    plan at 1.9 s pre-suite and 16 s in-suite. The Arrow path's cost
    lives in reused Python workers and is immune to that class.
    embed_df stays the oracle-verifiable twin (bit-identical by
    construction; q_embed_hash/q_embed_pandas share one oracle).

    ``keep`` prunes the RETURN leg: Spark's column pruning cannot
    reach inside mapInPandas, so without it the text column rides the
    Arrow batch back to the JVM only to be dropped by the caller's
    select — avoidable transfer ≈ the corpus size on the index-build
    hot path (r10 review). Callers that only need (id, vector) pass
    keep=["doc_id"]; None preserves every input column (the
    append-a-column contract)."""
    import pandas as pd

    from ..session import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)
    out_fields = (
        list(df.schema.fields)
        if keep is None
        else [df.schema[name] for name in keep]
    )
    cols = [f.name for f in out_fields]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = _hash_embed_batch(pdf[text_col])
            yield out

    return df.mapInPandas(gen, schema=f"{schema}, {out_col} array<double>")


# ---------------------------------------------- optional torch path (U1)

import importlib.util

#: Probed once at import; module re-imports on executors, so a cluster
#: where only some nodes carry the model library would mis-route —
#: install uniformly (the reference has the same constraint: one model
#: per process, embedding_generator.py:49-72).
_HAS_ST = importlib.util.find_spec("sentence_transformers") is not None

_ST_MODEL = None  # per-executor-process singleton, lazily loaded


def embed_auto(df: DataFrame, text_col: str = "text") -> DataFrame:
    """U1 with automatic model routing: the real sentence-transformers
    encoder when installed, else the deterministic hashing embedder
    (identical mapInPandas shape, oracle-checkable output). The
    deterministic path stays the default test surface in codec-free
    environments like this sandbox."""
    if _HAS_ST:  # pragma: no cover - needs the library
        return embed_sentence_transformers(df, text_col)
    return embed_pandas(df, text_col)


def embed_sentence_transformers(
    df: DataFrame, text_col: str = "text", model_name: str = "all-MiniLM-L6-v2"
) -> DataFrame:
    """U1, real-model path (ref: embedding_generator.py:49-167 —
    MiniLM-L6-v2, 384-dim, batched encode under a process-wide lock).
    Identical mapInPandas shape to embed_pandas; the model is a
    module-level singleton per executor process (the executor analog
    of the reference's threading.Lock + cached model), Arrow batch ≈
    the reference's batch_size. sentence-transformers is not installed
    in this environment — the import guard raises a clear error and
    the deterministic hashing embedder remains the default engine
    path (SURVEY §7 Phase 4)."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        global _ST_MODEL
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "sentence-transformers is not installed; use embed_df/"
                "embed_pandas (deterministic hashing embedder) or install "
                "the model library on every executor"
            ) from exc
        if _ST_MODEL is None:  # pragma: no cover - needs the library
            _ST_MODEL = SentenceTransformer(model_name)
        for pdf in batches:  # pragma: no cover - needs the library
            pdf = pdf.copy()
            vecs = _ST_MODEL.encode(
                list(pdf[text_col]), normalize_embeddings=True
            )
            pdf["embedding"] = [[float(x) for x in v] for v in vecs]
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    return df.mapInPandas(gen, schema=schema + ", embedding array<double>")


# Exact-top-k oracle SQL lives here (registration-free) so prefix
# modules can cite it without importing functions/vector.py — whose
# REGISTRATIONS would otherwise ride into the driver-coverage prefix
# (registry._load_all order note).
_TOPK_K = 5  # ref: src/main.py:97 — top_k=5 vector search

_VECTOR_TOPK_SQL = f"""
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))),
               6) AS cos_sim
  FROM q CROSS JOIN c
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, match_id, cos_sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rn
      FROM scored)
WHERE rn <= {_TOPK_K}
"""
