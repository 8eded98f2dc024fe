"""Vector math + embedding + exact vector search (SURVEY.md §2.8
X13/X14, §2.3 J9, §7 Phase 4).

Cosine similarity is a pure SQL expression over array<double> — dot
product via zip_with + left-fold — so the whole search plan stays in
whole-stage codegen with zero Python in the hot path. The broadcast
side is always the (tiny) query set: the big vector table never
shuffles, and the plan is scan-bound at any scale.

The default embedder is the deterministic hashing bag-of-words
(SURVEY §7 Phase 4): token char-fold hash → one of DIM buckets →
count → L2 normalize. Deterministic ⇒ the DuckDB oracle can verify
the *entire* embed→search pipeline, not just the search half. The
sentence-transformers embedder (ref: embedding_generator.py:82-167)
has the same mapInPandas shape — see embed_pandas below, which also
serves as the Arrow-path implementation of the hashing embedder.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load, spread
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


@register(
    "q_l2_normalize",
    oracle="""
SELECT vec_id,
       round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))), 6) AS norm,
       round(embedding[1] / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                  CAST(embedding AS DOUBLE[]))), 6) AS e1_normalized
FROM embeddings
""",
)
def q_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13: L2 normalization as a SQL expression
    (ref: embedding_generator.py:76-80,102,146 — mean-pool + normalize,
    clamp(min=1e-9))."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    n = l2_norm(v)
    return emb.select(
        "vec_id",
        F.round(n, 6).alias("norm"),
        F.round(F.element_at(v, 1) / n, 6).alias("e1_normalized"),
    )


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


@register("q_vector_topk", oracle=_VECTOR_TOPK_SQL)
def q_vector_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9/X14/W2: exact top-k cosine search
    (ref: pinecone_manager.py:105-138; vectorizer.py:118-157) —
    broadcast query vectors ⨯ vector table, SQL cosine, window top-k.
    Ranking is on the *rounded* score (then match_id): candidates
    closer than 1e-6 in cosine are order-tied deterministically, so
    the plan is reproducible across engines and partitionings."""
    emb = load(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )
    c = emb.select(
        F.col("vec_id").alias("match_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("match_id"))
        .select(
            "query_id",
            "match_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (l2_norm(F.col("qv")) * l2_norm(F.col("cv"))),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK_K)
        .drop("rn")
    )


_FILTERED_TOPK_SQL = f"""
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE label = 2),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id, c.label,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))),
               6) AS cos_sim
  FROM q CROSS JOIN c
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, match_id, label, cos_sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rn
      FROM scored)
WHERE rn <= {_TOPK_K}
"""


@register("q_vector_topk_filtered", oracle=_FILTERED_TOPK_SQL)
def q_vector_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 with a metadata filter: top-k cosine restricted to one
    metadata partition (ref: vectorizer.py:159-176 — Pinecone
    filter={'document_id': {'$eq': ...}}). The filter is a plain
    column predicate applied BEFORE scoring, so it pushes into the
    Parquet scan — the engine-native form of a filtered vector query,
    and on the label-partitioned layout (SCALE.md) a partition prune."""
    emb = load(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )
    c = emb.filter(F.col("label") == 2).select(
        F.col("vec_id").alias("match_id"),
        "label",
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("match_id"))
        .select(
            "query_id",
            "match_id",
            "label",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (l2_norm(F.col("qv")) * l2_norm(F.col("cv"))),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK_K)
        .drop("rn")
    )


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


_EMBED_DOCS_ORACLE = (
    "SELECT e.id AS doc_id, t.i - 1 AS dim_idx, e.embedding[CAST(t.i AS INT)] AS val FROM "
    + embed_subquery_sql(
        "(SELECT doc_id, text FROM documents WHERE doc_id < 100)", "doc_id", "text"
    )
    + f" e CROSS JOIN generate_series(1, {DIM}) t(i)"
)


@register("q_embed_hash", oracle=_EMBED_DOCS_ORACLE)
def q_embed_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 (deterministic default): hashing bag-of-words document
    embedder, fully SQL-expressible so the oracle verifies the vectors
    themselves (SURVEY §7 Phase 4). The torch sentence-transformer
    path (ref: embedding_generator.py:49-74, MiniLM 384-dim) is the
    same plan shape with embed_pandas swapped in."""
    docs = spread(
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    return explode_dims(embed_df(docs, "text"), "doc_id", "embedding")


def _hash_embed_py(text: str) -> list[float]:
    """Python twin of embed_expr — exact same integer arithmetic, so
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


def embed_pandas(df: DataFrame, text_col: str = "text") -> DataFrame:
    """U1 Arrow path: mapInPandas embedder — the executor-side batch
    shape of the reference's encode loop (ref:
    embedding_generator.py:119-157, batch 32 + per-process model lock;
    here: one Arrow batch per call, model state would live in a
    module-level singleton per executor process)."""
    import pandas as pd

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["embedding"] = pdf[text_col].map(_hash_embed_py)
            yield pdf

    return df.mapInPandas(gen, schema=schema + ", embedding array<double>")


@register("q_embed_pandas", oracle=_EMBED_DOCS_ORACLE)
def q_embed_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 (Arrow path): the same embedding computed via mapInPandas —
    verifies the pandas-UDF plumbing (batch shape, schema, Arrow
    round-trip) against the same SQL oracle as q_embed_hash."""
    docs = spread(
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    return explode_dims(embed_pandas(docs), "doc_id", "embedding")


@register(
    "q_embed_quantize_int8",
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(greatest(-1.0, least(1.0, x)) * 127) AS BIGINT))
           AS q8
  FROM embeddings
)
SELECT vec_id, array_to_string(q8, ',') AS q8_sig,
       round(list_sum(list_transform(q8, v -> abs(CAST(v AS DOUBLE) / 127))), 4)
         AS l1_dequant
FROM q
""",
)
def q_embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric quantization of the embedding column (clamp to
    [-1,1], scale by 127) plus the dequantized L1 as the round-trip
    check — 4× storage reduction for the vector table, the standard
    move before the 100 TB index ships to serving. Pure column
    expressions; the quantized array is value-checked exactly."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    q8 = F.transform(
        v,
        lambda x: F.round(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), x)) * 127)
        .cast("long"),
    )
    s1 = emb.select("vec_id", q8.alias("q8"))
    l1 = F.aggregate(
        F.col("q8"), F.lit(0.0), lambda s, vv: s + F.abs(vv.cast("double") / 127)
    )
    # Integer array → comma-joined string: driver-canonicalizable and
    # formatting-stable across engines (no float stringification).
    return s1.select(
        "vec_id",
        F.array_join(
            F.transform(F.col("q8"), lambda x: x.cast("string")), ","
        ).alias("q8_sig"),
        F.round(l1, 4).alias("l1_dequant"),
    )


# ---------------------------------------------- optional torch path (U1)

_ST_MODEL = None  # per-executor-process singleton, lazily loaded


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


_GOLDEN_SEARCH_TOP_K = 3


def _golden_vector_search_sql() -> str:
    from ..operators.search import GOLDEN_QUESTIONS

    rows = ",\n      ".join(f"({i}, '{t}')" for i, t in GOLDEN_QUESTIONS)
    qv = embed_subquery_sql("questions", "question_id", "question_text")
    dv = embed_subquery_sql("documents", "doc_id", "text")
    return f"""
WITH questions(question_id, question_text) AS (VALUES
      {rows}),
qv AS (SELECT id AS question_id, embedding AS v FROM {qv}),
dv AS (SELECT id AS doc_id, embedding AS v FROM {dv}),
scored AS (
  SELECT qv.question_id, dv.doc_id,
         round(list_dot_product(qv.v, dv.v), 6) AS cos_sim
  FROM qv CROSS JOIN dv
)
SELECT question_id, doc_id, cos_sim
FROM (SELECT *, row_number() OVER (PARTITION BY question_id
                                   ORDER BY cos_sim DESC, doc_id) AS rn
      FROM scored)
WHERE rn <= {_GOLDEN_SEARCH_TOP_K}
"""


@register("q_golden_vector_search", oracle=_golden_vector_search_sql())
def q_golden_vector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full vector QA pipeline (ref: src/main.py:84-127 stages 4-6):
    embed questions + documents with the deterministic embedder,
    broadcast the question vectors, cosine top-3 per question. The
    embeddings are unit vectors, so cosine = dot — one fold per pair.
    BASELINE.md B2 analog, end-to-end oracle-checked."""
    from ..operators.search import questions_df

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    dv = embed_df(docs, "text", out_col="doc_v").select("doc_id", "doc_v")
    qv = F.broadcast(
        embed_df(
            questions_df(spark), "question_text", out_col="q_v"
        ).select("question_id", "q_v")
    )
    scored = dv.crossJoin(qv).select(
        "question_id",
        "doc_id",
        F.round(dot(F.col("q_v"), F.col("doc_v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("question_id").orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _GOLDEN_SEARCH_TOP_K)
        .drop("rn")
    )
