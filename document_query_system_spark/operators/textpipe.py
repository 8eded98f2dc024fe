"""The document chunking pipeline (SURVEY.md §2.5 W1/W6, §2.8 X7/X8,
§2.2 F8) — the reference's SmartTextChunker re-expressed as
declarative Spark.

Reference semantics (document_processing_service.py:539-689):
paragraph segmentation, sliding token windows (size 1000, step 800,
stopwords dropped), consecutive-small-chunk merge (< 100 chars). The
driver's synthetic documents are single-line word streams, so the
paragraph boundary here is the frequent token ' the ' and window
sizes are scaled down (50/40) — same operators, same shapes.

Scale shape: everything is per-document expression work — no shuffle
at all until the merge step's per-document window (partitioned by
doc_id, which is exactly how the table would be bucketed at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load, spread

WINDOW_SIZE = 50  # ref: chunk_size 1000 tokens (:542), scaled to synthetic docs
WINDOW_STEP = 40  # ref: overlap 200 → step 800 (:676)
MIN_CHUNK_CHARS = 100  # ref: min_chunk_size 100 (:548)
STOPWORDS = ("the", "a")  # ref: stopword drop before windowing (:549, 669)


def _tokens_nostop(text: Column) -> Column:
    stop = [F.lit(s) for s in STOPWORDS]
    return F.filter(
        F.split(text, " "),
        lambda t: (t != F.lit("")) & ~t.isin(*STOPWORDS),
    )


_TOKENS_NOSTOP_SQL = (
    "list_filter(string_split(text, ' '), t -> t <> '' AND t NOT IN ('the', 'a'))"
)


_SLIDING_SQL = f"""
WITH tok AS (
  SELECT doc_id, {_TOKENS_NOSTOP_SQL} AS toks FROM documents
),
st AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) = 0 THEN []
              ELSE generate_series(0,
                greatest(0, ((len(toks) - {WINDOW_SIZE} + {WINDOW_STEP} - 1) // {WINDOW_STEP}) * {WINDOW_STEP}),
                {WINDOW_STEP})
         END AS starts
  FROM tok
),
ex AS (
  SELECT doc_id, toks, unnest(starts) AS start FROM st
)
SELECT doc_id,
       printf('%d_w%d', doc_id, start) AS chunk_id,
       start AS chunk_pos,
       array_to_string(toks[start + 1 : start + {WINDOW_SIZE}], ' ') AS content,
       CAST(len(toks[start + 1 : start + {WINDOW_SIZE}]) AS BIGINT) AS word_count
FROM ex
"""


def sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: overlapping token windows (ref :665-689). Window starts are
    computed with integer arithmetic (`div` truncation guarded by
    greatest(0, ·) so both engines agree on short docs), then exploded —
    a narrow per-row fan-out, no shuffle."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    s1 = docs.select("doc_id", _tokens_nostop(F.col("text")).alias("toks"))
    last_start = F.greatest(
        F.lit(0),
        F.expr(
            f"((size(toks) - {WINDOW_SIZE} + {WINDOW_STEP} - 1) div {WINDOW_STEP})"
            f" * {WINDOW_STEP}"
        ),
    )
    # Empty token stream → no windows (not one empty window); found
    # by the chunker property tests on an all-stopword document.
    s2 = s1.select(
        "doc_id",
        "toks",
        F.when(F.size("toks") == 0, F.array().cast("array<int>"))
        .otherwise(F.sequence(F.lit(0), last_start, F.lit(WINDOW_STEP)))
        .alias("starts"),
    )
    ex = s2.select("doc_id", "toks", F.explode("starts").alias("start"))
    chunk = F.slice(F.col("toks"), F.col("start") + 1, WINDOW_SIZE)
    return ex.select(
        "doc_id",
        F.format_string("%d_w%d", F.col("doc_id"), F.col("start")).alias("chunk_id"),
        F.col("start").alias("chunk_pos"),
        F.array_join(chunk, " ").alias("content"),
        F.size(chunk).cast("long").alias("word_count"),
    )


@register(
    "q_udtf_sentences",
    oracle="""
WITH s AS (
  SELECT doc_id,
         unnest(string_split(text, '. ')) AS sentence,
         generate_subscripts(string_split(text, '. '), 1) - 1 AS seq
  FROM documents WHERE doc_id < 200
)
SELECT doc_id, CAST(seq AS INT) AS seq, sentence,
       CAST(length(sentence) AS BIGINT) AS n_chars
FROM s WHERE length(sentence) > 0
""",
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 via the Python UDTF API (Spark 4 @udtf): one document row in,
    N sentence rows out, with per-row Python logic in eval(). The
    lateral-join shape (``SELECT ... FROM docs, udtf(...)``) is the
    declared form of the extraction fan-out; Arrow-optimized since the
    registration enables it. Same semantics as the pure-SQL X8
    sentence split, which is what the oracle runs."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="seq int, sentence string, n_chars bigint")
    class SentenceSplit:
        def eval(self, text: str):
            for i, s in enumerate(text.split(". ")):
                if s:
                    yield i, s, len(s)

    spark.udtf.register("dqs_sentence_split", SentenceSplit)
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    docs.createOrReplaceTempView("dqs_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.seq, s.sentence, s.n_chars
        FROM dqs_docs_udtf d, LATERAL dqs_sentence_split(d.text) s
        """
    )


@register("q_sliding_chunks", oracle=_SLIDING_SQL)
def q_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/X9: sliding-window segmentation with stopword removal
    (ref: document_processing_service.py:665-689, params :542-548)."""
    return sliding_chunks(spark, sf_dir)


@register(
    "q_filter_chunk_type",
    oracle=f"""
WITH c AS ({_SLIDING_SQL})
SELECT doc_id, chunk_id, chunk_pos, word_count,
       CASE WHEN word_count < {WINDOW_SIZE} THEN 'tail'
            WHEN chunk_pos = 0 THEN 'head'
            ELSE 'body' END AS chunk_type
FROM c
WHERE CASE WHEN word_count < {WINDOW_SIZE} THEN 'tail'
           WHEN chunk_pos = 0 THEN 'head'
           ELSE 'body' END <> 'body'
""",
)
def q_filter_chunk_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: chunk-type classification + branch filter — the reference's
    section/paragraph/table grouping (ref :559-561) over derived
    chunks."""
    c = sliding_chunks(spark, sf_dir)
    ctype = (
        F.when(F.col("word_count") < WINDOW_SIZE, "tail")
        .when(F.col("chunk_pos") == 0, "head")
        .otherwise("body")
    )
    return (
        c.withColumn("chunk_type", ctype)
        .filter(F.col("chunk_type") != "body")
        .select("doc_id", "chunk_id", "chunk_pos", "word_count", "chunk_type")
    )


_SEGMENTS_SQL = """
WITH seg0 AS (
  SELECT doc_id, string_split(text, ' the ') AS segs FROM documents
),
seg AS (
  SELECT doc_id,
         unnest(list_transform(segs, (s, i) ->
                  struct_pack(chunk_seq := i - 1, content := s)),
                recursive := true)
  FROM seg0
)
"""


@register(
    "q_paragraph_explode",
    oracle=_SEGMENTS_SQL
    + """
SELECT doc_id, chunk_seq, content,
       CAST(length(content) AS BIGINT) AS n_chars
FROM seg
WHERE length(content) > 50
""",
)
def q_paragraph_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7/F5: paragraph segmentation + meaningful-paragraph filter
    (ref: split on '\\n\\n' :292,516; keep > 50 chars :295). The
    synthetic corpus is single-line, so the boundary token is ' the '."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    seg = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " the ")).alias("chunk_seq", "content"),
    )
    return seg.filter(F.length("content") > 50).select(
        "doc_id",
        "chunk_seq",
        "content",
        F.length("content").cast("long").alias("n_chars"),
    )


@register(
    "q_merge_small_chunks",
    oracle=_SEGMENTS_SQL
    + f"""
, flagged AS (
  SELECT doc_id, chunk_seq, content,
         CASE WHEN length(content) < {MIN_CHUNK_CHARS} THEN 1 ELSE 0 END AS is_small
  FROM seg
),
bounded AS (
  SELECT doc_id, chunk_seq, content, is_small,
         CASE WHEN is_small = 0
                OR coalesce(lag(is_small) OVER (PARTITION BY doc_id ORDER BY chunk_seq), 0) = 0
              THEN 1 ELSE 0 END AS boundary
  FROM flagged
),
grouped AS (
  SELECT doc_id, chunk_seq, content,
         sum(boundary) OVER (PARTITION BY doc_id ORDER BY chunk_seq
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM bounded
)
SELECT doc_id,
       CAST(grp AS BIGINT) AS merged_seq,
       CAST(min(chunk_seq) AS BIGINT) AS first_seq,
       string_agg(content, chr(10) || chr(10) ORDER BY chunk_seq) AS content,
       count(*) AS n_parts
FROM grouped
GROUP BY doc_id, grp
""",
)
def q_merge_small_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: consecutive-small-chunk merge (ref :629-663 — buffer runs of
    chunks < 100 chars, flush as one merged chunk). Sessionization:
    boundary flag → running sum over (doc_id, seq) forms group ids →
    group-concat in seq order. One shuffle, partitioned by doc_id."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    seg = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " the ")).alias("chunk_seq", "content"),
    )
    flagged = seg.withColumn(
        "is_small",
        F.when(F.length("content") < MIN_CHUNK_CHARS, 1).otherwise(0),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("chunk_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boundary = F.when(
        (F.col("is_small") == 0)
        | (F.coalesce(F.lag("is_small").over(Window.partitionBy("doc_id").orderBy("chunk_seq")), F.lit(0)) == 0),
        1,
    ).otherwise(0)
    grouped = flagged.withColumn("grp", F.sum(boundary).over(w))
    merged = grouped.groupBy("doc_id", "grp").agg(
        F.min("chunk_seq").cast("long").alias("first_seq"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_seq", "content"))),
                lambda s: s.content,
            ),
            "\n\n",
        ).alias("content"),
        F.count("*").alias("n_parts"),
    )
    return merged.select(
        "doc_id",
        F.col("grp").cast("long").alias("merged_seq"),
        "first_seq",
        "content",
        "n_parts",
    )


@register(
    "q_sentence_split",
    oracle="""
WITH s0 AS (
  SELECT doc_id, replace(text, ' the ', '. ') AS text2 FROM documents
),
s AS (
  SELECT doc_id,
         unnest(list_transform(string_split(text2, '. '), (t, i) ->
                  struct_pack(sentence_seq := i - 1, sentence := t)),
                recursive := true)
  FROM s0
)
SELECT doc_id, sentence_seq, sentence FROM s
WHERE length(sentence) > 0
""",
)
def q_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8: sentence tokenization by regex (documented divergence from
    the reference's NLTK punkt, ref :591 — SURVEY §2.8 X8). Sentence
    boundaries are synthesized by rewriting the paragraph token into
    '. ' first."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    s = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.replace(F.col("text"), F.lit(" the "), F.lit(". ")), "\\. ")
        ).alias("sentence_seq", "sentence"),
    )
    return s.filter(F.length("sentence") > 0)
