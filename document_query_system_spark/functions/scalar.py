"""Scalar function batteries (SURVEY.md §2.8): date/time, math,
string, array, JSON, hashing.

Typing convention: where Spark and DuckDB return different widths for
the same function (year → int vs bigint, ceil → long vs double), both
sides cast explicitly to BIGINT so the driver's schema/value compare
agrees. Transcendentals (ln, sqrt) are rounded to 6 decimals — libm
implementations may differ in the last ULP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load


@register(
    "q_dedup_hash",
    oracle="""
SELECT md5(text)         AS content_md5,
       sha256(text)      AS content_sha256,
       min(doc_id)       AS keeper_doc_id,
       count(*)          AS n_copies
FROM documents
GROUP BY md5(text), sha256(text)
""",
)
def q_dedup_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/X11/A6: content-addressed dedup — SHA-256 of payload +
    md5 cache key, first-writer kept
    (ref: ingestion_service.py:92-106, hit path :294-299)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            F.md5("text").alias("content_md5"),
            F.sha2("text", 256).alias("content_sha256"),
            "doc_id",
        )
        .groupBy("content_md5", "content_sha256")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


@register(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT)                 AS order_year,
       CAST(month(o_orderdate) AS BIGINT)                AS order_month,
       CAST(date_trunc('month', o_orderdate) AS DATE)    AS month_start,
       CAST(o_orderdate AS DATE) + 30                    AS ship_by,
       CAST(date_diff('day', DATE '1995-01-01',
                      CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch95
FROM orders
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10: timestamp/date arithmetic — the reference's now()/isoformat
    stamps and cache-expiry date math (ref: ingestion_service.py:339,426;
    vectorizer.py:70)."""
    o = load(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.date_add(od, 30).alias("ship_by"),
        F.datediff(od, F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch95"),
    )


@register(
    "q_math_funcs",
    oracle="""
SELECT p_partkey,
       pow(2.0, p_size % 10)                          AS pow2,
       greatest(p_size, 25)                           AS clamped_size,
       round(sqrt(p_size), 6)                         AS sqrt_size,
       round(ln(p_retailprice), 6)                    AS ln_price,
       abs(p_retailprice - 1000.0)                    AS abs_dev,
       CAST(ceil(p_retailprice / 100.0) AS BIGINT)    AS price_bucket
FROM part
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12: math battery — exponential backoff pow(2,n)
    (ref: ingestion_service.py:264), clamp via greatest
    (ref: embedding_generator.py:80 clamp(min=1e-9)), bucketing."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.pow(F.lit(2.0), F.col("p_size") % 10).alias("pow2"),
        F.greatest("p_size", F.lit(25)).alias("clamped_size"),
        F.round(F.sqrt("p_size"), 6).alias("sqrt_size"),
        F.round(F.log("p_retailprice"), 6).alias("ln_price"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("abs_dev"),
        F.ceil(F.col("p_retailprice") / 100.0).cast("long").alias("price_bucket"),
    )


@register(
    "q_string_funcs",
    oracle="""
SELECT doc_id,
       upper(substr(text, 1, 10))                    AS head_upper,
       replace(substr(text, 1, 20), ' ', '_')        AS head_snake,
       CAST(length(text) AS BIGINT)                  AS text_len,
       trim(' ' || substr(text, 1, 5) || ' ')        AS trimmed,
       concat_ws('|', lang, source)                  AS lang_source
FROM documents
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X4/X5: string battery — lower/strip/startswith and
    pipe-joining (ref: main.py:137; document_processing_service.py:323,
    360-365)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head_upper"),
        F.replace(
            F.substring("text", 1, 20), F.lit(" "), F.lit("_")
        ).alias("head_snake"),
        F.length("text").cast("long").alias("text_len"),
        F.trim(F.concat(F.lit(" "), F.substring("text", 1, 5), F.lit(" "))).alias(
            "trimmed"
        ),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
    )


@register(
    "q_regex_sections",
    oracle="""
SELECT doc_id,
       regexp_extract(text, '(join|merge|sort)', 1) AS first_op_kw
FROM documents
WHERE regexp_matches(text, 'join|merge|sort')
""",
)
def q_regex_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: regex match + capture-group extract — the reference's
    section-header patterns (ref: document_processing_service.py:311-316,
    329-340)."""
    d = load(spark, sf_dir, "documents")
    return d.filter(F.col("text").rlike("join|merge|sort")).select(
        "doc_id",
        F.regexp_extract("text", "(join|merge|sort)", 1).alias("first_op_kw"),
    )


@register(
    "q_array_funcs",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       (embedding[1:3])[1]            AS f1,
       (embedding[1:3])[2]            AS f2,
       (embedding[1:3])[3]            AS f3,
       embedding[1]                   AS e1,
       list_contains(embedding, 0.0)  AS has_zero
FROM embeddings
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X15: array ops — size/slice/element_at/contains
    (ref: pinecone_manager.py:76 zip; main.py:103 [:3] slicing).
    The slice result is projected to scalar columns (f1..f3) — the
    driver's canonicalizer cannot hash top-level array values."""
    e = load(spark, sf_dir, "embeddings")
    sl = F.slice("embedding", 1, 3)
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at(sl, 1).alias("f1"),
        F.element_at(sl, 2).alias("f2"),
        F.element_at(sl, 3).alias("f3"),
        F.element_at("embedding", 1).alias("e1"),
        F.array_contains("embedding", F.lit(0.0).cast("float")).alias("has_zero"),
    )


@register(
    "q_json_funcs",
    oracle="""
SELECT event_id,
       CAST(props->>'k' AS BIGINT) AS k_val,
       json_extract_string(props, '$.k') AS k_str
FROM events
""",
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X17: JSON extraction from the events.props payload
    (ref analog: document JSON serialization,
    document_processing_service.py:754-779)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.get_json_object("props", "$.k").alias("k_str"),
    )


@register(
    "q_variant_funcs",
    oracle="""
WITH j AS (
  SELECT doc_id,
         to_json(struct_pack(
           id   := doc_id,
           meta := struct_pack(lang := lang, source := source),
           dims := [n_chars, length(text)])) AS js
  FROM documents
)
SELECT doc_id,
       json_extract_string(js, '$.meta.lang')          AS lang_v,
       CAST(json_extract(js, '$.dims[0]') AS BIGINT)   AS nchars_v,
       CAST(NULL AS BIGINT)                            AS lang_as_int,
       CAST(NULL AS BIGINT)                            AS missing_v,
       TRUE                                            AS is_obj
FROM j
""",
)
def q_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X17+: the VARIANT semi-structured type (Spark 4) — the scale
    path for JSON payload columns: parse once into the binary variant
    encoding, then every ``variant_get`` is a typed path lookup with
    no re-parse (vs get_json_object re-parsing the string per
    extraction, the q_json_funcs shape). Exercises parse_json,
    variant_get (nested object + array-index paths), try_variant_get
    (type-mismatch → NULL, never an error), and schema_of_variant.
    Both engines round-trip the SAME struct through their native JSON
    encoding before extraction, so the check covers encode → parse →
    typed-path-extract end-to-end."""
    d = load(spark, sf_dir, "documents")
    v = F.parse_json(
        F.to_json(
            F.struct(
                F.col("doc_id").alias("id"),
                F.struct(F.col("lang"), F.col("source")).alias("meta"),
                F.array(F.col("n_chars"), F.length("text")).alias("dims"),
            )
        )
    )
    return d.select(
        "doc_id",
        F.variant_get(v, "$.meta.lang", "string").alias("lang_v"),
        F.variant_get(v, "$.dims[0]", "bigint").alias("nchars_v"),
        # 'en'/'de'/… never casts to a number: try_ yields NULL.
        F.try_variant_get(v, "$.meta.lang", "bigint").alias("lang_as_int"),
        # Absent path: NULL (for both variant_get and try_variant_get).
        F.try_variant_get(v, "$.nope", "bigint").alias("missing_v"),
        F.schema_of_variant(v).startswith("OBJECT").alias("is_obj"),
    )


@register(
    "q_map_funcs",
    oracle="""
WITH entries AS (
  SELECT doc_id,
         [struct_pack(k := 'lang',   v := lang),
          struct_pack(k := 'source', v := source),
          struct_pack(k := 'big',
                      v := CASE WHEN n_chars > 300 THEN 'y' END)] AS es
  FROM documents
),
kept AS (SELECT doc_id, list_filter(es, e -> e.v IS NOT NULL) AS ks FROM entries)
SELECT doc_id,
       array_to_string(list_sort(list_transform(ks, e -> e.k)), ',') AS kept_keys,
       CAST(len(ks) AS BIGINT)                 AS n_kept
FROM kept
""",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X16: map construction + null-dropping filter — the reference's
    metadata dict cleanup (ref: vector_engine/types.py:17-18, drop-None
    dict comprehension). Spark side uses a real MapType + map_filter;
    the oracle models the same semantics as an entry list (DuckDB has
    no map_filter)."""
    d = load(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"),
        F.col("lang"),
        F.lit("source"),
        F.col("source"),
        F.lit("big"),
        F.when(F.col("n_chars") > 300, F.lit("y")),
    )
    fm = F.map_filter(m, lambda _k, v: v.isNotNull())
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.map_keys(fm)), ",").alias("kept_keys"),
        F.size(fm).cast("long").alias("n_kept"),
    )


@register(
    "q_table_flatten",
    oracle="""
WITH t AS (
  SELECT doc_id,
         [[lang, source], [CAST(n_chars AS VARCHAR), substr(text, 1, 5)]] AS rows_
  FROM documents
)
SELECT doc_id,
       array_to_string(list_transform(rows_, r -> array_to_string(r, ' | ')),
                       chr(10)) AS flat_table,
       CAST(len(rows_) AS BIGINT) AS n_rows
FROM t
""",
)
def q_table_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/X5: nested table rows (array<array<string>>) flattened to
    pipe-joined lines (ref: document_processing_service.py:351-367
    _table_to_text — ' | '.join per row, newline-joined)."""
    d = load(spark, sf_dir, "documents")
    rows = F.array(
        F.array(F.col("lang"), F.col("source")),
        F.array(F.col("n_chars").cast("string"), F.substring("text", 1, 5)),
    )
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(rows, lambda r: F.array_join(r, " | ")), "\n"
        ).alias("flat_table"),
        F.size(rows).cast("long").alias("n_rows"),
    )


@register(
    "q_json_corrupt_tolerant",
    oracle="""
WITH raw AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN 'xx' || props
              ELSE props END AS payload
  FROM events
)
SELECT CAST(count(*) FILTER (json_valid(payload)) AS BIGINT)      AS n_valid,
       CAST(count(*) FILTER (NOT json_valid(payload)) AS BIGINT)  AS n_corrupt,
       CAST(sum(CASE WHEN json_valid(payload)
                     THEN CAST(payload->>'k' AS BIGINT) END) AS BIGINT) AS sum_k
FROM raw
""",
)
def q_json_corrupt_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record-tolerant JSON ingestion: a slice of payloads is
    deliberately mangled; from_json returns null for them
    (PERMISSIVE semantics) instead of failing the job — the
    engine-level form of the reference's catch-and-collect error model
    (ref: pipeline.py:13-21, errors list per stage). Valid and corrupt
    rows are counted and only valid payloads aggregate."""
    ev = load(spark, sf_dir, "events").select("event_id", "props")
    payload = F.when(
        F.col("event_id") % 7 == 0, F.concat(F.lit("xx"), F.col("props"))
    ).otherwise(F.col("props"))
    # PERMISSIVE from_json yields an all-null struct (not null) for
    # bad records; the documented detection channel is the
    # columnNameOfCorruptRecord field, which carries the raw payload
    # iff parsing failed.
    parsed = ev.select(
        F.from_json(
            payload,
            "k LONG, _corrupt_record STRING",
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("j"),
    )
    bad = F.col("j._corrupt_record").isNotNull()
    return parsed.agg(
        F.count(F.when(~bad, 1)).alias("n_valid"),
        F.count(F.when(bad, 1)).alias("n_corrupt"),
        F.sum(F.when(~bad, F.col("j.k"))).alias("sum_k"),
    )


@register(
    "q_bitwise_funcs",
    oracle="""
SELECT n_nationkey,
       CAST(n_nationkey & 12 AS BIGINT)  AS band,
       CAST(n_nationkey | 3 AS BIGINT)   AS bor,
       CAST(xor(n_nationkey, 21) AS BIGINT) AS bxor,
       CAST(n_nationkey << 2 AS BIGINT)  AS shl,
       CAST(n_nationkey >> 1 AS BIGINT)  AS shr,
       CAST(bit_count(n_nationkey) AS BIGINT) AS popcount
FROM nation
""",
)
def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function battery (and/or/xor, shifts, popcount) — the
    primitives the engine's Morton interleave (sources/layout.py),
    SimHash bands, and LSH bucket arithmetic build on, each checked
    against the oracle's operators on the same keys. Scan-local
    expressions only."""
    n = load(spark, sf_dir, "nation").select("n_nationkey")
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        k.bitwiseAND(12).cast("long").alias("band"),
        k.bitwiseOR(3).cast("long").alias("bor"),
        k.bitwiseXOR(21).cast("long").alias("bxor"),
        F.shiftleft(k, 2).cast("long").alias("shl"),
        F.shiftright(k, 1).cast("long").alias("shr"),
        F.bit_count(k).cast("long").alias("popcount"),
    )
