"""Training-data pipeline operators beyond dedup/sampling: PII
redaction, benchmark-contamination detection, domain-mix rebalancing,
boilerplate detection, and bloom-filter join prefiltering.

These are the corpus-hygiene passes a 100 TB pretraining pipeline
runs between raw ingestion and tokenization. Shapes:

- PII redaction / boilerplate keys: pure column expressions, scan-local.
- Contamination: posting-list equi-join on shingle hash against a
  *broadcast* eval-set side (the benchmark suite is tiny relative to
  the corpus) — shuffle ∝ matching shingles, never |train| × |eval|.
- Domain mix: one window per stratum ordered by a deterministic id
  hash — reproducible under repartition/retry like operators/sampling.
- Bloom prefilter: the sketch rides a 1-row broadcast cross join, so
  the big side is filtered executor-side before the exact semi-join —
  no driver collect, and the final answer stays exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import tokens, tokens_sql
from ..registry import register
from ..sources.tables import cluster_by_dirs, load, spread
from ..functions.hashing import (
    shingle_hashes as _shingle_hashes,
    shingle_hashes_sql as _shingle_hashes_sql,
    token_hashes,
    token_hashes_sql,
)

# ------------------------------------------------------------- PII redaction
#
# The synthetic corpus contains no PII, so the query *injects* a
# deterministic email + phone per document (derived from doc_id) and
# then redacts it — the redaction regexes run against real matches
# and the oracle verifies the exact redacted text. Patterns are kept
# in the RE2 ∩ java.util.regex common subset so both engines agree.

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"


@register(
    "q_pii_redact",
    oracle=f"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(raw, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                      '{_PHONE_RE}', '[PHONE]', 'g') AS redacted
FROM injected
""",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: count + mask emails and phone numbers with
    regexp_replace — scan-local column expressions, zero shuffles, so
    the pass costs one read of the corpus at any scale. (Real
    pipelines add SSNs, IBANs, IP addresses to the same chain.)"""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    s1 = docs.select("doc_id", raw.alias("raw"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("raw"), _EMAIL_RE, "[EMAIL]"),
        _PHONE_RE,
        "[PHONE]",
    )
    return s1.select(
        "doc_id",
        F.size(F.regexp_extract_all("raw", F.lit(_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("raw", F.lit(_PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        redacted.alias("redacted"),
    )


# ------------------------------------------------- benchmark contamination
#
# Eval set = every 97th document (stands in for a benchmark suite);
# a training document is contaminated if it shares any 3-token
# shingle with any eval document. At 100 TB the eval side is a few
# thousand benchmark items → its distinct-shingle set broadcasts,
# and the train side is one scan + explode with a broadcast semi-ish
# join — no all-pairs comparison anywhere.

_EVAL_MOD = 97

_CONTAM_SQL = f"""
WITH th AS (SELECT doc_id, {token_hashes_sql('text')} AS ths FROM documents),
sh AS (SELECT doc_id, list_distinct({_shingle_hashes_sql('ths')}) AS sset FROM th),
eval_sh AS (
  SELECT DISTINCT unnest(sset) AS shingle FROM sh WHERE doc_id % {_EVAL_MOD} = 0
),
train AS (
  SELECT doc_id, len(sset) AS n_shingles, unnest(sset) AS shingle
  FROM sh WHERE doc_id % {_EVAL_MOD} <> 0
)
SELECT t.doc_id,
       CAST(t.n_shingles AS BIGINT) AS n_shingles,
       CAST(count(*) AS BIGINT) AS n_shared,
       round(count(*) / CAST(t.n_shingles AS DOUBLE), 6) AS contamination
FROM train t JOIN eval_sh e ON t.shingle = e.shingle
GROUP BY t.doc_id, t.n_shingles
"""


@register("q_contamination_ngram", oracle=_CONTAM_SQL)
def q_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detector: per training doc, the number
    and fraction of its distinct 3-token shingles that appear in any
    eval-set document (doc_id % 97 == 0 stands in for the benchmark).
    Join is train-shingle → broadcast eval-shingle set."""
    # Staged per the embed_df discipline (functions/vector.py): ths
    # materializes ONCE per row before the shingle pass references it
    # 4× per shingle — the inline composition re-evaluates the whole
    # O(chars) token-hash fold per reference (measured 12× at sf0.1,
    # O(tokens²·chars) per row — a scale-killer at 100 TB).
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    ths = docs.select("doc_id", token_hashes(F.col("text")).alias("ths"))
    sh = ths.select(
        "doc_id",
        F.array_distinct(_shingle_hashes(F.col("ths"))).alias("sset"),
    )
    ev = F.broadcast(
        sh.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select(F.explode("sset").alias("shingle"))
        .distinct()
    )
    tr = (
        sh.filter(F.col("doc_id") % _EVAL_MOD != 0)
        .select("doc_id", F.size("sset").alias("n_shingles"), "sset")
        .select("doc_id", "n_shingles", F.explode("sset").alias("shingle"))
    )
    return (
        tr.join(ev, "shingle")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("*").alias("n_shared"))
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared") / F.col("n_shingles").cast("double"), 6
            ).alias("contamination"),
        )
    )


# ----------------------------------------------------------- domain mixing
#
# Rebalance the corpus to a target language mix with fixed quotas,
# selecting *which* documents deterministically (md5(doc_id) order)
# so the mix is reproducible run-to-run. One window per stratum —
# shuffle keyed on the stratum column, bounded output per stratum.

_MIX_QUOTA = {"en": 40, "de": 15, "es": 15, "fr": 15, "zh": 15}

_MIX_CASE = " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_QUOTA.items())


@register(
    "q_domain_mix",
    oracle=f"""
SELECT lang, doc_id
FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
WHERE rn <= CASE lang {_MIX_CASE} ELSE 0 END
""",
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language mix rebalancer: per-stratum quota selection in
    deterministic md5(doc_id) order — the reproducible 'take N_en
    English docs, N_de German docs, …' pass that fixes a corpus's
    language proportions before training."""
    d = load(spark, sf_dir, "documents").select("lang", "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    quota = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in _MIX_QUOTA.items()
        ],
        F.lit(0),
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= quota)
        .select("lang", "doc_id")
    )


# --------------------------------------------- temperature-scaled mixture
#
# The other half of mixture construction next to q_domain_mix's fixed
# quotas: temperature sampling (multilingual-BERT / XLM-R style —
# p_d ∝ share_d^(1/T) renormalized) upsamples tail domains and
# downsamples the head, with T the single knob every multilingual /
# multi-domain pretraining recipe exposes. Quotas are derived from
# the corpus itself (two tiny aggregates), selection is the same
# deterministic md5-order head as every sampling op here.

_MIX_T = 2.0  # temperature; 1/T = 0.5 → share^0.5 (sqrt flattening)
_MIX_SAMPLE = 200  # target mixed-sample size


@register(
    "q_temperature_mix",
    oracle=f"""
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
tot AS (SELECT sum(n) AS total FROM c),
w AS (
  -- integer micro-units: pow/div are IEEE-identical across engines,
  -- but SUMMING the weights is order-dependent in doubles — round
  -- each weight to 1e-12 and sum as BIGINT (registry conventions).
  SELECT source, n,
         CAST(round(pow(n / CAST(total AS DOUBLE), 1.0 / {_MIX_T}) * 1e12)
              AS BIGINT) AS wgt_u
  FROM c CROSS JOIN tot
),
q AS (
  SELECT source, n,
         CAST(floor({_MIX_SAMPLE} * wgt_u
                    / CAST((SELECT sum(wgt_u) FROM w) AS DOUBLE)) AS BIGINT)
           AS quota
  FROM w
),
r AS (
  SELECT d.source, d.doc_id, q.quota,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
           AS rn
  FROM documents d JOIN q USING (source)
)
SELECT source, doc_id, quota FROM r WHERE rn <= quota
""",
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture: per-source sampling quotas
    ∝ share^(1/T) renormalized to a fixed sample budget (T=2 — the
    sqrt flattening that upsamples tail sources), docs taken per
    source in reproducible md5(doc_id) order. floor() on the quota
    keeps the boundary integer-exact in both engines (IEEE sqrt /
    div / mul are correctly rounded, so the doubles agree bitwise).

    Plan: ONE per-source count aggregate, then both normalizers
    (total docs, total weight) are global windows over the
    ≤|sources|-row count table — a single SinglePartition exchange
    of a tiny table, instead of the aggregate-per-normalizer chain
    that recomputes the counts subtree per consumer. The only
    corpus-sized operations are one scan and one per-source rank
    window — identical shape to q_domain_mix, whose 100 TB notes
    apply unchanged. Weights sum as integer micro-units (order-free;
    a raw double sum across partitions could flip a floor()
    boundary)."""
    d = load(spark, sf_dir, "documents").select("source", "doc_id")
    c = d.groupBy("source").agg(F.count("*").alias("n"))
    wg = Window.partitionBy()  # global: the count table is ≤|sources| rows
    quota = F.broadcast(
        c.withColumn("total", F.sum("n").over(wg))
        .withColumn(
            "wgt_u",
            F.round(
                F.pow(F.col("n") / F.col("total").cast("double"), 1.0 / _MIX_T)
                * 1e12
            ).cast("long"),
        )
        .withColumn("sum_wgt_u", F.sum("wgt_u").over(wg))
        .select(
            "source",
            F.floor(
                _MIX_SAMPLE * F.col("wgt_u") / F.col("sum_wgt_u").cast("double")
            )
            .cast("long")
            .alias("quota"),
        )
    )
    rw = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        d.join(quota, "source")
        .withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") <= F.col("quota"))
        .select("source", "doc_id", "quota")
    )


# ------------------------------------------------------ boilerplate prefix
#
# Documents sharing an identical leading token run are boilerplate
# suspects (headers, license banners, templated intros). The key is
# md5 of the joined first-3-token prefix — a pure column expression —
# and the aggregate is one groupBy on that key.

_PREFIX_TOKENS = 3


@register(
    "q_boilerplate_prefix",
    oracle=f"""
WITH p AS (
  SELECT doc_id,
         md5(array_to_string({tokens_sql('text')}[1:{_PREFIX_TOKENS}], ' ')) AS prefix_key
  FROM documents
)
SELECT prefix_key,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id
FROM p
GROUP BY prefix_key
HAVING count(*) > 1
""",
)
def q_boilerplate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: group documents by the md5 of their
    first-3-token prefix and report groups of size > 1 (keep the min
    doc_id as the canonical representative). At scale: one scan +
    one groupBy on a 16-byte key."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    prefix = F.md5(
        F.array_join(F.slice(tokens(F.col("text")), 1, _PREFIX_TOKENS), " ")
    )
    return (
        docs.select("doc_id", prefix.alias("prefix_key"))
        .groupBy("prefix_key")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ------------------------------------------------------------ BM25 ranking
#
# The probabilistic-IR upgrade of the reference's keyword scorer
# (ref: src/main.py:137-145 counts matched words): tf-saturated,
# length-normalized, idf-weighted. Plan shape at 100 TB: one
# explode + groupBy builds the (doc, term, tf) posting table keyed
# by term; the query-term list and the per-term document frequencies
# are both tiny → broadcast; the only big shuffles are keyed on
# (doc, term) and (question, doc). Nothing is all-pairs.

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10


def _bm25_ctes() -> str:
    """CTE chain ``questions → ... → scored`` (question_id, doc_id,
    bm25) — shared by the q_bm25_topk oracle and the q_rrf_fusion
    oracle's keyword leg."""
    from .questions import question_values_sql

    return f"""
WITH {question_values_sql()},
tok AS (SELECT doc_id, {tokens_sql('lower(text)')} AS tk FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(len(tk)) AS avgdl FROM tok),
tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM tok)
  GROUP BY doc_id, dl, term
),
qt AS (
  SELECT DISTINCT question_id, term
  FROM (SELECT question_id,
               unnest(string_split(lower(question_text), ' ')) AS term
        FROM questions)
),
dfq AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
contrib AS (
  SELECT q.question_id, t.doc_id,
         round(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * t.tf * ({_BM25_K1} + 1)
               / (t.tf + {_BM25_K1} * (1 - {_BM25_B}
                                       + {_BM25_B} * t.dl / s.avgdl)), 6) AS w
  FROM tf t
  JOIN qt q USING (term) JOIN dfq d USING (term) CROSS JOIN stats s
),
scored AS (
  -- integer micro-unit sum: order-independent (the float sum of
  -- round-6 terms flipped the round-4 score at a boundary, sf0.001)
  SELECT question_id, doc_id,
         round(sum(CAST(round(w * 1000000, 0) AS BIGINT)) / 1000000.0, 4) AS bm25
  FROM contrib GROUP BY question_id, doc_id
)"""


def _bm25_oracle() -> str:
    return (
        _bm25_ctes()
        + f"""
SELECT question_id, doc_id, bm25
FROM (SELECT *, row_number() OVER (PARTITION BY question_id
                                   ORDER BY bm25 DESC, doc_id) AS rn
      FROM scored)
WHERE rn <= {_BM25_TOPK}
"""
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(question_id, doc_id, bm25) for every question-doc pair with at
    least one matching term — the pre-top-k BM25 table, shared by
    q_bm25_topk and the q_rrf_fusion / q_ndcg_eval keyword legs.

    Probes the STORED posting index (api.ensure_bm25_index) — the
    keyword twin of the vector-index rule: building the posting table
    is the one-time index lifecycle, not per-query work. The question
    terms are a driver-side constant, so term selection is an isin
    predicate PUSHED INTO the postings Parquet scan (term-sorted row
    groups skip on min/max), and the fan-out join broadcasts a
    pre-deduped local (question, term) relation.

    Shuffle budget (2): ① the df groupBy on term (one row per term —
    the r5 lesson: df via a count window sorted nearly the whole
    posting table) ② repartition(question_id), which the score
    groupBy AND the rank window both reuse (hash(question) satisfies
    ClusteredDistribution(question, doc), so neither adds an
    exchange). Measured at sf0.1: 3.45 s (r5 window) → 1.6 s
    (per-call posting build) → probe-only with the stored index.
    Skew note: a stopword's posting list lands in one reducer for ①'s
    partial-agg input — map-side combine bounds it at one row per
    (partition, term)."""
    from ..api import ensure_bm25_index
    from .questions import GOLDEN_QUESTIONS

    base = ensure_bm25_index(spark, sf_dir)
    stats = F.broadcast(spark.read.parquet(os.path.join(base, "stats")))
    pairs = sorted(
        {(qid, w) for qid, q in GOLDEN_QUESTIONS for w in q.lower().split()}
    )
    qt = spark.createDataFrame(pairs, "question_id INT, term STRING")
    terms = sorted({t for _, t in pairs})
    tfq = spark.read.parquet(os.path.join(base, "postings")).filter(
        F.col("term").isin(terms)
    )
    dfq = F.broadcast(tfq.groupBy("term").agg(F.count("*").alias("df")))
    tfq = tfq.join(dfq, "term")
    contrib = (
        tfq.join(F.broadcast(qt), "term")
        .crossJoin(stats)
        .select(
            "question_id",
            "doc_id",
            F.round(
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("tf")
                * (_BM25_K1 + 1)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                ),
                6,
            ).alias("w"),
        )
    )
    return (
        contrib.repartition("question_id")
        .groupBy("question_id", "doc_id")
        .agg(
            F.round(
                F.sum(F.round(F.col("w") * 1e6, 0).cast("long")) / F.lit(1e6), 4
            ).alias("bm25")
        )
    )


@register("q_bm25_topk", oracle=_bm25_oracle())
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 per golden question (k1=1.2, b=0.75). Per-term
    contributions are rounded to 6 before summing and the summed
    score to 4 before ranking, so ordering is engine-identical.
    Plan/scale notes live on _bm25_scored."""
    scored = _bm25_scored(spark, sf_dir)
    w_rank = Window.partitionBy("question_id").orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= _BM25_TOPK)
        .drop("rn")
    )


# ------------------------------------------- incremental BM25 maintenance

_INC_BM25_MOD = 17  # doc_id % 17 == 0 plays the incoming batch


def _inc_bm25_oracle() -> str:
    from .questions import question_values_sql

    return f"""
WITH {question_values_sql()},
tok AS (SELECT doc_id, {tokens_sql('lower(text)')} AS tk FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(tk) AS term FROM tok)
  GROUP BY doc_id, term
),
qt AS (
  SELECT DISTINCT unnest(string_split(lower(question_text), ' ')) AS term
  FROM questions
)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
FROM tf WHERE term IN (SELECT term FROM qt)
GROUP BY term
"""


@register("q_incremental_bm25", oracle=_inc_bm25_oracle())
def q_incremental_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental posting-index maintenance: the stored BM25 index
    (api.ensure_bm25_index) minus the incoming batch plays the
    'index as of yesterday'; the batch (doc_id % 17 == 0) pays
    tokenize→explode→count on ITS rows only; merged = base ∪ delta.
    Output: per question-term document frequency and total term
    frequency over the merged index — which the oracle computes from
    a FULL-corpus rebuild, proving delta-merge ≡ rebuild (the same
    equivalence q_dedup_incremental pins for MinHash state).

    Scale: the delta leg's cost tracks the BATCH (tokenize ∝ batch
    rows, the term filter prunes before its aggregate); the base leg
    is a term-pruned stored-index scan (In(term,…) pushdown); the
    merge is a unionByName the downstream per-term aggregate absorbs
    — no step ever re-tokenizes the indexed corpus."""
    from ..api import ensure_bm25_index
    from .questions import GOLDEN_QUESTIONS

    base_path = ensure_bm25_index(spark, sf_dir)
    terms = sorted(
        {w for _, q in GOLDEN_QUESTIONS for w in q.lower().split()}
    )
    base = (
        spark.read.parquet(os.path.join(base_path, "postings"))
        .filter(F.col("term").isin(terms))
        .filter(F.col("doc_id") % _INC_BM25_MOD != 0)
        .select("term", "doc_id", "tf")
    )
    batch = (
        spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
        .filter(F.col("doc_id") % _INC_BM25_MOD == 0)
    )
    delta = (
        batch.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    merged = base.unionByName(delta)
    return merged.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
    )


# ------------------------------------------ incremental LSH maintenance

_INC_LSH_MOD = 13  # doc_id % 13 == 0 plays the incoming batch


def _inc_lsh_oracle() -> str:
    from ..functions.embed import embed_subquery_sql
    from .similarity import N_TABLES, _bucket_list_sql

    dv = embed_subquery_sql("documents", "doc_id", "text")
    return f"""
WITH dv AS (SELECT id AS doc_id, embedding AS v FROM {dv}),
db AS (
  SELECT doc_id, v, t.i AS tbl, bl[CAST(t.i AS INT) + 1] AS bucket
  FROM (SELECT doc_id, v, {_bucket_list_sql('v')} AS bl FROM dv)
  CROSS JOIN generate_series(0, {N_TABLES - 1}) t(i)
)
SELECT CAST(tbl AS BIGINT) AS tbl, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(sum(CAST(round(v[1] * 1000000) AS BIGINT)) AS BIGINT) AS v1_micros
FROM db GROUP BY tbl, bucket
"""


@register("q_incremental_lsh", oracle=_inc_lsh_oracle())
def q_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the BUCKETED vector layout: the
    stored LSH index (api.ensure_vector_index_lsh) minus the incoming
    batch plays the 'index as of yesterday'; the batch (doc_id % 13
    == 0) pays embed→bucket→explode on ITS rows only; merged = base ∪
    delta. Output: per (table, bucket) doc count, id checksum, and a
    first-component vector checksum over the merged index — which the
    oracle computes from a FULL-corpus rebuild, proving delta-merge ≡
    rebuild for the ANN serving layout exactly as q_incremental_bm25
    does for the postings and q_dedup_incremental for MinHash state.

    Scale: the delta leg's cost tracks the BATCH (Arrow embed ∝ batch
    rows); the base leg is a stored-layout scan (at 100 TB, appending
    the delta's bucket rows into the partitioned directories — the
    same partitionBy write the builder uses — costs ∝ batch, and
    probes see the merged index with no rebuild)."""
    from ..api import ensure_vector_index_lsh
    from ..functions.embed import embed_pandas
    from .similarity import N_TABLES, _bucket_expr

    base = (
        spark.read.parquet(ensure_vector_index_lsh(spark, sf_dir))
        .filter(F.col("doc_id") % _INC_LSH_MOD != 0)
        .select("doc_id", "dv", "tbl", "bucket")
    )
    batch = spread(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    ).filter(F.col("doc_id") % _INC_LSH_MOD == 0)
    emb = embed_pandas(batch, "text", out_col="dv", keep=["doc_id"])
    buckets = F.array(
        *[_bucket_expr(F.col("dv"), t) for t in range(N_TABLES)]
    )
    delta = emb.select(
        "doc_id", "dv", F.posexplode(buckets).alias("tbl", "bucket")
    )
    merged = base.unionByName(delta)
    return merged.groupBy("tbl", "bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
        F.sum(
            F.round(F.element_at(F.col("dv"), 1) * 1_000_000).cast("long")
        ).cast("long").alias("v1_micros"),
    ).select(
        F.col("tbl").cast("long").alias("tbl"),
        F.col("bucket").cast("long").alias("bucket"),
        "n_docs",
        "id_sum",
        "v1_micros",
    )


def _inc_ivf_oracle(scaled: bool = False) -> str:
    """Full-rebuild oracle for incremental_ivf: train on the whole
    corpus (the stored layout's own training set), assign every doc,
    aggregate per cell — what the engine's base∪delta must equal.
    ``scaled=True`` trains greatest(16, ceil(sqrt(N))) cells — the
    corpus-adaptive geometry of ensure_vector_index_ivf_scaled — so
    the PROMOTED serving layout's delta path is rebuild-checked at
    its own cell count (r13 verdict #3), not just the fixed floor."""
    from ..api import IVF_CELLS
    from ..functions.embed import embed_subquery_sql
    from .clustering import kmeans_sql_rounds_ctes

    k = _IVF_CELLS_SQL_SCALED if scaled else IVF_CELLS
    dv = embed_subquery_sql("documents", "doc_id", "text")
    vx_body = f"""
  SELECT id AS vec_id, embedding AS x,
         list_dot_product(embedding, embedding) AS xx
  FROM (SELECT id, embedding FROM {dv})
"""
    return f"""
WITH {kmeans_sql_rounds_ctes(vx_body, k)}
SELECT CAST(cid AS BIGINT) AS cell,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(vec_id) AS BIGINT) AS id_sum,
       CAST(sum(CAST(round(x[1] * 1000000) AS BIGINT)) AS BIGINT) AS v1_micros
FROM a2 GROUP BY cid
"""


def _ivf_base_and_delta(
    spark: SparkSession, sf_dir: str, scaled: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Shared delta-path core for incremental_ivf (content proof) and
    append_ivf_delta (physical write): the stored layout minus the
    incoming batch as ``base``, and the batch embedded and assigned to
    the layout's STORED centroids as ``delta`` — the K-row centroid
    metadata rides the same broadcast one-row frame the trainer uses,
    so delta assignment is bit-identical to build assignment."""
    from ..api import ensure_vector_index_ivf, ensure_vector_index_ivf_scaled
    from ..functions.embed import dot, embed_pandas
    from .clustering import _assign, _cents_df

    if scaled:
        layout, cents_path, _cells = ensure_vector_index_ivf_scaled(
            spark, sf_dir
        )
    else:
        layout, cents_path = ensure_vector_index_ivf(spark, sf_dir)
    base = (
        spark.read.parquet(layout)
        .filter(F.col("doc_id") % _INC_LSH_MOD != 0)
        .select("doc_id", "dv", F.col("cell").cast("long").alias("cell"))
    )
    cents = [
        (int(r.cid), [float(v) for v in r.cv], float(r.cc))
        for r in spark.read.parquet(cents_path).collect()
    ]
    batch = spread(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    ).filter(F.col("doc_id") % _INC_LSH_MOD == 0)
    emb = embed_pandas(batch, "text", out_col="dv", keep=["doc_id"])
    vx = emb.select(
        F.col("doc_id").alias("vec_id"), F.col("dv").alias("x")
    ).withColumn("xx", dot(F.col("x"), F.col("x")))
    delta = _assign(vx, _cents_df(spark, cents)).select(
        F.col("vec_id").alias("doc_id"),
        F.col("x").alias("dv"),
        F.col("cid").cast("long").alias("cell"),
    )
    return base, delta


def _ivf_layout_stats_oracle() -> str:
    """Full-retrain oracle for ivf_layout_stats: train the scaled
    geometry from the corpus (the layout's own training set), count
    per cell, and summarize — what the engine's stored-layout scan
    must report. cells is re-derived via the corpus expression
    (greatest(16, ceil(sqrt(N)))), so the geometry columns are
    cross-engine-checked exactly like the serving oracle's."""
    from ..api import IVF_NPROBE_SCALED
    from ..functions.embed import embed_subquery_sql
    from .clustering import kmeans_sql_rounds_ctes

    dv = embed_subquery_sql("documents", "doc_id", "text")
    vx_body = f"""
  SELECT id AS vec_id, embedding AS x,
         list_dot_product(embedding, embedding) AS xx
  FROM (SELECT id, embedding FROM {dv})
"""
    return f"""
WITH {kmeans_sql_rounds_ctes(vx_body, _IVF_CELLS_SQL_SCALED)},
pc AS (SELECT cid, count(*) AS n FROM a2 GROUP BY cid)
SELECT CAST((SELECT count(*) FROM pc) AS BIGINT) AS cells_used,
       {_IVF_CELLS_SQL_SCALED} AS cells,
       CAST({IVF_NPROBE_SCALED} AS BIGINT) AS nprobe,
       round(CAST({IVF_NPROBE_SCALED} AS DOUBLE)
             / {_IVF_CELLS_SQL_SCALED}, 6) AS probe_fraction,
       CAST(sum(n) AS BIGINT) AS n_vecs,
       CAST(min(n) AS BIGINT) AS min_cell,
       CAST(max(n) AS BIGINT) AS max_cell,
       round(CAST(sum(n) AS DOUBLE)
             / (SELECT count(*) FROM pc), 2) AS avg_cell,
       round(CAST(max(n) AS DOUBLE) * (SELECT count(*) FROM pc)
             / sum(n), 4) AS imbalance
FROM pc
"""


def ivf_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-stats report for the PROMOTED scaled IVF serving layout
    (the vector analog of q_agg_index_stats, r14 library work): one
    summary row with the trained geometry (cells, serving nprobe, the
    probe read fraction the calibration bought) and the measured cell
    population spread (min/max/avg, imbalance = max/avg) — the number
    an operator watches between retrains, since append-only
    maintenance grows max_cell while the trained cell count stands
    still (api.ivf_retrain_due is the action rule; this is its
    dashboard). Everything derives from a groupBy(cell) count over
    the stored layout — one bounded aggregate, no vector bytes read
    (column pruning: only the cell partition column is touched).

    Scale: the per-cell count is a metadata-sized shuffle (≤cells
    rows after partial aggregation); at 5B vectors / 70k cells the
    report is still 70k longs → 1 row. Registration planned for r15
    (the r14 budget is zero); parity vs the full-retrain DuckDB
    oracle is pinned in tests/test_layout.py.

    Reference analog: describe_index_stats — the per-namespace vector
    counts the reference reads off Pinecone (ref:
    src/services/vector_engine/pinecone_manager.py:19-59), here
    computed from the engine's own stored layout."""
    from ..api import IVF_NPROBE_SCALED, ensure_vector_index_ivf_scaled

    layout, _cents, cells = ensure_vector_index_ivf_scaled(spark, sf_dir)
    pc = (
        spark.read.parquet(layout)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
    )
    return pc.agg(
        F.count("*").cast("long").alias("cells_used"),
        F.lit(cells).cast("long").alias("cells"),
        F.lit(IVF_NPROBE_SCALED).cast("long").alias("nprobe"),
        F.round(F.lit(float(IVF_NPROBE_SCALED)) / F.lit(cells), 6).alias(
            "probe_fraction"
        ),
        F.sum("n").cast("long").alias("n_vecs"),
        F.min("n").cast("long").alias("min_cell"),
        F.max("n").cast("long").alias("max_cell"),
        F.round(
            F.sum("n").cast("double") / F.count("*"), 2
        ).alias("avg_cell"),
        F.round(
            F.max("n").cast("double") * F.count("*") / F.sum("n"), 4
        ).alias("imbalance"),
    )


def append_ivf_delta(
    spark: SparkSession, sf_dir: str, scaled: bool = False
) -> str:
    """The PHYSICAL half of IVF incremental maintenance (r13 verdict
    #3 follow-through): incremental_ivf proves the merged CONTENT
    (base ∪ delta ≡ full rebuild, per-cell checksums); this one
    performs the actual LAYOUT WRITE a serving deployment runs per
    batch — the 'yesterday' snapshot written partitionBy(cell), then
    the centroid-assigned batch appended with mode('append') into the
    SAME cell-directory tree. Returns the layout path for
    verification (tests/test_layout.py reads it back and matches the
    per-cell checksums against incremental_ivf's).

    Scale: the append's cost is ∝ batch — after the repartition each
    task writes only the cell directories its rows land in; the base
    snapshot is untouched (parquet append adds files, never rewrites).
    Written to a TAGGED COPY, never the memoized serving layout:
    mutating that mid-session would silently change every downstream
    probe's stored input (the same isolation rule dir_tag enforces
    across corpora)."""
    from ..api import (
        IVF_CELLS,
        ensure_vector_index_ivf_scaled,
    )
    from ..sources.tmputil import dir_tag, tmp_path

    base, delta = _ivf_base_and_delta(spark, sf_dir, scaled)
    # Directory count for the write clustering (memoized ensure call —
    # the layout is already built by _ivf_base_and_delta above).
    cells = (
        ensure_vector_index_ivf_scaled(spark, sf_dir)[2]
        if scaled
        else IVF_CELLS
    )
    suffix = "_scaled" if scaled else ""
    path = tmp_path(f"vector_index_ivf_applied{suffix}", dir_tag(sf_dir))
    # Cluster rows by target directory before each partitioned write
    # (the LSH-layout lesson: without this every task writes a sliver
    # into every cell dir — file-count explosion at scale), with the
    # explicit cells count so the write parallelizes (cluster_by_dirs:
    # the keyless form AQE-coalesced to ONE write task).
    cluster_by_dirs(base, cells, "cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    cluster_by_dirs(delta, cells, "cell").write.mode("append").partitionBy(
        "cell"
    ).parquet(path)
    return path


def _ivf_cell_psi_oracle() -> str:
    """Full-retrain oracle for ivf_cell_psi: assign every doc with the
    trained centroids (a2), split base/batch on the same vec_id % 13
    rule the engine's delta path uses, and compute the smoothed PSI
    over the centroid domain — the engine's stored-layout histograms
    must reproduce it exactly (its base cells are build assignments,
    its delta cells broadcast-assigned to the same stored centroids)."""
    from ..functions.embed import embed_subquery_sql
    from .clustering import kmeans_sql_rounds_ctes

    dv = embed_subquery_sql("documents", "doc_id", "text")
    vx_body = f"""
  SELECT id AS vec_id, embedding AS x,
         list_dot_product(embedding, embedding) AS xx
  FROM (SELECT id, embedding FROM {dv})
"""
    return f"""
WITH {kmeans_sql_rounds_ctes(vx_body, _IVF_CELLS_SQL_SCALED)},
base AS (SELECT cid FROM a2 WHERE vec_id % {_INC_LSH_MOD} <> 0),
bat AS (SELECT cid FROM a2 WHERE vec_id % {_INC_LSH_MOD} = 0),
cent AS (SELECT cid FROM c1),
bh AS (SELECT cid, count(*) AS bn FROM base GROUP BY cid),
dh AS (SELECT cid, count(*) AS dn FROM bat GROUP BY cid),
pq AS (
  SELECT (coalesce(bn, 0) + 0.5)
           / ((SELECT count(*) FROM base)
              + 0.5 * (SELECT count(*) FROM cent)) AS p,
         (coalesce(dn, 0) + 0.5)
           / ((SELECT count(*) FROM bat)
              + 0.5 * (SELECT count(*) FROM cent)) AS q
  FROM cent LEFT JOIN bh USING (cid) LEFT JOIN dh USING (cid))
SELECT CAST((SELECT count(*) FROM cent) AS BIGINT) AS cells,
       CAST((SELECT count(*) FROM base) AS BIGINT) AS n_base,
       CAST((SELECT count(*) FROM bat) AS BIGINT) AS n_batch,
       round(sum((q - p) * ln(q / p)), 6) AS psi
FROM pq
"""


def ivf_cell_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-distribution drift between the trained IVF layout and an
    incoming batch — the DATA-drift half of the retrain policy
    (api.ivf_retrain_due is the SIZE half): PSI over the per-cell
    occupancy histograms, base = the stored scaled layout's build
    assignments, batch = the delta broadcast-assigned to the SAME
    stored centroids. A batch whose vectors no longer look like the
    training corpus piles into few cells — PSI crosses the standard
    0.25 alarm and the quantizer retrains even though
    ivf_cells_for(N) hasn't moved (the feature-store drift discipline
    of q_psi_drift, applied to the vector index itself; same +0.5
    smoothing over the centroid domain, so empty cells cannot blow up
    the log).

    Shape: two metadata-sized histograms (≤cells rows each, partial
    aggregation) joined over the K-row centroid table, one ≤cells-row
    PSI sum — the only corpus-scale work is the batch embed+assign
    the delta path pays anyway. Registration candidate for r15;
    parity vs the full-retrain oracle pinned in tests/test_layout.py.

    Reading the number: the 0.1/0.25 stability rules assume each
    cell's EXPECTED batch count is ≳10 — small batches inflate PSI
    through smoothing + sampling noise (measured on the same-corpus
    uniform slice: 0.69 at sf0.01's ~1.7 docs/cell, 0.17 at sf0.1's
    ~5.4). A production monitor gates the alarm on batch size (or
    accumulates batches until n_batch ≥ 10·cells) — at 5B vectors /
    70k cells that is a 700k-vector window, minutes of ingest."""
    from ..api import ensure_vector_index_ivf_scaled

    _layout, cents_path, _cells = ensure_vector_index_ivf_scaled(
        spark, sf_dir
    )
    base, delta = _ivf_base_and_delta(spark, sf_dir, scaled=True)
    return psi_report(spark, cents_path, base, delta)


def psi_report(
    spark: SparkSession, cents_path: str, base: DataFrame, delta: DataFrame
) -> DataFrame:
    """The PSI arithmetic of ivf_cell_psi as a reusable core (r14 —
    api.maintain_ivf_index's drift branch computes the same number
    against the PUBLISHED layout, so the tick and the registered-row
    candidate cannot drift apart): +0.5-smoothed occupancy histograms
    over the centroid domain for any two cell-assigned frames, one
    (cells, n_base, n_batch, psi) row out."""
    cent = (
        spark.read.parquet(cents_path)
        .select(F.col("cid").alias("cell"))
        .localCheckpoint(eager=False)
    )
    bh = (
        base.groupBy("cell")
        .agg(F.count("*").alias("bn"))
        .localCheckpoint(eager=False)
    )
    dh = (
        delta.groupBy("cell")
        .agg(F.count("*").alias("dn"))
        .localCheckpoint(eager=False)
    )
    # Totals off the checkpointed histograms: two bounded one-row
    # collects (≤cells longs summed), not a corpus recompute.
    k = cent.count()
    nb = bh.agg(F.sum("bn")).collect()[0][0] or 0
    nd = dh.agg(F.sum("dn")).collect()[0][0] or 0
    pq = (
        cent.join(F.broadcast(bh), "cell", "left")
        .join(F.broadcast(dh), "cell", "left")
        .select(
            (
                (F.coalesce(F.col("bn"), F.lit(0)) + 0.5)
                / F.lit(nb + 0.5 * k)
            ).alias("p"),
            (
                (F.coalesce(F.col("dn"), F.lit(0)) + 0.5)
                / F.lit(nd + 0.5 * k)
            ).alias("q"),
        )
    )
    return pq.coalesce(1).agg(
        F.lit(k).cast("long").alias("cells"),
        F.lit(nb).cast("long").alias("n_base"),
        F.lit(nd).cast("long").alias("n_batch"),
        F.round(
            F.sum((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))),
            6,
        ).alias("psi"),
    )


def delete_from_ivf(
    spark: SparkSession, layout_path: str, ids: DataFrame
) -> list[int]:
    """Targeted delete from a cell-partitioned IVF layout — the last
    CRUD verb of the index lifecycle (the reference delegates it to
    Pinecone's delete endpoint; here the engine owns it): find the
    cells that actually CONTAIN the victim ids (one semi-join over the
    layout, projecting the partition column + id only), then rewrite
    ONLY those cells with the victims anti-joined out (dynamic
    partition overwrite — the compact_ivf_cells machinery). Returns
    the rewritten cell ids.

    Scale: the locate pass reads (doc_id, cell) — two pruned columns —
    and the affected-cell list collected to the driver is bounded by
    min(|ids|, cells): each victim lives in exactly one cell
    (layout integrity pin), so a 1k-id delete touches ≤1k of the 70k
    cells at 5B vectors and the rewrite reads/writes only those cells'
    ~√N-row directories. A cell that becomes EMPTY cannot be rewritten
    by a dynamic overwrite (no rows → no partition in the output, so
    its stale files would survive and the delete would be SILENTLY
    INCOMPLETE) — emptied cells are detected from the survivor set
    (bounded: ≤|affected| cell ids) and their directories dropped
    explicitly, the local form of the segment-drop manifest update an
    object-store table runs. Pinned in tests/test_layout.py: deleting
    the appended batch restores the base snapshot's checksums exactly,
    untouched cells' files unrewritten, and a whole-cell delete leaves
    no stale directory."""
    victims = ids.select(F.col(ids.columns[0]).alias("doc_id"))
    layout = spark.read.parquet(layout_path)
    affected = [
        r.cell
        for r in layout.join(F.broadcast(victims), "doc_id", "semi")
        .select("cell")
        .distinct()
        .collect()
    ]
    if not affected:
        return affected
    survivors = (
        layout.filter(F.col("cell").isin(affected))
        .join(F.broadcast(victims), "doc_id", "anti")
        .localCheckpoint(eager=True)
    )
    surviving_cells = {
        r.cell for r in survivors.select("cell").distinct().collect()
    }
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        (
            # One write task per rewritten cell (cluster_by_dirs; the
            # keyless count let AQE coalesce this tiny shuffle to ONE
            # task writing every affected dir sequentially).
            cluster_by_dirs(survivors, len(affected), "cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(layout_path)
        )
    finally:
        spark.conf.set(mode_key, old)
    # Emptied cells never appear in the written data, so the dynamic
    # overwrite cannot touch their directories — drop them explicitly
    # or their stale files keep serving the deleted vectors.
    import shutil

    for cell in set(affected) - surviving_cells:
        d = os.path.join(layout_path, f"cell={cell}")
        if os.path.isdir(d):
            shutil.rmtree(d)
    return affected


def compact_ivf_cells(
    spark: SparkSession, layout_path: str, max_files_per_cell: int = 4
) -> list[int]:
    """Small-file compaction for an appended IVF layout (the
    maintenance op every segment-based vector store runs): each
    append_ivf_delta batch ADDS files to the cell directories it
    touches — after many batches a probe of one cell opens dozens of
    tiny parquet files and scan setup dominates read time. Flag cells
    whose file count exceeds ``max_files_per_cell``, rewrite ONLY
    those cells (dynamic partition overwrite — untouched cell
    directories are never rewritten), one file per compacted cell.
    Returns the flagged cell ids (empty = nothing to do).

    Scale: the flag pass is one listing of ≤cells directories
    (metadata-sized — cells ~ √N); the rewrite reads and writes only
    the flagged cells' rows (partition pruning pushes the isin(cell)
    into directory selection), each ~√N rows by the sizing rule. The
    flagged rows are eagerly localCheckpoint'd before the write —
    Spark refuses to overwrite a path it is concurrently reading, and
    the checkpoint bounds the staged bytes to exactly the flagged
    cells (on a cluster this is checkpoint-to-object-store, see
    SCALE.md known-deltas). Pinned in tests/test_layout.py: file
    count collapses to 1 per flagged cell, per-cell checksums
    byte-unchanged, untouched cells' files not rewritten."""
    flagged = []
    for d in os.listdir(layout_path):
        if not d.startswith("cell="):
            continue
        n_files = sum(
            1
            for f in os.listdir(os.path.join(layout_path, d))
            if f.endswith(".parquet")
        )
        if n_files > max_files_per_cell:
            flagged.append(int(d.split("=", 1)[1]))
    if not flagged:
        return flagged
    rows = (
        spark.read.parquet(layout_path)
        .filter(F.col("cell").isin(flagged))
        .localCheckpoint(eager=True)
    )
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        (
            # One write task per flagged cell (cluster_by_dirs; see
            # delete_from_ivf — same single-task AQE-coalesce trap).
            cluster_by_dirs(rows, len(flagged), "cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(layout_path)
        )
    finally:
        spark.conf.set(mode_key, old)
    return flagged


def stream_ivf_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF delta maintenance AS A STREAM — the composition a
    production vector store actually runs (the reference's polling
    ingestion loop feeding its batched Pinecone upsert, ref:
    ingestion_service.py:376-416 + pinecone_manager.py:61-103): new
    documents arrive on a landing directory, each micro-batch is
    embedded (Arrow), broadcast-assigned to the SCALED layout's
    STORED centroids, and physically appended into the
    cell-partitioned tree via foreachBatch — append_ivf_delta's write
    path, driven by Structured Streaming with availableNow + a
    restartable checkpoint. Returns the final applied layout's
    per-cell checksums, which must equal the FULL-REBUILD oracle
    (_inc_ivf_oracle(scaled=True)) whatever the micro-batch split:
    per-cell content is union-associative, so batch boundaries cannot
    show in the result (the q_stream_upsert_foreachbatch discipline,
    here for the vector index).

    Scale: per micro-batch cost ∝ batch (embed + K-row broadcast map
    + an append that touches only the cells the batch hits); the
    centroid list is collected ONCE (K rows — the bounded-collect
    class every IVF probe already documents) and reused across
    batches. maxFilesPerTrigger bounds per-batch work on a real
    landing dir. Registration candidate for r15; parity pinned in
    tests/test_layout.py."""
    import uuid as _uuid

    from ..api import ensure_vector_index_ivf_scaled
    from ..functions.embed import dot, embed_pandas
    from ..sources.tmputil import tmp_path
    from ..streaming.event_windows import _drain, _scoped_shuffle_partitions
    from .clustering import _assign, _cents_df

    layout, cents_path, _cells = ensure_vector_index_ivf_scaled(
        spark, sf_dir
    )
    cents = [
        (int(r.cid), [float(v) for v in r.cv], float(r.cc))
        for r in spark.read.parquet(cents_path).collect()
    ]
    run = _uuid.uuid4().hex[:8]
    # One-time landing-dir build: the incoming batch slice as FOUR
    # parquet files, drained two-per-trigger so availableNow takes TWO
    # micro-batches (the split-independence claim is exercised, not
    # vacuous — per-cell content is union-associative, so ANY split
    # yields the same checksums; two batches proves it at half the
    # per-batch engine overhead of four, the dominant cost of this
    # row at bench scale).
    landing = tmp_path(f"stream_ivf_landing_{run}")
    # No spread() here (r15 opt pass): the landing build writes the
    # RAW batch — the heavy per-row work (embed + assign) happens per
    # micro-batch inside apply_batch, which gets its parallelism from
    # the scan of the landing files — so a spread exchange feeding a
    # repartition(4) was two back-to-back shuffles doing one job.
    batch = load(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") % _INC_LSH_MOD == 0
    )
    batch.repartition(4).write.mode("overwrite").parquet(landing)
    # Yesterday's snapshot: the stored layout minus the batch, written
    # once (same leg as append_ivf_delta's).
    applied = tmp_path(f"stream_ivf_applied_{run}")
    (
        cluster_by_dirs(  # one write task per cell, not one for all
            spark.read.parquet(layout)
            .filter(F.col("doc_id") % _INC_LSH_MOD != 0)
            .select("doc_id", "dv", F.col("cell").cast("long").alias("cell")),
            _cells,
            "cell",
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(applied)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        emb = embed_pandas(batch_df, "text", out_col="dv", keep=["doc_id"])
        vx = emb.select(
            F.col("doc_id").alias("vec_id"), F.col("dv").alias("x")
        ).withColumn("xx", dot(F.col("x"), F.col("x")))
        delta = _assign(vx, _cents_df(spark, cents)).select(
            F.col("vec_id").alias("doc_id"),
            F.col("x").alias("dv"),
            F.col("cid").cast("long").alias("cell"),
        )
        (
            cluster_by_dirs(delta, _cells, "cell")
            .write.mode("append")
            .partitionBy("cell")
            .parquet(applied)
        )

    src = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "2")
        .parquet(landing)
    )
    with _scoped_shuffle_partitions(spark, "4"):
        q = (
            src.writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{applied}_ckpt")
            .start()
        )
        _drain(q)
    return (
        spark.read.parquet(applied)
        .groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum(
                F.round(F.element_at(F.col("dv"), 1) * 1_000_000).cast("long")
            )
            .cast("long")
            .alias("v1_micros"),
        )
        .select(
            F.col("cell").cast("long").alias("cell"),
            "n_docs",
            "id_sum",
            "v1_micros",
        )
    )


def incremental_ivf(
    spark: SparkSession, sf_dir: str, scaled: bool = False
) -> DataFrame:
    """Incremental maintenance of the TRAINED IVF layout — the vector
    serving layout's delta path, completing the index-lifecycle
    family next to q_incremental_lsh (buckets), q_incremental_bm25
    (postings), and q_dedup_incremental (MinHash state): the stored
    cell-partitioned index minus the incoming batch plays the 'index
    as of yesterday'; the batch (doc_id % 13 == 0) pays embed→assign
    on ITS rows only, assigned to the STORED centroids (the K-row
    metadata every IVF serving node keeps — collected bounded, ridden
    as the same broadcast one-row centroid frame the trainer uses, so
    delta assignment is bit-identical to build assignment); merged =
    base ∪ delta. Output: per-cell doc count, id checksum, and a
    first-component vector checksum — which the oracle computes from
    a FULL rebuild, proving append ≡ rebuild for the trained layout.

    ``scaled=True`` (r13 verdict #3) runs the same delta path against
    the PROMOTED serving layout — the corpus-adaptive geometry of
    ensure_vector_index_ivf_scaled that q_mmr_ivf_serving probes — so
    the production default's append path is exercised, not only the
    fixed-16 floor. Same broadcast-assign, same checksums; only the
    stored centroids (and so the cell space) differ.

    Scale: delta cost ∝ batch (Arrow embed + one broadcast map);
    appending the delta's rows into the cell directories is the same
    partitionBy write the builder uses, cost ∝ batch. The caveat a
    real deployment owns: appends hold CENTROIDS fixed — on drift the
    quantizer retrains and the layout rewrites. WHEN to retrain is
    now a stated rule, not a docstring wave: api.ivf_retrain_due
    (cheap count + constant compare) fires when ivf_cells_for(N_now)
    drifts ≥ IVF_RETRAIN_FACTOR from the trained cell count, and the
    rebuild is the same ensure_* builder under a fresh cells tag.

    Library-only this round (the r14 rotation budget is zero new
    registrations); oracle-parity pinned for BOTH geometries in
    tests/test_layout.py, driver row planned for r15."""
    base, delta = _ivf_base_and_delta(spark, sf_dir, scaled)
    merged = base.unionByName(delta)
    return (
        merged.groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum(
                F.round(F.element_at(F.col("dv"), 1) * 1_000_000).cast("long")
            )
            .cast("long")
            .alias("v1_micros"),
        )
        .select(F.col("cell").cast("long").alias("cell"), "n_docs", "id_sum", "v1_micros")
    )


# --------------------------------------------------- hybrid retrieval fusion
#
# Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of the
# two retrieval legs the engine already proves independently: BM25
# keyword ranks and embedding-cosine ranks. RRF is THE standard
# hybrid-retrieval combiner (every production RAG stack ships it)
# precisely because it fuses on ranks, not scores — no cross-leg
# score calibration, and rank arithmetic is integer-exact across
# engines, which also makes it cleanly oracle-checkable.

_RRF_K = 60  # the paper's constant: damps the head, keeps tail votes
_RRF_POOL = 20  # candidates taken from each leg before fusing
_RRF_TOPK = 10


def _rrf_oracle() -> str:
    from ..functions.embed import embed_subquery_sql

    qv = embed_subquery_sql("questions", "question_id", "question_text")
    dv = embed_subquery_sql("documents", "doc_id", "text")
    return (
        _bm25_ctes()
        + f""",
kw AS (
  SELECT question_id, doc_id, rk FROM (
    SELECT question_id, doc_id,
           row_number() OVER (PARTITION BY question_id
                              ORDER BY bm25 DESC, doc_id) AS rk
    FROM scored)
  WHERE rk <= {_RRF_POOL}
),
qv AS (SELECT id AS question_id, embedding AS v FROM {qv}),
dv AS (SELECT id AS doc_id, embedding AS v FROM {dv}),
vec AS (
  SELECT question_id, doc_id, rk FROM (
    SELECT question_id, doc_id,
           row_number() OVER (PARTITION BY question_id
                              ORDER BY cos_sim DESC, doc_id) AS rk
    FROM (SELECT qv.question_id, dv.doc_id,
                 round(list_dot_product(qv.v, dv.v), 6) AS cos_sim
          FROM qv CROSS JOIN dv))
  WHERE rk <= {_RRF_POOL}
),
fused AS (
  SELECT coalesce(k.question_id, v.question_id) AS question_id,
         coalesce(k.doc_id, v.doc_id) AS doc_id,
         round(coalesce(1.0 / ({_RRF_K} + k.rk), 0)
               + coalesce(1.0 / ({_RRF_K} + v.rk), 0), 6) AS rrf_score,
         CAST(coalesce(k.rk, 0) AS BIGINT) AS kw_rank,
         CAST(coalesce(v.rk, 0) AS BIGINT) AS vec_rank
  FROM kw k FULL OUTER JOIN vec v
    ON k.question_id = v.question_id AND k.doc_id = v.doc_id
)
SELECT question_id, doc_id, rrf_score, kw_rank, vec_rank
FROM (SELECT *, row_number() OVER (PARTITION BY question_id
                                   ORDER BY rrf_score DESC, doc_id) AS rn
      FROM fused)
WHERE rn <= {_RRF_TOPK}
"""
    )


@register("q_rrf_fusion", oracle=_rrf_oracle())
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 keyword
    leg and the embedding-cosine leg, top-10 per golden question with
    each source rank exposed (0 = the doc didn't make that leg's
    pool). score = Σ_legs 1/(60 + rank) over each leg's top-20,
    rounded to 6 before the final ranking; doc_id breaks score ties.

    Plan: the two legs are the proven q_bm25_topk / q_hybrid_rrf
    shapes (posting-table aggregation with broadcast question terms;
    broadcast question vectors probing the STORED vector index from
    ensure_vector_index — a retrieval query must never re-embed the
    corpus per question batch; at 100 TB that is a full compute pass
    per call, the r2/r4/r7 verdict finding). Each leg's per-question
    top-20 is a window over its (question)-partitioned score table,
    and the fusion is a full-outer join of two ≤|questions|·20-row
    sides — trivially small forever, whatever the corpus size. Rank
    arithmetic is integer; the only float, 1/(60+rank), takes one of
    40 fixed values."""
    from ..api import ensure_vector_index
    from ..functions.embed import dot, embed_df
    from .questions import questions_df

    kw_w = Window.partitionBy("question_id").orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )
    kw = (
        _bm25_scored(spark, sf_dir)
        .withColumn("rk", F.row_number().over(kw_w))
        .filter(F.col("rk") <= _RRF_POOL)
        .select("question_id", "doc_id", F.col("rk").alias("kw_rk"))
    )
    dv = (
        spark.read.parquet(ensure_vector_index(spark, sf_dir))
        .select("doc_id", F.col("dv").alias("doc_v"))
    )
    qv = F.broadcast(
        embed_df(questions_df(spark), "question_text", out_col="q_v").select(
            "question_id", "q_v"
        )
    )
    vec_w = Window.partitionBy("question_id").orderBy(
        F.desc("cos_sim"), F.asc("doc_id")
    )
    vec = (
        dv.crossJoin(qv)
        .select(
            "question_id",
            "doc_id",
            F.round(dot(F.col("q_v"), F.col("doc_v")), 6).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(vec_w))
        .filter(F.col("rk") <= _RRF_POOL)
        .select("question_id", "doc_id", F.col("rk").alias("vec_rk"))
    )
    fused = kw.join(vec, ["question_id", "doc_id"], "full_outer").select(
        "question_id",
        "doc_id",
        F.round(
            F.coalesce(1.0 / (_RRF_K + F.col("kw_rk")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("vec_rk")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
        F.coalesce(F.col("kw_rk"), F.lit(0)).cast("long").alias("kw_rank"),
        F.coalesce(F.col("vec_rk"), F.lit(0)).cast("long").alias("vec_rank"),
    )
    w_fin = Window.partitionBy("question_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rn", F.row_number().over(w_fin))
        .filter(F.col("rn") <= _RRF_TOPK)
        .drop("rn")
    )


# ------------------------------------------------------------- nDCG eval
#
# Graded ranking quality: nDCG@10 of the BM25 keyword ranking scored
# against vector-cosine pseudo-relevance (the exact semantic top-5
# graded 5..1) — the keyword-vs-semantic agreement report that
# complements q_rrf_fusion (which MERGES the legs) and
# q_ann_recall/q_dedup_tier_eval (the other eval harnesses).
#
# Determinism: the DCG discounts 1/log2(rank+1) are PRECOMPUTED in
# Python and injected as integer nano-unit literals in BOTH engines
# (log2 is a libm call with no cross-engine last-bit guarantee; ten
# precomputed integers sidestep it entirely). DCG is then a pure
# integer sum; every query has exactly 5 graded docs, so IDCG is one
# shared integer constant.

_NDCG_K = 10
_NDCG_GRADES = 5  # vector top-5 graded 5..1
_NDCG_DISC = tuple(
    round(1e9 / __import__("math").log2(i + 1)) for i in range(1, _NDCG_K + 1)
)
_NDCG_IDCG = sum(
    (_NDCG_GRADES - j) * _NDCG_DISC[j] for j in range(_NDCG_GRADES)
)


def _ndcg_oracle() -> str:
    from ..functions.embed import embed_subquery_sql

    qv = embed_subquery_sql("questions", "question_id", "question_text")
    dv = embed_subquery_sql("documents", "doc_id", "text")
    disc = ", ".join(str(d) for d in _NDCG_DISC)
    return (
        _bm25_ctes()
        + f""",
kw AS (
  SELECT question_id, doc_id, rk FROM (
    SELECT question_id, doc_id,
           row_number() OVER (PARTITION BY question_id
                              ORDER BY bm25 DESC, doc_id) AS rk
    FROM scored)
  WHERE rk <= {_NDCG_K}
),
qv AS (SELECT id AS question_id, embedding AS v FROM {qv}),
dv AS (SELECT id AS doc_id, embedding AS v FROM {dv}),
rel AS (
  SELECT question_id, doc_id, {_NDCG_GRADES + 1} - rk AS grade FROM (
    SELECT question_id, doc_id,
           row_number() OVER (PARTITION BY question_id
                              ORDER BY cos_sim DESC, doc_id) AS rk
    FROM (SELECT qv.question_id, dv.doc_id,
                 round(list_dot_product(qv.v, dv.v), 6) AS cos_sim
          FROM qv CROSS JOIN dv))
  WHERE rk <= {_NDCG_GRADES}
)
SELECT k.question_id,
       CAST(sum(coalesce(r.grade, 0) * ([{disc}])[k.rk]) AS BIGINT) AS dcg_nano,
       round(sum(coalesce(r.grade, 0) * ([{disc}])[k.rk])
             / {_NDCG_IDCG}.0, 6) AS ndcg
FROM kw k LEFT JOIN rel r
  ON r.question_id = k.question_id AND r.doc_id = k.doc_id
GROUP BY k.question_id
"""
    )


@register("q_ndcg_eval", oracle=_ndcg_oracle())
def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 per golden question: the BM25 ranking scored against
    vector-cosine pseudo-relevance (exact semantic top-5 graded
    5..1). Low nDCG = the keyword and semantic views disagree — the
    per-question signal for routing a query to hybrid retrieval.
    See the module comment above _NDCG_K (notably: log2 discounts
    are precomputed integer literals, so the whole metric is integer
    arithmetic until the final normalization).

    Plan: the two proven legs again (BM25 posting aggregation;
    broadcast question vectors probing the STORED vector index —
    grading against the index the engine actually serves, never a
    per-call corpus re-embed); the scorer joins two ≤|questions|·k-row
    tables and hash-aggregates per question — movement bounded by the
    question count forever."""
    from ..api import ensure_vector_index
    from ..functions.embed import dot, embed_df
    from .questions import questions_df

    kw_w = Window.partitionBy("question_id").orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )
    kw = (
        _bm25_scored(spark, sf_dir)
        .withColumn("rk", F.row_number().over(kw_w))
        .filter(F.col("rk") <= _NDCG_K)
        .select("question_id", "doc_id", "rk")
    )
    dv = (
        spark.read.parquet(ensure_vector_index(spark, sf_dir))
        .select("doc_id", F.col("dv").alias("doc_v"))
    )
    qv = F.broadcast(
        embed_df(questions_df(spark), "question_text", out_col="q_v").select(
            "question_id", "q_v"
        )
    )
    rel_w = Window.partitionBy("question_id").orderBy(
        F.desc("cos_sim"), F.asc("doc_id")
    )
    rel = (
        dv.crossJoin(qv)
        .select(
            "question_id",
            "doc_id",
            F.round(dot(F.col("q_v"), F.col("doc_v")), 6).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(rel_w))
        .filter(F.col("rk") <= _NDCG_GRADES)
        .select(
            "question_id",
            "doc_id",
            (F.lit(_NDCG_GRADES + 1) - F.col("rk")).alias("grade"),
        )
    )
    disc = F.array(*[F.lit(d).cast("long") for d in _NDCG_DISC])
    term = F.coalesce(F.col("grade"), F.lit(0)).cast("long") * F.element_at(
        disc, F.col("rk")
    )
    return (
        kw.join(rel, ["question_id", "doc_id"], "left")
        .groupBy("question_id")
        .agg(
            F.sum(term).cast("long").alias("dcg_nano"),
            F.round(F.sum(term) / float(_NDCG_IDCG), 6).alias("ndcg"),
        )
    )


# ------------------------------------------------------ bloom prefilter join
#
# The 100 TB pattern for "filter a huge fact table by a key set too
# big to broadcast as an exact list but small enough for a sketch":
# aggregate the key set into a bloom filter (a few hundred KB), embed
# it in the probe-side plan as a LITERAL bit array, prefilter the
# fact table scan-locally (no false negatives), then run the exact
# semi-join on the survivors. The final answer is exact — the bloom
# only cuts the semi-join's probe input — so the plain semi-join is a
# valid oracle.
#
# Spark's own bloom machinery (bloom_filter_agg / might_contain, the
# InjectRuntimeFilter rewrite) is internal-only SQL, so the sketch is
# built from public primitives: k xxhash64-seeded bit positions per
# key, folded per 64-bit word with bit_or. The packed words are
# collected to the driver (one bounded-size job over the already-
# filtered dim side — the same eager-subquery shape InjectRuntimeFilter
# plans internally) and re-emitted as a constant-folded array literal,
# because a sketch shipped via a 1-row broadcast cross join gets
# planned as a BroadcastNestedLoopJoin whose condition sits ABOVE the
# semi-join — filtering nothing (round-2 advisor finding). As a
# literal, the k bit tests are a plain scan-adjacent Filter on the
# fact side, below the join, where a prefilter must live.

_BLOOM_SEG = "BUILDING"
_BLOOM_BITS = 1 << 18  # 256 Kbit ≈ 4 K words; ~13 bits/key at sf1
_BLOOM_K = 3


def _bloom_positions(key, seed_base: int = 0):
    """k deterministic bit positions for a key column."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed_base + i)), F.lit(_BLOOM_BITS))
        for i in range(_BLOOM_K)
    ]


@register(
    "q_bloom_prefilter_join",
    oracle=f"""
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey
                AND c.c_mktsegment = '{_BLOOM_SEG}')
""",
)
def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join: orders restricted to customers in
    one market segment. The segment's key set is aggregated into a
    bloom bit array, built eagerly (one tiny job on the filtered dim
    side, collected to the driver — the bounded exception to the
    no-collect rule, ~32 KB) and embedded as a constant-folded literal
    so the k bit tests run as a scan-local Filter BELOW the exact
    semi-join (false positives removed by the semi-join, false
    negatives impossible), cutting the semi-join's probe input ~5×.
    Plan pinned in tests/test_plan_quality.py: no shuffle anywhere,
    one broadcast (the exact verify side), bit tests under the join."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == _BLOOM_SEG
    )
    pos = F.explode(F.array(*_bloom_positions(F.col("c_custkey")))).alias("pos")
    packed = (
        cust.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            # shiftleft's shift amount must be a column-valued
            # expression → SQL form (the pyspark wrapper takes int).
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    words = [0] * (_BLOOM_BITS // 64)
    for r in packed:
        words[r.word_idx] = r.bits
    # ONE ArrayType Literal, not CreateArray-of-4096-literals:
    # F.lit(list) builds a CreateArray whose 4096 children each
    # codegen a per-row store — janino source in the hundreds of KB,
    # seconds of compile+JIT per fresh plan, and the bit array is
    # re-materialized per row batch. F.lit(ndarray) goes through the
    # direct Literal(ArrayData) path: one reference-array constant,
    # no per-element codegen (measured 2-3× on the end-to-end query,
    # identical values/results — r15 opt pass).
    import numpy as np

    bf = F.lit(np.asarray(words, dtype=np.int64))
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    staged = orders.select(
        "*",
        *[
            p.alias(f"__p{i}")
            for i, p in enumerate(_bloom_positions(F.col("o_custkey")))
        ],
    ).withColumn("__bf", bf)
    # Low bit survives the arithmetic shiftright even when the packed
    # word is negative (bit 63 set): odd ⇔ bit set ⇔ % 2 != 0.
    # word_idx < _BLOOM_BITS/64 by construction → element_at is total.
    hit = " AND ".join(
        f"(shiftright(element_at(__bf, CAST(__p{i} / 64 AS INT) + 1), "
        f"CAST(__p{i} % 64 AS INT)) % 2 != 0)"
        for i in range(_BLOOM_K)
    )
    prefiltered = staged.filter(F.expr(hit)).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return prefiltered.join(
        F.broadcast(cust.select("c_custkey")),
        prefiltered.o_custkey == F.col("c_custkey"),
        "left_semi",
    )


# ------------------------------------------------------- sequence packing
#
# Training consumes fixed-length sequences, not documents: the packer
# assigns each document to a (shard, pack) so every pack holds ~TARGET
# tokens. Greedy packing is inherently sequential, so the scale shape
# is greedy-WITHIN-shard: shards are the parallelism unit (exactly how
# distributed training shards its data), the cumulative-sum window
# runs per shard, and adding executors means adding shards — never a
# global sort or a driver loop. One shuffle (on shard), one window.

_PACK_TARGET_TOKENS = 2048
_PACK_SHARDS = 8


@register(
    "q_sequence_pack",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
           AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, shard, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM tok
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(floor(cum_before / {_PACK_TARGET_TOKENS}.0) AS BIGINT) AS pack_id,
       n_tokens
FROM cum
""",
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: documents are dealt to
    shards (doc_id mod — the deterministic stand-in for a training
    worker id) and greedily packed to a target token count per
    sequence via a running token cumsum: pack_id = floor(tokens-
    before-me / target). A document straddling a boundary joins the
    pack its prefix sum lands in (best-effort packing; exact bin
    packing is NP-hard and sequential). Token counts are staged as a
    real column before the window (embed.py:55-62 discipline)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    s1 = docs.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s2 = s1.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return s2.select(
        "doc_id",
        "shard",
        F.floor(F.col("cum_before") / _PACK_TARGET_TOKENS)
        .cast("long")
        .alias("pack_id"),
        "n_tokens",
    )


# -------------------------------------------------- domain token budgets
#
# Data-mixture budget enforcement: each source domain may contribute
# at most BUDGET tokens to the training mix. Docs are taken in
# deterministic md5(doc_id) order (reproducible shuffle, same device
# as q_domain_mix) until the running token total crosses the cap.
# One shuffle (on source), one window — the 100 TB form is identical
# because per-domain state is one running sum, never a collect.

# 1,000 tokens binds at every driver scale (sf0.001 per-source totals
# are already >1k), so the cap/drop semantics — the operator's point —
# is genuinely exercised: rows ARE dropped, not vacuously all kept.
_DOMAIN_TOKEN_BUDGET = 1_000


@register(
    "q_token_budget_cap",
    oracle=f"""
WITH tok AS (
  SELECT source, doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
           AS n_tokens
  FROM documents
),
cum AS (
  -- CAST: DuckDB's sum(BIGINT) is HUGEINT; the driver's pandas-side
  -- value hash renders HUGEINT as float64 vs Spark's int64 → hash
  -- mismatch even when every value agrees (the r6 red row).
  SELECT source, doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_tokens
  FROM tok
)
SELECT source, doc_id, n_tokens, cum_tokens
FROM cum WHERE cum_tokens <= {_DOMAIN_TOKEN_BUDGET}
""",
)
def q_token_budget_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token budget: keep documents, in reproducible
    md5(doc_id) order, while the domain's running token total stays
    within the budget — the 'cap web at N tokens, books at M' mixing
    pass every pretraining data recipe runs. Inclusive cumsum ⇒ the
    document that crosses the cap is dropped along with everything
    after it."""
    docs = load(spark, sf_dir, "documents").select("source", "doc_id", "text")
    s1 = docs.select(
        "source",
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s2 = s1.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return s2.filter(F.col("cum_tokens") <= _DOMAIN_TOKEN_BUDGET).select(
        "source", "doc_id", "n_tokens", "cum_tokens"
    )


# --------------------------------------------------- MMR diversification
#
# Maximal Marginal Relevance (Carbonell & Goldstein 1998): re-rank a
# retrieval candidate pool so the top-k balances relevance against
# redundancy — argmax over remaining candidates of
#   λ·rel(q, d) − (1−λ)·max_{s∈selected} sim(d, s).
# The de-facto answer to "the top-5 chunks are five near-copies of the
# same paragraph" in RAG context assembly (the reference returns raw
# top-k; ref: src/main.py:97-127 — MMR is the standard upgrade).
#
# Greedy selection is inherently sequential in k, so the k rounds are
# UNROLLED as DataFrame stages (k is a small constant — the same
# fixed-budget discipline as the k-means/PageRank loops). Every round
# is bounded by the POOL: candidates are the stored-index top-20 per
# question, so each round's join is ≤ |questions|·20 × (round) rows —
# trivially small forever, whatever the corpus size. The corpus-scale
# work (scoring all docs) happens ONCE in the candidate pass, probing
# the stored vector index exactly like q_rrf_fusion's vector leg.

_MMR_LAMBDA_NUM = "0.7"  # λ and (1−λ) as literal strings so both
_MMR_LAMBDA_REST = "0.3"  # engines parse the SAME double (1-0.7 in
#                           Python is 0.30000000000000004 — never
#                           compute the complement, spell it)
_MMR_POOL = 20
_MMR_K = 5


def _mmr_round_ctes(prefix: str) -> str:
    """Append the unrolled greedy-selection CTEs + final select to a
    SQL prefix that ends with a ``cand(question_id, doc_id, rel, v)``
    CTE — shared by the exact-pool and ANN-pool MMR oracles (the
    rounds are pool-agnostic; only candidate generation differs).

    The rounds' CTEs are MATERIALIZED: DuckDB 1.0 inlines every CTE
    reference, and each round references cand twice and its
    predecessor three times (union + join + NOT EXISTS), so the
    inlined expansion re-runs the candidate chain — which for the
    IVF oracles contains the whole k-means train — a multiplicative
    number of times: the scaled serving oracle measured >570 s at
    sf0.1 inlined vs 3.8 s materialized, byte-identical results (an
    evaluation hint, not a semantic change; the Spark side has
    localCheckpoint for exactly the same reason)."""
    lam, rest = _MMR_LAMBDA_NUM, _MMR_LAMBDA_REST
    ctes = (
        prefix
        + """,
sel_upto1 AS MATERIALIZED (
  SELECT question_id, doc_id, v, 1 AS mmr_rank, rel AS mmr_score FROM (
    SELECT *, row_number() OVER (PARTITION BY question_id
                                 ORDER BY rel DESC, doc_id) AS rn
    FROM cand)
  WHERE rn = 1
)"""
    )
    for t in range(2, _MMR_K + 1):
        prev = f"sel_upto{t - 1}"
        ctes += f""",
scored{t} AS (
  SELECT c.question_id, c.doc_id, c.v,
         round({lam} * c.rel
               - {rest} * max(round(list_dot_product(c.v, s.v), 6)), 6)
           AS mmr_score
  FROM cand c JOIN {prev} s USING (question_id)
  WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                    WHERE x.question_id = c.question_id
                      AND x.doc_id = c.doc_id)
  GROUP BY c.question_id, c.doc_id, c.rel, c.v
),
sel_upto{t} AS MATERIALIZED (
  SELECT * FROM {prev}
  UNION ALL
  SELECT question_id, doc_id, v, {t} AS mmr_rank, mmr_score FROM (
    SELECT *, row_number() OVER (PARTITION BY question_id
                                 ORDER BY mmr_score DESC, doc_id) AS rn
    FROM scored{t})
  WHERE rn = 1
)"""
    return ctes + f"""
SELECT question_id, doc_id, CAST(mmr_rank AS BIGINT) AS mmr_rank, mmr_score
FROM sel_upto{_MMR_K}
"""


def _mmr_oracle() -> str:
    from ..functions.embed import embed_subquery_sql
    from .questions import question_values_sql

    qv = embed_subquery_sql("questions", "question_id", "question_text")
    dv = embed_subquery_sql("documents", "doc_id", "text")
    prefix = f"""
WITH {question_values_sql()},
qv AS (SELECT id AS question_id, embedding AS v FROM {qv}),
dv AS (SELECT id AS doc_id, embedding AS v FROM {dv}),
cand AS MATERIALIZED (
  SELECT question_id, doc_id, rel, v FROM (
    SELECT qv.question_id, dv.doc_id,
           round(list_dot_product(qv.v, dv.v), 6) AS rel, dv.v,
           row_number() OVER (PARTITION BY qv.question_id
                              ORDER BY round(list_dot_product(qv.v, dv.v), 6)
                                       DESC, dv.doc_id) AS rk
    FROM qv CROSS JOIN dv)
  WHERE rk <= {_MMR_POOL}
)"""
    return _mmr_round_ctes(prefix)


def _stored_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-question probe of the STORED vector index, scored
    but unranked: (question_id, doc_id, rel, v). The shared first
    stage of every exact-pool consumer (MMR's candidate pool, the
    late-interaction first pass, the pool-recall ground truth) — one
    place owns the probe contract (stored index, rounded-6 dot,
    doc_id tiebreak downstream); r10 review found it triplicated."""
    from ..api import ensure_vector_index
    from ..functions.embed import dot, embed_df
    from .questions import questions_df

    dv = spark.read.parquet(ensure_vector_index(spark, sf_dir)).select(
        "doc_id", F.col("dv").alias("v")
    )
    qv = F.broadcast(
        embed_df(questions_df(spark), "question_text", out_col="q_v").select(
            "question_id", "q_v"
        )
    )
    return dv.crossJoin(qv).select(
        "question_id",
        "doc_id",
        F.round(dot(F.col("q_v"), F.col("v")), 6).alias("rel"),
        "v",
    )


def exact_pool_topn(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """Per-question top-n of the stored-index probe:
    (question_id, doc_id, rel, v), ranked by (rel desc, doc_id)."""
    w = Window.partitionBy("question_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    return (
        _stored_index_probe(spark, sf_dir)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n)
        .drop("rk")
    )


@register("q_mmr_diversify", oracle=_mmr_oracle())
def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 (_MMR_K) per golden question (λ = 0.7):
    greedy
    argmax of λ·rel − (1−λ)·max-sim-to-selected over the stored-index
    top-20 candidate pool — see the module comment above _MMR_POOL.
    mmr_score is the value the row was SELECTED on (rank 1 = its
    relevance; later ranks = the λ-blend), rounded to 6 with doc_id
    tiebreaks, so both engines pick identical rows in identical order.

    Plan: one corpus-scale pass (broadcast question vectors probing
    the stored vector index, the proven q_rrf_fusion leg) produces the
    per-question candidate pool, lazily checkpointed because all k
    rounds re-read it. Each unrolled round BROADCASTS the ≤(t−1)-row
    selected set against the pool (no shuffle), folds the
    already-selected exclusion into the same aggregation as the
    max-similarity (max(is_sel) — no separate anti-join), and
    window-picks the argmax: ONE small exchange per round, carrying
    O(|questions|·pool) rows, independent of corpus size. The naive
    round shape (anti-join + equi-join + re-join for the vector) was
    measured 2× slower (7.0 vs 3.7 s at sf0.1) — five extra
    tiny-data exchanges per round cost pure stage latency — and its
    two-key joins over deeply reused checkpoint branches triggered a
    planner crash (PartitioningCollection with mismatched partition
    counts) under subset-key co-partition reuse + AQE; the broadcast
    shape has no two-key join at all. The vectors ride the bounded
    pool rows, never a second corpus scan."""
    cand = exact_pool_topn(spark, sf_dir, _MMR_POOL).localCheckpoint(
        eager=False  # all k rounds re-read the pool
    )
    return _mmr_greedy_rounds(cand)


def _mmr_greedy_rounds(cand: DataFrame) -> DataFrame:
    """Unrolled greedy MMR selection over a bounded candidate pool
    ``cand(question_id, doc_id, rel, v)`` — shared by the exact-pool
    (q_mmr_diversify) and ANN-pool (q_mmr_ann_pool) variants; the
    rounds are pool-agnostic, only candidate generation differs. See
    q_mmr_diversify's docstring for the round-shape rationale
    (broadcast selected set, primitive agg buffers, per-round lazy
    checkpoints)."""
    from ..functions.embed import dot

    lam = float(_MMR_LAMBDA_NUM)
    rest = float(_MMR_LAMBDA_REST)
    first_w = Window.partitionBy("question_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    selected = (
        cand.withColumn("rn", F.row_number().over(first_w))
        .filter(F.col("rn") == 1)
        .select(
            "question_id",
            "doc_id",
            "v",
            F.lit(1).alias("mmr_rank"),
            F.col("rel").alias("mmr_score"),
        )
    )
    for t in range(2, _MMR_K + 1):
        sel_b = F.broadcast(
            selected.select(
                "question_id",
                F.col("doc_id").alias("s_doc"),
                F.col("v").alias("s_v"),
            )
        )
        # The aggregation carries only PRIMITIVE buffers (max over
        # double/int): dragging the candidate vector through the
        # groupBy (first(v)) would give the agg an array-typed buffer,
        # which has no UnsafeRow hash path — every greedy round would
        # plan as SortAggregate (the audit class test_no_sort_
        # aggregates_anywhere exists to catch). The picked row's
        # vector is fetched back by broadcasting the 1-row-per-
        # question pick against the pool — a BroadcastHashJoin, no
        # exchange, no co-partition planning at all.
        scored = (
            cand.join(sel_b, "question_id")
            .select(
                "question_id",
                "doc_id",
                "rel",
                F.round(dot(F.col("v"), F.col("s_v")), 6).alias("s"),
                F.when(F.col("doc_id") == F.col("s_doc"), 1)
                .otherwise(0)
                .alias("is_sel"),
            )
            .groupBy("question_id", "doc_id", "rel")
            .agg(
                F.max("s").alias("maxsim"),
                F.max("is_sel").alias("is_sel"),
            )
            .filter(F.col("is_sel") == 0)
            .select(
                "question_id",
                "doc_id",
                F.round(
                    F.lit(lam) * F.col("rel") - F.lit(rest) * F.col("maxsim"),
                    6,
                ).alias("mmr_score"),
            )
        )
        pick_w = Window.partitionBy("question_id").orderBy(
            F.desc("mmr_score"), F.asc("doc_id")
        )
        pick = cand.select("question_id", "doc_id", "v").join(
            F.broadcast(
                scored.withColumn("rn", F.row_number().over(pick_w))
                .filter(F.col("rn") == 1)
                .drop("rn")
            ),
            ["question_id", "doc_id"],
        ).select(
            "question_id",
            "doc_id",
            "v",
            F.lit(t).alias("mmr_rank"),
            "mmr_score",
        )
        # Per-round LAZY checkpoint (the q_kcore discipline for
        # growing per-round state): selected_t's plan otherwise embeds
        # selected_{t-1} TWICE (union leg + inside the broadcast
        # round), doubling per round — 46 visible exchanges at k=5 and
        # 2^k growth in general, and the broadcast copies recompute
        # history at runtime (no exchange reuse inside broadcast
        # subtrees): measured 5.0 → 2.75 s steady at sf0.1. The
        # truncation means the audited plan shows only the final
        # round's stage, as with the other per-round-checkpointed
        # iterative ops.
        selected = selected.unionByName(pick).localCheckpoint(eager=False)
    return selected.select(
        "question_id",
        "doc_id",
        F.col("mmr_rank").cast("long").alias("mmr_rank"),
        "mmr_score",
    )


def _mmr_ann_oracle() -> str:
    from ..functions.embed import embed_subquery_sql
    from .questions import question_values_sql
    from .similarity import N_TABLES, _PROBE_FLIPS, _bucket_list_sql

    qv = embed_subquery_sql("questions", "question_id", "question_text")
    dv = embed_subquery_sql("documents", "doc_id", "text")
    prefix = f"""
WITH {question_values_sql()},
qv AS (SELECT id AS question_id, embedding AS v FROM {qv}),
dv AS (SELECT id AS doc_id, embedding AS v FROM {dv}),
qb AS (
  SELECT question_id, v, tbl, xor(bucket, f.flip) AS bucket
  FROM (
    SELECT question_id, v, t.i AS tbl, bl[CAST(t.i AS INT) + 1] AS bucket
    FROM (SELECT question_id, v, {_bucket_list_sql('v')} AS bl FROM qv)
    CROSS JOIN generate_series(0, {N_TABLES - 1}) t(i))
  CROSS JOIN (SELECT unnest({_PROBE_FLIPS}) AS flip) f
),
db AS (
  SELECT doc_id, v, t.i AS tbl, bl[CAST(t.i AS INT) + 1] AS bucket
  FROM (SELECT doc_id, v, {_bucket_list_sql('v')} AS bl FROM dv)
  CROSS JOIN generate_series(0, {N_TABLES - 1}) t(i)
),
hits AS (
  SELECT q.question_id, d.doc_id,
         round(list_dot_product(q.v, d.v), 6) AS rel
  FROM qb q JOIN db d ON q.tbl = d.tbl AND q.bucket = d.bucket
),
pairs AS (
  SELECT question_id, doc_id, max(rel) AS rel
  FROM hits GROUP BY question_id, doc_id
),
cand AS MATERIALIZED (
  SELECT question_id, doc_id, rel, v FROM (
    SELECT p.question_id, p.doc_id, p.rel, dv.v,
           row_number() OVER (PARTITION BY p.question_id
                              ORDER BY p.rel DESC, p.doc_id) AS rk
    FROM pairs p JOIN dv ON dv.doc_id = p.doc_id)
  WHERE rk <= {_MMR_POOL}
)"""
    return _mmr_round_ctes(prefix)


@register("q_mmr_ann_pool", oracle=_mmr_ann_oracle())
def q_mmr_ann_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_mmr_diversify with the candidate pool served by the
    multi-probe sign-LSH ANN tier instead of the exact
    broadcast-⨯-full-index probe (r9 verdict #5): the production
    serving shape, where the corpus-scale scan is replaced by a
    bucket-pruned read and the exact cosine + greedy MMR run only
    inside the bounded candidate set. sign-LSH is the training-free
    tier: no learned state, the index is rebuildable from planes
    alone, at the cost of N_TABLES stored copies. Its trained
    counterpart is q_mmr_ivf_pool (r11 — the documents corpus now
    HAS a k-means coarse quantizer via api.ensure_vector_index_ivf),
    which stores one copy and adapts cells to corpus density; both
    probes share the same literal-fold → static-partition-pruning →
    bounded-pool plan shape, and q_mmr_pool_recall reports their
    pool recall side by side.

    Plan: the STORED bucketed index (api.ensure_vector_index_lsh —
    partitionBy(tbl, bucket), 48 directories at the 3×4-bit config)
    is probed by |questions|·N_TABLES·|flips| broadcast bucket keys
    (each question probes its own bucket plus the 4 one-bit-flip
    buckets per table — the q_ann_multiprobe recall repair, which
    fans out only the probe side, never the stored layout); a
    (question, doc) collision in any probe is a candidate, deduped by
    a bounded per-pair window, exact-re-ranked to the same top-20
    pool contract as the exact variant, then the SAME greedy rounds
    (_mmr_greedy_rounds). Candidate volume per question ≈
    N_TABLES·|flips|·N/2^planes — the scan-cost/recall knob — instead
    of N.

    Measured vs the exact pool (final-selection overlap@5 per golden
    question, tools/mmr_recall.py): mean 0.88 at sf0.01 / 0.92 at
    sf0.1 (single-probe measured 0.38 — these near-isotropic
    synthetic embeddings NEED the multiprobe repair; clustered real
    embeddings sit higher at the same probe count). The same harness
    reports the delta on any corpus, exactly like q_ann_recall for
    the plain tiers."""
    cand = mmr_ann_pool_candidates(spark, sf_dir).localCheckpoint(
        eager=False  # all k rounds re-read the pool
    )
    return _mmr_greedy_rounds(cand)


def mmr_ann_pool_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mmr_ann_pool_pairs with the pool VECTORS attached (the greedy
    rounds need v): the ≤|questions|·pool picks broadcast against the
    plain stored index. Kept separate from the pairs builder so
    consumers that only need the (question, doc) pool — the recall
    report — skip the vector fetch entirely (r10 review)."""
    from ..api import ensure_vector_index

    top = mmr_ann_pool_pairs(spark, sf_dir)
    dv = spark.read.parquet(ensure_vector_index(spark, sf_dir)).select(
        "doc_id", F.col("dv").alias("v")
    )
    return dv.join(F.broadcast(top), "doc_id").select(
        "question_id", "doc_id", "rel", "v"
    )


def mmr_ann_pool_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN-served MMR candidate pool — (question_id, doc_id, rel),
    no vectors — BEFORE the checkpoint barrier; exposed so the
    plan-quality test can pin the structural claim (stored-LSH-index
    scan with STATIC partition pruning + broadcast bucket probe, no
    corpus embed) that the per-round checkpoints truncate out of the
    final plan.

    The question side is LITERAL data, so the embed + plane-sign
    buckets + flip fan-out are folded in driver-side with the exact
    engine arithmetic (_hash_embed_py is bit-identical to embed_df;
    the plane dot replicates the zip_with left fold op-for-op) — the
    PRF literal-pushdown class. That makes the probed (tbl, bucket)
    keys PLAN-TIME literals, so the filter on the partitioned layout
    becomes a static PartitionFilter: the scan LISTS only the probed
    directories — ≤ |q|·tables·flips of the 48 — instead of relying
    on runtime DPP (probed r10: Spark does not insert DPP for this
    broadcast shape). At 100 TB this is the difference between
    reading nprobe cells and reading the index. (At the demo config
    the 10-question × 5-probe batch happens to cover all 2^4 buckets
    per table, so nothing is skipped HERE — the pinned property is
    that the keys reach PartitionFilters as literals; a single
    query probes 5 of 2^planes directories at any real plane
    count.)"""
    from ..api import ensure_vector_index_lsh
    from ..functions.embed import _hash_embed_py, dot
    from .questions import GOLDEN_QUESTIONS
    from .similarity import N_PLANES, N_TABLES, PLANES, _PROBE_FLIPS

    db = spark.read.parquet(ensure_vector_index_lsh(spark, sf_dir)).select(
        "doc_id", F.col("dv").alias("v"), "tbl", "bucket"
    )
    qb_rows = []
    probe_keys: dict[int, set[int]] = {t: set() for t in range(N_TABLES)}
    for qid, qtext in GOLDEN_QUESTIONS:
        q_v = _hash_embed_py(qtext)
        for t in range(N_TABLES):
            b0 = 0
            for i, plane in enumerate(PLANES[t]):
                acc = 0.0  # replicate the zip_with left fold exactly
                for x, y in zip(q_v, plane):
                    acc += x * y
                if acc > 0:
                    b0 += 2 ** (N_PLANES - 1 - i)
            for flip in _PROBE_FLIPS:
                qb_rows.append((qid, q_v, t, b0 ^ flip))
                probe_keys[t].add(b0 ^ flip)
    qb = F.broadcast(
        spark.createDataFrame(
            qb_rows,
            "question_id LONG, q_v ARRAY<DOUBLE>, qtbl INT, qbucket INT",
        )
    )
    # Literal probe-key filter → static PartitionFilters on the
    # (tbl, bucket)-partitioned layout; the join below re-checks the
    # same keys row-wise, so the filter is pure pruning, not logic.
    prune = None
    for t in range(N_TABLES):
        leg = (F.col("tbl") == t) & F.col("bucket").isin(
            *sorted(probe_keys[t])
        )
        prune = leg if prune is None else (prune | leg)
    db = db.filter(prune)
    # Score every bucket collision, then dedup (a pair can collide in
    # up to N_TABLES tables) with max(rel) — rel is identical across a
    # pair's collisions, and a PRIMITIVE-buffer hash aggregate gets
    # map-side partial aggregation, so only deduped (question, doc,
    # rel) triples cross the shuffle. The first cut deduped with a
    # per-pair row_number window that dragged the 64-dim vectors
    # through two sort shuffles — measured 5.0 s vs 2.4 s warm for
    # this shape at sf0.1 (scoring all 62k collisions costs 0.9 s;
    # the window shape's extra cost was vector bytes through two sort
    # exchanges, which at 100 TB scales with candidate volume ×
    # vector width through every exchange).
    hits = db.join(
        qb,
        (F.col("tbl") == F.col("qtbl")) & (F.col("bucket") == F.col("qbucket")),
    ).select(
        "question_id",
        "doc_id",
        F.round(dot(F.col("q_v"), F.col("v")), 6).alias("rel"),
    )
    pairs = hits.groupBy("question_id", "doc_id").agg(F.max("rel").alias("rel"))
    pool_w = Window.partitionBy("question_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    return (
        pairs.withColumn("rk", F.row_number().over(pool_w))
        .filter(F.col("rk") <= _MMR_POOL)
        .drop("rk")
    )


# --------------------------------- IVF-served MMR (trained quantizer)

_IVF_PROBE_CACHE: dict[tuple, tuple] = {}


def _ivf_probe_literals(
    spark: SparkSession,
    sf_dir: str,
    scaled: bool = False,
    nprobe: int | None = None,
    cents_path: str | None = None,
) -> tuple[list, list]:
    """(qb_rows, probe_cells) for the IVF probe: each golden question's
    IVF_NPROBE nearest trained cells, folded to PLAN-TIME literals so
    the layout scan gets static PartitionFilters (the
    mmr_ann_pool_pairs pattern). Unlike the LSH fold — whose plane
    signs replicate in pure Python — the cell ranking depends on
    TRAINED centroid doubles, so the fold runs as a bounded Spark
    mini-job over |q|×cells rows using the exact engine
    expressions the oracle mirrors (embed_df question vectors,
    round(d2, 6) ranking, cid tiebreak): no third arithmetic
    implementation to keep in parity. Collect is ≤ |q|·nprobe rows of
    DIM doubles; memoized per (session, sf_dir, geometry) like the
    index builds. ``scaled=True`` probes the corpus-adaptive
    ivf_cells_for(N) layout instead of the fixed-16 one — the ranking
    arithmetic is identical, only the centroid file differs."""
    from ..api import (
        IVF_NPROBE,
        ensure_vector_index_ivf,
        ensure_vector_index_ivf_scaled,
    )
    from ..functions.embed import dot, embed_df
    from ..sources.tmputil import session_key
    from .questions import questions_df

    # ``nprobe`` overrides the IVF_NPROBE serving default (the
    # tools/ivf curve sweeps, and since r13 the calibrated serving
    # row q_mmr_ivf_serving at IVF_NPROBE_SCALED); the cache key
    # carries the depth to keep per-depth pools separate.
    np_eff = IVF_NPROBE if nprobe is None else int(nprobe)
    key = session_key(
        spark,
        "ivf_probe_scaled" if scaled else "ivf_probe",
        sf_dir,
        str(np_eff),
        cents_path or "",
    )
    if key in _IVF_PROBE_CACHE:
        return _IVF_PROBE_CACHE[key]
    if cents_path is None:
        # Default: resolve the centroids from the session's builders.
        # An explicit cents_path serves a MANIFEST-resolved version
        # (published_ivf_topk) — same fold, caller-owned pointer.
        if scaled:
            _, cents_path, _ = ensure_vector_index_ivf_scaled(spark, sf_dir)
        else:
            _, cents_path = ensure_vector_index_ivf(spark, sf_dir)
    cents = spark.read.parquet(cents_path)
    qx = embed_df(questions_df(spark), "question_text", out_col="q_v").select(
        "question_id", "q_v", dot(F.col("q_v"), F.col("q_v")).alias("qq")
    )
    d2 = F.round(
        F.col("qq") - 2 * dot(F.col("q_v"), F.col("cv")) + F.col("cc"), 6
    )
    w = Window.partitionBy("question_id").orderBy("d2", "cid")
    rows = (
        qx.crossJoin(F.broadcast(cents))
        .select("question_id", "q_v", "cid", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= np_eff)
        .select("question_id", "q_v", "cid")
        .collect()
    )
    qb_rows = [
        (int(r.question_id), [float(x) for x in r.q_v], int(r.cid))
        for r in rows
    ]
    out = (qb_rows, sorted({c for _, _, c in qb_rows}))
    _IVF_PROBE_CACHE[key] = out
    return out


def mmr_ivf_pool_pairs(
    spark: SparkSession,
    sf_dir: str,
    scaled: bool = False,
    nprobe: int | None = None,
    paths: tuple[str, str] | None = None,
) -> DataFrame:
    """The IVF-served MMR candidate pool — (question_id, doc_id, rel),
    no vectors: literal probe cells prune the cell-partitioned stored
    layout (static PartitionFilters — the scan lists ≤ the probed
    union of nprobe·|q| of the layout's cell directories), broadcast
    question rows score only collisions, and a per-question window
    takes the top-{pool}. A document lives in exactly ONE cell, so —
    unlike the LSH probe — a (question, doc) pair cannot collide twice
    and needs no dedup aggregate. Candidate volume per question ≈
    nprobe·N/cells vs the LSH probe's tables·flips·N/2^planes.
    ``scaled=True`` serves from the corpus-adaptive ivf_cells_for(N)
    layout (q_ivf_recall_scaled) — same plan shape, smaller probe
    fraction. ``paths=(layout, centroids)`` overrides the session
    builders entirely: the probe runs against exactly that stored
    version — how published_ivf_topk serves whatever triple the
    blue/green manifest currently points at."""
    from ..api import ensure_vector_index_ivf, ensure_vector_index_ivf_scaled
    from ..functions.embed import dot

    if paths is not None:
        layout, probe_cents = paths
    elif scaled:
        layout, probe_cents, _ = ensure_vector_index_ivf_scaled(spark, sf_dir)
    else:
        layout, probe_cents = ensure_vector_index_ivf(spark, sf_dir)
    qb_rows, probe_cells = _ivf_probe_literals(
        spark,
        sf_dir,
        scaled=scaled,
        nprobe=nprobe,
        cents_path=probe_cents if paths is not None else None,
    )
    if not probe_cells:
        # Degenerate corpus slice (no questions → no probe keys):
        # isin() with zero args raises a confusing analysis error, and
        # an unfiltered scan would be a full-index read masquerading
        # as a probe — return the empty pool directly (r11 ADVICE).
        return spark.createDataFrame(
            [], "question_id LONG, doc_id LONG, rel DOUBLE"
        )
    db = spark.read.parquet(layout).select(
        "doc_id", F.col("dv").alias("v"), "cell"
    )
    # Literal cell filter → static PartitionFilters; the join below
    # re-checks the cells row-wise, so this is pure pruning.
    db = db.filter(F.col("cell").isin(*probe_cells))
    qb = F.broadcast(
        spark.createDataFrame(
            qb_rows, "question_id LONG, q_v ARRAY<DOUBLE>, qcell LONG"
        )
    )
    hits = db.join(qb, F.col("cell") == F.col("qcell")).select(
        "question_id",
        "doc_id",
        F.round(dot(F.col("q_v"), F.col("v")), 6).alias("rel"),
    )
    pool_w = Window.partitionBy("question_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    return (
        hits.withColumn("rk", F.row_number().over(pool_w))
        .filter(F.col("rk") <= _MMR_POOL)
        .drop("rk")
    )


def mmr_ivf_pool_candidates(
    spark: SparkSession,
    sf_dir: str,
    scaled: bool = False,
    nprobe: int | None = None,
) -> DataFrame:
    """mmr_ivf_pool_pairs with the pool VECTORS attached for the
    greedy rounds — fetched by broadcasting the ≤|q|·pool picks
    against the plain stored index, never dragged through the pool
    window's sort exchange (the r10 LSH lesson: vector bytes ×
    candidate volume through an exchange is the avoidable cost).
    ``scaled``/``nprobe`` select the serving geometry exactly as in
    mmr_ivf_pool_pairs."""
    from ..api import ensure_vector_index

    top = mmr_ivf_pool_pairs(spark, sf_dir, scaled=scaled, nprobe=nprobe)
    dv = spark.read.parquet(ensure_vector_index(spark, sf_dir)).select(
        "doc_id", F.col("dv").alias("v")
    )
    return dv.join(F.broadcast(top), "doc_id").select(
        "question_id", "doc_id", "rel", "v"
    )


#: The scaled oracle's cell-count expression — byte-for-byte the SQL
#: twin of api.ivf_cells_for (max(16, ceil(sqrt(N)))), evaluated by
#: DuckDB inside the seeds LIMIT so the oracle's geometry tracks the
#: corpus at every scale factor (the three-scale oracle audit runs
#: this at sf0.001/0.01/0.1 where N differs).
_IVF_CELLS_SQL_SCALED = (
    "(SELECT greatest(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM vx)"
)


def _ivf_leg_ctes(scaled: bool = False, nprobe: int | None = None) -> str:
    """Oracle CTEs for the IVF leg, given qv(question_id, v) and
    dv(doc_id, v) CTEs in scope: k-means training (vx, seeds, a1, c1,
    a2 — operators/clustering.kmeans_sql_rounds_ctes, the exact
    q_cluster_kmeans arithmetic), per-question nprobe cell choice
    (qprobe), and the bounded scored pool (ivf_hits). ``scaled=True``
    trains greatest(16, ceil(sqrt(N))) cells — the corpus-adaptive
    geometry of ensure_vector_index_ivf_scaled — instead of the fixed
    IVF_CELLS floor; ``nprobe`` overrides the IVF_NPROBE serving
    default (the calibrated-serving oracle passes IVF_NPROBE_SCALED)."""
    from ..api import IVF_CELLS, IVF_NPROBE
    from .clustering import kmeans_sql_rounds_ctes

    if nprobe is None:
        nprobe = IVF_NPROBE
    k = _IVF_CELLS_SQL_SCALED if scaled else IVF_CELLS
    vx_body = """
  SELECT doc_id AS vec_id, v AS x, list_dot_product(v, v) AS xx FROM dv
"""
    d2 = "round(q.qq - 2*list_dot_product(q.v, c.cv) + c.cc, 6)"
    return f"""{kmeans_sql_rounds_ctes(vx_body, k)},
qx AS (SELECT question_id, v, list_dot_product(v, v) AS qq FROM qv),
qprobe AS (
  SELECT question_id, cid FROM (
    SELECT q.question_id, c.cid,
           row_number() OVER (PARTITION BY q.question_id
                              ORDER BY {d2}, c.cid) AS rn
    FROM qx q CROSS JOIN c1 c)
  WHERE rn <= {nprobe}
),
ivf_hits AS (
  SELECT p.question_id, a.vec_id AS doc_id,
         round(list_dot_product(qv.v, a.x), 6) AS rel, a.x AS v
  FROM qprobe p
  JOIN a2 a ON a.cid = p.cid
  JOIN qv ON qv.question_id = p.question_id
)"""


def _mmr_ivf_oracle(scaled: bool = False, nprobe: int | None = None) -> str:
    from ..functions.embed import embed_subquery_sql
    from .questions import question_values_sql

    qv = embed_subquery_sql("questions", "question_id", "question_text")
    dv = embed_subquery_sql("documents", "doc_id", "text")
    prefix = f"""
WITH {question_values_sql()},
qv AS (SELECT id AS question_id, embedding AS v FROM {qv}),
dv AS (SELECT id AS doc_id, embedding AS v FROM {dv}),
{_ivf_leg_ctes(scaled=scaled, nprobe=nprobe)},
cand AS MATERIALIZED (
  SELECT question_id, doc_id, rel, v FROM (
    SELECT *, row_number() OVER (PARTITION BY question_id
                                 ORDER BY rel DESC, doc_id) AS rk
    FROM ivf_hits)
  WHERE rk <= {_MMR_POOL}
)"""
    return _mmr_round_ctes(prefix)


@register("q_mmr_ivf_pool", oracle=_mmr_ivf_oracle())
def q_mmr_ivf_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_mmr_ann_pool with the candidate pool served by a
    k-means-TRAINED IVF layout instead of sign-LSH (r10 verdict #2 —
    the LSH variant's docstring conceded the documents corpus had no
    trained coarse quantizer; the engine's own deterministic Lloyd
    trainer now provides one). Reference analog: the stored-index
    probe lifecycle of pinecone_manager.py:61-103, with the quantizer
    trained from the corpus itself.

    Plan: ensure_vector_index_ivf trains IVF_CELLS centroids with the
    q_cluster_kmeans arithmetic and rewrites the stored index
    partitionBy(cell); the probe folds each question's IVF_NPROBE
    nearest cells into plan-time literals via a bounded engine
    mini-job (_ivf_probe_literals), so the scan carries static
    PartitionFilters exactly like the LSH variant; exact cosine
    re-rank runs only inside the ≤ nprobe·N/cells candidate set; the
    SAME greedy rounds (_mmr_greedy_rounds) finish the composition.
    vs LSH: one stored copy instead of N_TABLES, corpus-adaptive
    cells, one fewer dedup aggregate (a doc has exactly one cell);
    the trade is the training pass and recall that depends on how
    clustered the corpus is — q_mmr_pool_recall reports both pools'
    recall side by side, the driver-checkable comparison the r10
    verdict asked for.

    Measured (tools/mmr_recall.py): final-selection overlap@5 vs the
    exact pool 0.78 at sf0.01 / 0.92 at sf0.1 (LSH multiprobe: 0.88 /
    0.92), pool recall@20 0.825 / 0.87 (LSH 0.885 / 0.895) — parity
    with the 3×-storage LSH tier at bench scale from a single stored
    copy reading nprobe·N/cells ≈ 31% of the index per question."""
    cand = mmr_ivf_pool_candidates(spark, sf_dir).localCheckpoint(
        eager=False  # all k rounds re-read the pool
    )
    return _mmr_greedy_rounds(cand)


def _mmr_pool_recall_oracle() -> str:
    from ..functions.embed import embed_subquery_sql
    from .questions import question_values_sql
    from .similarity import N_TABLES, _PROBE_FLIPS, _bucket_list_sql

    qv = embed_subquery_sql("questions", "question_id", "question_text")
    dv = embed_subquery_sql("documents", "doc_id", "text")
    return f"""
WITH {question_values_sql()},
qv AS (SELECT id AS question_id, embedding AS v FROM {qv}),
dv AS (SELECT id AS doc_id, embedding AS v FROM {dv}),
exact_pool AS (
  SELECT question_id, doc_id FROM (
    SELECT qv.question_id, dv.doc_id,
           row_number() OVER (PARTITION BY qv.question_id
                              ORDER BY round(list_dot_product(qv.v, dv.v), 6)
                                       DESC, dv.doc_id) AS rk
    FROM qv CROSS JOIN dv)
  WHERE rk <= {_MMR_POOL}
),
qb AS (
  SELECT question_id, v, tbl, xor(bucket, f.flip) AS bucket
  FROM (
    SELECT question_id, v, t.i AS tbl, bl[CAST(t.i AS INT) + 1] AS bucket
    FROM (SELECT question_id, v, {_bucket_list_sql('v')} AS bl FROM qv)
    CROSS JOIN generate_series(0, {N_TABLES - 1}) t(i))
  CROSS JOIN (SELECT unnest({_PROBE_FLIPS}) AS flip) f
),
db AS (
  SELECT doc_id, v, t.i AS tbl, bl[CAST(t.i AS INT) + 1] AS bucket
  FROM (SELECT doc_id, v, {_bucket_list_sql('v')} AS bl FROM dv)
  CROSS JOIN generate_series(0, {N_TABLES - 1}) t(i)
),
pairs AS (
  SELECT q.question_id, d.doc_id,
         max(round(list_dot_product(q.v, d.v), 6)) AS rel
  FROM qb q JOIN db d ON q.tbl = d.tbl AND q.bucket = d.bucket
  GROUP BY q.question_id, d.doc_id
),
ann_pool AS (
  SELECT question_id, doc_id FROM (
    SELECT question_id, doc_id,
           row_number() OVER (PARTITION BY question_id
                              ORDER BY rel DESC, doc_id) AS rk
    FROM pairs)
  WHERE rk <= {_MMR_POOL}
),
{_ivf_leg_ctes()},
ivf_pool AS (
  SELECT question_id, doc_id FROM (
    SELECT question_id, doc_id,
           row_number() OVER (PARTITION BY question_id
                              ORDER BY rel DESC, doc_id) AS rk
    FROM ivf_hits)
  WHERE rk <= {_MMR_POOL}
),
ne AS (SELECT question_id, count(*) AS n_exact FROM exact_pool GROUP BY question_id),
na AS (SELECT question_id, count(*) AS n_ann FROM ann_pool GROUP BY question_id),
nc AS (
  SELECT e.question_id, count(*) AS n_common
  FROM exact_pool e JOIN ann_pool a
    ON a.question_id = e.question_id AND a.doc_id = e.doc_id
  GROUP BY e.question_id
),
ni AS (SELECT question_id, count(*) AS n_ivf FROM ivf_pool GROUP BY question_id),
nci AS (
  SELECT e.question_id, count(*) AS n_common_ivf
  FROM exact_pool e JOIN ivf_pool i
    ON i.question_id = e.question_id AND i.doc_id = e.doc_id
  GROUP BY e.question_id
)
SELECT ne.question_id,
       CAST(ne.n_exact AS BIGINT) AS n_exact,
       CAST(coalesce(na.n_ann, 0) AS BIGINT) AS n_ann,
       CAST(coalesce(nc.n_common, 0) AS BIGINT) AS n_common,
       round(coalesce(nc.n_common, 0) / ne.n_exact, 6) AS pool_recall,
       CAST(coalesce(ni.n_ivf, 0) AS BIGINT) AS n_ivf,
       CAST(coalesce(nci.n_common_ivf, 0) AS BIGINT) AS n_common_ivf,
       round(coalesce(nci.n_common_ivf, 0) / ne.n_exact, 6) AS pool_recall_ivf
FROM ne LEFT JOIN na USING (question_id) LEFT JOIN nc USING (question_id)
        LEFT JOIN ni USING (question_id) LEFT JOIN nci USING (question_id)
"""


@register("q_mmr_pool_recall", oracle=_mmr_pool_recall_oracle())
def q_mmr_pool_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pool recall@{pool} of BOTH ANN candidate pools — multiprobe-LSH
    and the k-means-trained IVF layout (r11) — vs the exact top-{pool}
    per golden question, side by side: the driver-checkable recall
    report for the ANN-served MMR compositions (the q_ann_recall
    analog for q_mmr_ann_pool / q_mmr_ivf_pool; tools/mmr_recall.py
    reports the downstream SELECTION overlap). An eval op: the exact
    leg deliberately runs the full-index probe, because it IS the
    ground truth being compared against — the same exemption
    q_ann_recall carries.

    Plan: all three pools are the proven bounded shapes (the shared
    exact_pool_topn probe; bucket-pruned LSH probe + primitive
    hash-agg dedup; cell-pruned IVF probe — each WITHOUT the
    pool-vector fetch the MMR rounds need); the comparison joins
    ≤|questions|·pool row sets."""
    # Materialize each pool once (lazy checkpoint): exact_pool feeds
    # THREE consumers (n_exact + both overlap joins) and each ANN pool
    # two — un-checkpointed, Spark recomputes the full probe pipeline
    # per consumer (the r15 opt pass measured 48 Exchanges / 28 scans
    # in one plan: the exact probe tripled, each ANN probe doubled).
    # The report then joins ≤|questions|·pool-row tables only.
    # Cluster-scale caveat: localCheckpoint blocks are executor-local
    # and lineage-free — an executor loss mid-query fails the job; at
    # cluster scale this becomes a reliable checkpoint (SCALE.md).
    exact_pool = (
        exact_pool_topn(spark, sf_dir, _MMR_POOL)
        .select("question_id", "doc_id")
        .localCheckpoint(eager=False)
    )
    ann_pool = (
        mmr_ann_pool_pairs(spark, sf_dir)
        .select("question_id", "doc_id")
        .localCheckpoint(eager=False)
    )
    ivf_pool = (
        mmr_ivf_pool_pairs(spark, sf_dir)
        .select("question_id", "doc_id")
        .localCheckpoint(eager=False)
    )
    ne = exact_pool.groupBy("question_id").agg(F.count("*").alias("n_exact"))
    na = ann_pool.groupBy("question_id").agg(F.count("*").alias("n_ann"))
    nc = (
        exact_pool.join(ann_pool, ["question_id", "doc_id"])
        .groupBy("question_id")
        .agg(F.count("*").alias("n_common"))
    )
    ni = ivf_pool.groupBy("question_id").agg(F.count("*").alias("n_ivf"))
    nci = (
        exact_pool.join(ivf_pool, ["question_id", "doc_id"])
        .groupBy("question_id")
        .agg(F.count("*").alias("n_common_ivf"))
    )
    return (
        ne.join(na, "question_id", "left")
        .join(nc, "question_id", "left")
        .join(ni, "question_id", "left")
        .join(nci, "question_id", "left")
        .select(
            "question_id",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.coalesce(F.col("n_ann"), F.lit(0)).cast("long").alias("n_ann"),
            F.coalesce(F.col("n_common"), F.lit(0))
            .cast("long")
            .alias("n_common"),
            F.round(
                F.coalesce(F.col("n_common"), F.lit(0)) / F.col("n_exact"), 6
            ).alias("pool_recall"),
            F.coalesce(F.col("n_ivf"), F.lit(0)).cast("long").alias("n_ivf"),
            F.coalesce(F.col("n_common_ivf"), F.lit(0))
            .cast("long")
            .alias("n_common_ivf"),
            F.round(
                F.coalesce(F.col("n_common_ivf"), F.lit(0))
                / F.col("n_exact"),
                6,
            ).alias("pool_recall_ivf"),
        )
    )


def _ivf_recall_scaled_oracle() -> str:
    from ..api import IVF_NPROBE
    from ..functions.embed import embed_subquery_sql
    from .questions import question_values_sql

    qv = embed_subquery_sql("questions", "question_id", "question_text")
    dv = embed_subquery_sql("documents", "doc_id", "text")
    return f"""
WITH {question_values_sql()},
qv AS (SELECT id AS question_id, embedding AS v FROM {qv}),
dv AS (SELECT id AS doc_id, embedding AS v FROM {dv}),
exact_pool AS (
  SELECT question_id, doc_id FROM (
    SELECT qv.question_id, dv.doc_id,
           row_number() OVER (PARTITION BY qv.question_id
                              ORDER BY round(list_dot_product(qv.v, dv.v), 6)
                                       DESC, dv.doc_id) AS rk
    FROM qv CROSS JOIN dv)
  WHERE rk <= {_MMR_POOL}
),
{_ivf_leg_ctes(scaled=True)},
ivf_pool AS (
  SELECT question_id, doc_id FROM (
    SELECT question_id, doc_id,
           row_number() OVER (PARTITION BY question_id
                              ORDER BY rel DESC, doc_id) AS rk
    FROM ivf_hits)
  WHERE rk <= {_MMR_POOL}
),
ne AS (SELECT question_id, count(*) AS n_exact FROM exact_pool GROUP BY question_id),
ni AS (SELECT question_id, count(*) AS n_ivf FROM ivf_pool GROUP BY question_id),
nc AS (
  SELECT e.question_id, count(*) AS n_common
  FROM exact_pool e JOIN ivf_pool i
    ON i.question_id = e.question_id AND i.doc_id = e.doc_id
  GROUP BY e.question_id
)
SELECT ne.question_id,
       {_IVF_CELLS_SQL_SCALED} AS cells,
       CAST({IVF_NPROBE} AS BIGINT) AS nprobe,
       CAST(ne.n_exact AS BIGINT) AS n_exact,
       CAST(coalesce(ni.n_ivf, 0) AS BIGINT) AS n_ivf,
       CAST(coalesce(nc.n_common, 0) AS BIGINT) AS n_common,
       round(coalesce(nc.n_common, 0) / ne.n_exact, 6) AS pool_recall
FROM ne LEFT JOIN ni USING (question_id) LEFT JOIN nc USING (question_id)
"""


@register("q_ivf_recall_scaled", oracle=_ivf_recall_scaled_oracle())
def q_ivf_recall_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pool recall@{pool} of the CORPUS-ADAPTIVE IVF layout (cells =
    ivf_cells_for(N) = max(16, ceil(sqrt(N))) — api.py) vs the exact
    top-{pool} per golden question, with the trained geometry (cells,
    nprobe) reported per row: the r11 verdict #3 demonstration that
    the cell count is a FUNCTION of corpus size, not a constant. At
    sf0.01 (N=500) the rule gives 23 cells → probe fraction 5/23 ≈
    22%; at sf0.1 (N=5000) 71 cells → 5/71 ≈ 7%; at 5B vectors
    5/70711 ≈ 0.007% — the probe fraction FALLS as the corpus grows
    while expected per-cell reads stay ~sqrt(N)-bounded, which is why
    production IVF (FAISS/Milvus sizing guides, and the Pinecone pod
    sizing the reference delegates — ref: pinecone_manager.py:19-59)
    uses cells ~ sqrt(N).

    Plan: identical to q_mmr_pool_recall's IVF leg — stored
    partitionBy(cell) layout, literal-folded probe keys → static
    PartitionFilters (plan-pinned in test_plan_quality.py), exact
    cosine only inside the probed cells; only the centroid file
    differs. The oracle derives the SAME cell count via DuckDB's
    expression LIMIT (greatest(16, ceil(sqrt(count(*))))), so the
    sizing rule itself is cross-engine-checked at every scale factor,
    not just the recall values at one baked K. The 16-cell layout's
    recall stays reported by q_mmr_pool_recall — the two rows together
    are the recall-vs-probe-fraction trade at two points of the
    sizing curve.

    Measured (tools/mmr_recall.py, r12): pool recall@20 0.73 at
    sf0.01 (23 cells, 21.7% probe fraction; 16-cell/31% comparison
    0.825) and 0.555 at sf0.1 (71 cells, 7.0%; 16-cell 0.87) —
    reported, not hidden: the synthetic embeddings are near-isotropic
    (the documented recall-floor case for every LSH/IVF tier,
    SCALE.md), so recall tracks probe FRACTION almost linearly here,
    while on real clustered manifolds sqrt(N) cells concentrate each
    query's neighbors into few cells and the same fraction keeps
    recall high. Production closes any remaining gap with the OTHER
    knob — nprobe rises with the recall bar (mining already probes 8
    vs serving's 5, functions/vector.py) — which grows reads linearly
    while the cells rule keeps the per-probe read
    ~sqrt(N)-bounded."""
    from ..api import IVF_NPROBE, ensure_vector_index_ivf_scaled

    _, _, cells = ensure_vector_index_ivf_scaled(spark, sf_dir)
    # Materialize each pool once (lazy checkpoint): both pools feed
    # two consumers (their count + the overlap join) — the
    # q_mmr_pool_recall fix (r15 opt pass), same rationale and the
    # same cluster-scale caveat (executor-local, lineage-free blocks
    # → reliable checkpoint at cluster scale, SCALE.md).
    exact_pool = (
        exact_pool_topn(spark, sf_dir, _MMR_POOL)
        .select("question_id", "doc_id")
        .localCheckpoint(eager=False)
    )
    ivf_pool = (
        mmr_ivf_pool_pairs(spark, sf_dir, scaled=True)
        .select("question_id", "doc_id")
        .localCheckpoint(eager=False)
    )
    ne = exact_pool.groupBy("question_id").agg(F.count("*").alias("n_exact"))
    ni = ivf_pool.groupBy("question_id").agg(F.count("*").alias("n_ivf"))
    nc = (
        exact_pool.join(ivf_pool, ["question_id", "doc_id"])
        .groupBy("question_id")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        ne.join(ni, "question_id", "left")
        .join(nc, "question_id", "left")
        .select(
            "question_id",
            F.lit(cells).cast("long").alias("cells"),
            F.lit(IVF_NPROBE).cast("long").alias("nprobe"),
            F.col("n_exact").cast("long").alias("n_exact"),
            F.coalesce(F.col("n_ivf"), F.lit(0)).cast("long").alias("n_ivf"),
            F.coalesce(F.col("n_common"), F.lit(0))
            .cast("long")
            .alias("n_common"),
            F.round(
                F.coalesce(F.col("n_common"), F.lit(0)) / F.col("n_exact"), 6
            ).alias("pool_recall"),
        )
    )


def _mmr_ivf_serving_oracle() -> str:
    """The calibrated-serving MMR oracle: the scaled-geometry IVF leg
    at nprobe = IVF_NPROBE_SCALED, wrapped to report the (cells,
    nprobe) rule as hashed columns. The cells expression re-derives
    greatest(16, ceil(sqrt(N))) from the documents table directly
    (the dv CTE is one embedding per document, so count(documents) is
    the same N the engine's ivf_cells_for sees)."""
    from ..api import IVF_NPROBE_SCALED

    inner = _mmr_ivf_oracle(scaled=True, nprobe=IVF_NPROBE_SCALED)
    cells = (
        "(SELECT greatest(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) "
        "FROM documents)"
    )
    return f"""
SELECT question_id, doc_id, mmr_rank, mmr_score,
       {cells} AS cells,
       CAST({IVF_NPROBE_SCALED} AS BIGINT) AS nprobe
FROM (
{inner}
) t
"""


@register("q_mmr_ivf_serving", oracle=_mmr_ivf_serving_oracle())
def q_mmr_ivf_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PROMOTED IVF serving point (r12 verdict #2): MMR served
    from the corpus-adaptive layout (cells = ivf_cells_for(N)) at the
    curve-calibrated probe depth (nprobe = IVF_NPROBE_SCALED = 16) —
    the (cells, nprobe) pair the engine's own measurement says
    DOMINATES the fixed-16-cell default: at the sf0.1 geometry (71
    cells) the nprobe curve (tools/ivf_nprobe_curve.py, SCALE.md)
    gives pool recall@20 = 0.90 at a 22.5% read vs the fixed layout's
    0.87 at a 31% read. The geometry rule rides the hashed row as
    (cells, nprobe) columns, with the oracle re-deriving cells via
    greatest(16, ceil(sqrt(count(*)))) from the corpus — so the
    serving rule itself is cross-engine-checked at every scale
    factor, exactly like q_ivf_recall_scaled's recall report.
    Reference analog: the Pinecone index sizing the reference
    delegates (ref: src/services/vector_engine/pinecone_manager.py:19-59),
    here owned by the engine and calibrated against its own curve.

    Plan: identical shape to q_mmr_ivf_pool — literal probe cells →
    static PartitionFilters on the cells-tagged layout (plan-pinned
    in test_plan_quality.py), exact cosine only inside the probed
    cells, pool vectors fetched by broadcast against the plain stored
    index, same unrolled greedy rounds. The r11-vintage
    q_mmr_ivf_pool / q_mmr_pool_recall keep the fixed-16 geometry so
    their rows stay byte-identical (rotation hygiene); this row is
    the production default a 100× deployment serves from.

    Measured (tools/mmr_recall.py, r13): final-selection overlap@5 vs
    the exact-pool MMR = 1.00 at sf0.01 (23 cells, 70% read at this
    tiny N) and 0.90 at sf0.1 (71 cells, 22.5% read) — vs the
    fixed-16 pool's 0.78/0.92 at a 31% read: comparable downstream
    selections from ~2/3 the bytes, with the gap widening in the
    scaled layout's favor as N grows (the fixed geometry's fraction
    is pinned at 31% forever; this one's falls as nprobe/√N)."""
    from ..api import IVF_NPROBE_SCALED, ensure_vector_index_ivf_scaled

    _, _, cells = ensure_vector_index_ivf_scaled(spark, sf_dir)
    cand = mmr_ivf_pool_candidates(
        spark, sf_dir, scaled=True, nprobe=IVF_NPROBE_SCALED
    ).localCheckpoint(eager=False)  # all k rounds re-read the pool
    return _mmr_greedy_rounds(cand).select(
        "question_id",
        "doc_id",
        "mmr_rank",
        "mmr_score",
        F.lit(cells).cast("long").alias("cells"),
        F.lit(IVF_NPROBE_SCALED).cast("long").alias("nprobe"),
    )


# ------------------------------ serving through the published pointer

_PUBLISHED_TOPK = 5
#: The registered row's manifest namespace: isolated from the default
#: profile so library tests that publish doctored/stale layouts (the
#: blue/green pins in tests/test_layout.py) can never change what the
#: driver-checked row serves, and the row's first tick in any fresh
#: process deterministically publishes v1.
PUBLISHED_PROFILE = "published_row"


def _published_topk_oracle() -> str:
    """Full re-derivation of the published serving path: retrain the
    scaled geometry (greatest(16, ceil(sqrt(N))) cells — the triple
    maintain_ivf_index publishes on first tick), probe each question's
    IVF_NPROBE_SCALED nearest cells, take the top-{k} by exact dot
    inside the probed cells. version is pinned to the literal 1: a
    fresh serving profile must publish exactly ONCE — if the
    maintenance tick ever republished per call (version churn is the
    classic blue/green bug: every flip invalidates every reader's
    cache), the second run's version column would be 2 and the row
    would hash-mismatch."""
    from ..api import IVF_NPROBE_SCALED
    from ..functions.embed import embed_subquery_sql
    from .questions import question_values_sql

    qv = embed_subquery_sql("questions", "question_id", "question_text")
    dv = embed_subquery_sql("documents", "doc_id", "text")
    cells = (
        "(SELECT greatest(16, CAST(ceil(sqrt(count(*))) AS BIGINT)) "
        "FROM dv)"
    )
    return f"""
WITH {question_values_sql()},
qv AS (SELECT id AS question_id, embedding AS v FROM {qv}),
dv AS (SELECT id AS doc_id, embedding AS v FROM {dv}),
{_ivf_leg_ctes(scaled=True, nprobe=IVF_NPROBE_SCALED)}
SELECT question_id, doc_id, CAST(rk AS BIGINT) AS rank, rel AS score,
       CAST(1 AS BIGINT) AS version,
       {cells} AS cells
FROM (
  SELECT question_id, doc_id, rel,
         row_number() OVER (PARTITION BY question_id
                            ORDER BY rel DESC, doc_id) AS rk
  FROM ivf_hits)
WHERE rk <= {_PUBLISHED_TOPK}
"""


def published_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = _PUBLISHED_TOPK,
    profile: str = PUBLISHED_PROFILE,
    version: int | None = None,
    tick: bool = True,
) -> DataFrame:
    """Vector top-k served THROUGH the blue/green pointer — the read
    side of the api.publish_index_version / maintain_ivf_index
    lifecycle (r14; registration staged for r15). One maintenance
    tick first (first call in a process publishes v1 of the scaled
    layout; later calls resolve the same version — no drift, no
    republish), then the probe reads the layout and centroids FROM
    THE RESOLVED MANIFEST, not from the session's builders: flip the
    pointer and the very next query serves the new version, roll it
    back and the old rows return (pinned end-to-end with a doctored
    layout in tests/test_layout.py). The (version, cells) pair rides
    every row, so the oracle cross-checks the publish-once contract
    and the geometry rule, not just the ranking arithmetic.

    Reference analog: the index connect-then-query lifecycle the
    reference delegates to Pinecone (ref:
    src/services/vector_engine/pinecone_manager.py:19-59 — connect
    resolves a named index version, queries run against it until the
    pointer moves).

    Plan: identical to the q_mmr_ivf_serving probe — literal probe
    cells → static PartitionFilters on the cell-partitioned layout,
    exact dot only inside the probed ≤ nprobe·N/cells candidates,
    one per-question window for the top-k. At 100 TB the manifest
    read is one tiny catalog GET per query batch; the data read
    stays the calibrated ~nprobe/√N fraction of the index.

    ``version`` pins a HISTORICAL log entry instead of CURRENT — the
    time-travel read every version log buys for free (debug 'what did
    v1 serve', A/B two index builds, reproduce an eval against the
    exact index a training run mined from). Raises KeyError when the
    requested version is not in the log (never published, or pruned
    by gc_index_versions — retention bounds how far back a reader can
    travel, exactly Iceberg's expire-snapshots contract).

    ``tick=False`` skips the maintenance tick — for a caller that
    just ran it and resolved the version itself (published_topk_cached
    keys its cache on that resolution; re-resolving here could race a
    concurrent flip and serve rows under the wrong key)."""
    from ..api import (
        IVF_NPROBE_SCALED,
        current_index_version,
        list_index_versions,
        maintain_ivf_index,
    )

    if tick:
        maintain_ivf_index(spark, sf_dir, profile=profile)
    if version is None:
        cur = current_index_version(spark, sf_dir, profile=profile)
    else:
        byv = {
            e["version"]: e
            for e in list_index_versions(spark, sf_dir, profile=profile)
        }
        if version not in byv:
            raise KeyError(
                f"index version {version} not in the log "
                f"(have {sorted(byv)}); pruned by retention or never "
                "published"
            )
        cur = byv[version]
    pairs = mmr_ivf_pool_pairs(
        spark,
        sf_dir,
        scaled=True,
        nprobe=IVF_NPROBE_SCALED,
        paths=(cur["layout"], cur["centroids"]),
    )
    w = Window.partitionBy("question_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "question_id",
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("rel").alias("score"),
            F.lit(int(cur["version"])).cast("long").alias("version"),
            F.lit(int(cur["cells"])).cast("long").alias("cells"),
        )
    )


#: Version-keyed result cache for the published serving path — keyed
#: by (session, corpus, profile, VERSION, k), so a pointer flip
#: invalidates every cached answer without any explicit purge (the
#: operational payoff of blue/green over in-place mutation: readers
#: key caches by the version they served from). Entries are tiny
#: (≤|questions|·k id/score rows); FIFO-capped like the triplet memo.
_PUBLISHED_RESULT_CACHE: dict[tuple, list] = {}
_PUBLISHED_RESULT_CACHE_MAX = 8


def published_topk_cached(
    spark: SparkSession,
    sf_dir: str,
    k: int = _PUBLISHED_TOPK,
    profile: str = PUBLISHED_PROFILE,
) -> tuple[list, bool]:
    """published_ivf_topk behind a VERSION-KEYED driver-side cache:
    returns (rows, cache_hit). The key carries the manifest version
    the rows were served from — a blue/green flip changes the version
    and the stale entry simply stops being addressed (no invalidation
    protocol, no TTL guess; rollback re-bumps the version so even
    'back to the old layout' never resurrects a stale key). Pinned in
    tests/test_layout.py: hit on repeat, miss + fresh rows after a
    doctored-layout flip, miss + original rows after rollback.

    At 100 TB this is the per-gateway answer cache every serving tier
    runs; the bounded maintenance tick (one count) is the cost of
    knowing the version is still current. FIFO eviction at
    _PUBLISHED_RESULT_CACHE_MAX entries — insertion order, not
    recency (a hit does not refresh a key's position)."""
    from ..api import current_index_version, maintain_ivf_index

    from ..sources.tmputil import session_key

    maintain_ivf_index(spark, sf_dir, profile=profile)
    cur = current_index_version(spark, sf_dir, profile=profile)
    key = session_key(spark, sf_dir, profile, str(cur["version"]), str(k))
    if key in _PUBLISHED_RESULT_CACHE:
        # Copy out: callers may sort/mutate their result; the cached
        # rows must stay exactly what the version served (r14 review).
        return list(_PUBLISHED_RESULT_CACHE[key]), True
    # Serve the EXACT version this key was resolved from, with the
    # tick skipped (it just ran): re-resolving inside the probe could
    # race a concurrent flip and file version N+1's rows under key N —
    # an entry the version-keyed invalidation could never evict.
    rows = sorted(
        tuple(r)
        for r in published_ivf_topk(
            spark,
            sf_dir,
            k=k,
            profile=profile,
            version=cur["version"],
            tick=False,
        ).collect()
    )
    if len(_PUBLISHED_RESULT_CACHE) >= _PUBLISHED_RESULT_CACHE_MAX:
        _PUBLISHED_RESULT_CACHE.pop(next(iter(_PUBLISHED_RESULT_CACHE)))
    _PUBLISHED_RESULT_CACHE[key] = rows
    return list(rows), False


# --------------------- r15 registrations of the r14 lifecycle library
#
# The five index-lifecycle operators landed in r14 as library + pytest
# parity pins (tests/test_layout.py) under that round's zero-new-
# registrations mandate, pre-flighted engine-vs-oracle MATCH at
# sf0.001/0.01/0.1 (tools/preflight_staged.py). These wrappers give
# each one its driver-contract row; the engine and oracle pairings are
# byte-identical to the preflight tool's.


@register("q_incremental_ivf_scaled", oracle=_inc_ivf_oracle(scaled=True))
def q_incremental_ivf_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta maintenance of the PROMOTED scaled IVF serving layout:
    base (stored layout minus the batch) ∪ delta (batch embedded and
    broadcast-assigned to the STORED centroids) must equal a FULL
    corpus rebuild at the corpus-adaptive geometry — per-cell count,
    id checksum, and first-component vector checksum, all cross-engine
    (see incremental_ivf). Reference analog: the upsert half of the
    index lifecycle the reference delegates to Pinecone (ref:
    src/services/vector_engine/pinecone_manager.py:61-103)."""
    return incremental_ivf(spark, sf_dir, scaled=True)


@register("q_ivf_layout_stats", oracle=_ivf_layout_stats_oracle())
def q_ivf_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-stats dashboard row for the scaled serving layout: trained
    geometry (cells, nprobe, probe fraction) + measured cell population
    spread (min/max/avg, imbalance), all from one pruned groupBy(cell)
    count — the describe_index_stats analog (ref:
    src/services/vector_engine/pinecone_manager.py:19-59). The oracle
    re-trains from the corpus and re-derives cells via
    greatest(16, ceil(sqrt(N))), cross-checking the geometry rule."""
    return ivf_layout_stats(spark, sf_dir)


@register("q_ivf_cell_psi", oracle=_ivf_cell_psi_oracle())
def q_ivf_cell_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-drift half of the IVF retrain policy: +0.5-smoothed PSI
    between the stored layout's build-assignment cell histogram and an
    incoming batch broadcast-assigned to the SAME stored centroids —
    one (cells, n_base, n_batch, psi) row, metadata-class cost (see
    ivf_cell_psi for the small-batch gating discipline)."""
    return ivf_cell_psi(spark, sf_dir)


@register("q_stream_ivf_maintenance", oracle=_inc_ivf_oracle(scaled=True))
def q_stream_ivf_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF delta maintenance as a Structured Stream: landing dir →
    availableNow micro-batches → foreachBatch embed + assign +
    partitioned append. The final applied layout's per-cell checksums
    equal the FULL-REBUILD oracle whatever the micro-batch split —
    batch boundaries provably invisible to readers (see
    stream_ivf_maintenance)."""
    return stream_ivf_maintenance(spark, sf_dir)


#: Victim rule for the lifecycle roundtrip row: multiples of 29 (base
#: snapshot members at test scales) PLUS doc 26 = 2·13 — a guaranteed
#: member of the appended batch (doc_id % 13 == 0) at every scale, so
#: the delete provably reaches rows the append just wrote.
_LIFECYCLE_DEL_MOD = 29
_LIFECYCLE_DEL_BATCH_DOC = 26


def _ivf_lifecycle_oracle() -> str:
    """Full-rebuild oracle for the CRUD roundtrip: train the scaled
    geometry on the whole corpus, assign every doc, REMOVE the victim
    set, aggregate per cell — the end state the engine must reach by
    physically appending, deleting, and compacting the stored layout.
    Compaction is content-neutral by contract, so it has no term here
    (its file-count effect is pinned separately in tests)."""
    from ..functions.embed import embed_subquery_sql
    from .clustering import kmeans_sql_rounds_ctes

    dv = embed_subquery_sql("documents", "doc_id", "text")
    vx_body = f"""
  SELECT id AS vec_id, embedding AS x,
         list_dot_product(embedding, embedding) AS xx
  FROM (SELECT id, embedding FROM {dv})
"""
    return f"""
WITH {kmeans_sql_rounds_ctes(vx_body, _IVF_CELLS_SQL_SCALED)}
SELECT CAST(cid AS BIGINT) AS cell,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(vec_id) AS BIGINT) AS id_sum,
       CAST(sum(CAST(round(x[1] * 1000000) AS BIGINT)) AS BIGINT) AS v1_micros
FROM a2
WHERE vec_id % {_LIFECYCLE_DEL_MOD} <> 0
  AND vec_id <> {_LIFECYCLE_DEL_BATCH_DOC}
GROUP BY cid
"""


@register("q_ivf_lifecycle_roundtrip", oracle=_ivf_lifecycle_oracle())
def q_ivf_lifecycle_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PHYSICAL index CRUD chain in one oracled row (r14 verdict
    #2: append_ivf_delta / delete_from_ivf / compact_ivf_cells were
    content-pinned in tests but had no cross-engine row): write the
    base snapshot + append the batch (append_ivf_delta, scaled
    geometry), DELETE a victim set that includes one appended doc
    (semi-join locate → dynamic-overwrite rewrite of only the affected
    cells → explicit emptied-cell drop), COMPACT the cells the append
    fragmented (file-count flag → rewrite of only flagged cells), then
    emit the layout's per-cell (count, id checksum, first-component
    vector checksum) table. The oracle reaches the same end state from
    the opposite direction — a full corpus retrain minus the victims —
    so one hash-green row proves the whole verb chain cross-engine.

    Scale: each verb's cost is bounded by what it touches — append ∝
    batch, delete ∝ affected cells (≤|victims| dirs of ~√N rows each),
    compaction ∝ flagged cells — never a full-layout rewrite; the
    final report is the ≤cells-row aggregate every stats query pays.
    Runs against a TAGGED COPY of the serving layout (append_ivf_delta
    isolation), so the registered row can never mutate what other
    queries probe. Reference analog: the upsert/delete index verbs the
    reference delegates to Pinecone (ref:
    src/services/vector_engine/pinecone_manager.py:61-166)."""
    victims = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(
            (F.col("doc_id") % _LIFECYCLE_DEL_MOD == 0)
            | (F.col("doc_id") == _LIFECYCLE_DEL_BATCH_DOC)
        )
    )
    path = append_ivf_delta(spark, sf_dir, scaled=True)
    delete_from_ivf(spark, path, victims)
    # Threshold 1: flags exactly the cells the append fragmented (2
    # files) that the delete didn't already rewrite back to 1.
    compact_ivf_cells(spark, path, max_files_per_cell=1)
    return (
        spark.read.parquet(path)
        .groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum(
                F.round(F.element_at(F.col("dv"), 1) * 1_000_000).cast("long")
            )
            .cast("long")
            .alias("v1_micros"),
        )
        .select(
            F.col("cell").cast("long").alias("cell"),
            "n_docs",
            "id_sum",
            "v1_micros",
        )
    )


@register("q_vector_topk_published", oracle=_published_topk_oracle())
def q_vector_topk_published(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector top-k served THROUGH the blue/green manifest pointer:
    one maintenance tick (first call publishes v1; later calls resolve
    the same version — the publish-once contract rides the hashed row
    as the version column), then the calibrated cell-pruned probe
    against the RESOLVED layout (see published_ivf_topk). Reference
    analog: Pinecone's connect-then-query lifecycle (ref:
    src/services/vector_engine/pinecone_manager.py:19-59)."""
    return published_ivf_topk(spark, sf_dir)


# --------------------------------- late-interaction (MaxSim) re-rank
#
# ColBERT-style late interaction (Khattab & Zaharia, SIGIR 2020): a
# first-pass retriever supplies a candidate pool; the re-ranker scores
# each (question, doc) pair as the sum over question tokens of the MAX
# similarity to any document token — token-level matching that one
# pooled vector per document cannot express. Here token "embeddings"
# are deterministic char-trigram count profiles (the label-free
# stand-in for contextual token vectors — typo-robust soft keyword
# matching; a trained model arrives as the same (token, dim, weight)
# relation), so the whole op is oracle-checkable.
#
# THE SCALE MOVE: the token profiles are SPARSE, so MaxSim's inner
# products are computed as a trigram-key EQUI-JOIN + integer count
# aggregation — never dense vector folds. Dense per-pair scoring is
# |q_toks|·|d_toks|·DIM work per pair inside an interpreted HOF; the
# sparse join moves only matching trigram postings through hash
# joins/aggregates (all whole-stage-codegen), exactly how a
# late-interaction re-ranker runs on a relational engine at 100 TB.
# Everything downstream of the first-pass probe is bounded by the
# pool: ≤|questions|·pool docs' tokens ever enter the join.

_LI_POOL = 20  # first-pass (stored vector index) candidates/question
_LI_TOPK = 5
_LI_TRI = 3  # char n-gram width of the token profile


def _li_tri_hashes(tok):
    """Array of polynomial char-trigram hashes of a token column —
    the same (acc*131 + code) % P fold as functions/hashing, unrolled
    for exactly 3 chars. Guarded empty for len<3 (Spark's
    sequence(1, 0) is DESCENDING; DuckDB's generate_series is empty —
    the shingle_hashes footgun)."""
    n = F.length(tok)
    idx = F.when(
        n >= _LI_TRI, F.sequence(F.lit(1), (n - (_LI_TRI - 1)).cast("int"))
    ).otherwise(F.array().cast("array<int>"))

    def h(i):
        c1 = F.ascii(tok.substr(i, F.lit(1))).cast("long")
        c2 = F.ascii(tok.substr(i + 1, F.lit(1))).cast("long")
        c3 = F.ascii(tok.substr(i + 2, F.lit(1))).cast("long")
        from ..functions.hashing import MULT, P

        return ((c1 * MULT + c2) % P * MULT + c3) % P

    return F.transform(idx, h)


def _li_tri_sql(tok: str) -> str:
    from ..functions.hashing import MULT, P

    return (
        f"list_transform(generate_series(1, greatest(len({tok}) - {_LI_TRI - 1}, 0)), "
        f"i -> ((CAST(ascii(substr({tok}, CAST(i AS INT), 1)) AS BIGINT) * {MULT} "
        f"+ ascii(substr({tok}, CAST(i AS INT) + 1, 1))) % {P} * {MULT} "
        f"+ ascii(substr({tok}, CAST(i AS INT) + 2, 1))) % {P})"
    )


def _li_oracle() -> str:
    from ..functions.embed import embed_subquery_sql
    from ..functions.hashing import tokens_sql
    from .questions import question_values_sql

    qv = embed_subquery_sql("questions", "question_id", "question_text")
    dv = embed_subquery_sql("documents", "doc_id", "text")
    qtoks = f"list_distinct({tokens_sql('lower(question_text)')})"
    dtoks = f"list_distinct({tokens_sql('lower(text)')})"
    return f"""
WITH {question_values_sql()},
qv AS (SELECT id AS question_id, embedding AS v FROM {qv}),
dv AS (SELECT id AS doc_id, embedding AS v FROM {dv}),
pool AS (
  SELECT question_id, doc_id FROM (
    SELECT qv.question_id, dv.doc_id,
           row_number() OVER (PARTITION BY qv.question_id
                              ORDER BY round(list_dot_product(qv.v, dv.v), 6)
                                       DESC, dv.doc_id) AS rk
    FROM qv CROSS JOIN dv)
  WHERE rk <= {_LI_POOL}
),
qtok AS (SELECT question_id, unnest({qtoks}) AS qt FROM questions),
nqt AS (SELECT question_id, count(*) AS n_qtok FROM qtok GROUP BY question_id),
qtri AS (
  SELECT question_id, qt, tri, count(*) AS qcnt,
         sqrt(sum(count(*) * count(*))
              OVER (PARTITION BY question_id, qt)) AS qnorm
  FROM (SELECT question_id, qt, unnest({_li_tri_sql('qt')}) AS tri FROM qtok)
  GROUP BY question_id, qt, tri
),
pdoc AS (SELECT DISTINCT doc_id FROM pool),
dtok AS (
  SELECT d.doc_id, unnest({dtoks}) AS dt
  FROM documents d JOIN pdoc USING (doc_id)
),
dtri AS (
  SELECT doc_id, dt, tri, count(*) AS dcnt,
         sqrt(sum(count(*) * count(*)) OVER (PARTITION BY doc_id, dt)) AS dnorm
  FROM (SELECT doc_id, dt, unnest({_li_tri_sql('dt')}) AS tri FROM dtok)
  GROUP BY doc_id, dt, tri
),
sim AS (
  SELECT q.question_id, d.doc_id, q.qt, d.dt,
         round(sum(q.qcnt * d.dcnt) / (max(q.qnorm) * max(d.dnorm)), 6) AS sim
  FROM qtri q JOIN dtri d ON q.tri = d.tri
  GROUP BY q.question_id, d.doc_id, q.qt, d.dt
),
ms AS (
  SELECT s.question_id, s.doc_id, s.qt, max(s.sim) AS ms
  FROM sim s JOIN pool p
    ON p.question_id = s.question_id AND p.doc_id = s.doc_id
  GROUP BY s.question_id, s.doc_id, s.qt
),
score AS (
  SELECT m.question_id, m.doc_id,
         round(sum(CAST(round(m.ms * 1000000) AS BIGINT))
               / max(n.n_qtok) / 1000000.0, 6) AS li_score
  FROM ms m JOIN nqt n USING (question_id)
  GROUP BY m.question_id, m.doc_id
)
SELECT question_id, doc_id, li_score,
       CAST(li_rank AS BIGINT) AS li_rank
FROM (SELECT *, row_number() OVER (PARTITION BY question_id
                                   ORDER BY li_score DESC, doc_id) AS li_rank
      FROM score)
WHERE li_rank <= {_LI_TOPK}
"""


@register("q_late_interaction", oracle=_li_oracle())
def q_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (MaxSim) re-rank of the stored-index top-20
    pool: score(q, d) = mean over q's distinct tokens of the max
    trigram-profile cosine to any of d's distinct tokens — see the
    module comment above _LI_POOL for the ColBERT framing and why the
    sparse trigram equi-join (never dense per-pair folds) is the
    relational 100 TB shape.

    Plan: first pass = the proven broadcast-question probe of the
    STORED vector index (retrieval rule: the corpus is never
    re-embedded); only the ≤|questions|·pool docs' texts are read
    back (broadcast semi-join on doc_id pushes the pool keys into the
    documents scan), tokenized, and explode into trigram postings;
    MaxSim is two hash aggregates over the posting join.

    Shuffle discipline (the 4-exchange budget): the QUESTION-side
    trigram profiles are literal data (the golden batch), so they are
    folded in driver-side with the exact oracle arithmetic and arrive
    as two broadcast literal relations — the PRF/k-means-centroid
    bounded-collect class, zero exchanges. The document side then
    needs exactly TWO: one hash repartition on (doc_id, dt) that the
    posting count, the norm window, AND the per-(pair, token-pair)
    sim aggregate all reuse (subset-key co-partitioning — every later
    key set contains (doc_id, dt)), and one on question_id that the
    MaxSim aggregate, the score aggregate, and the final rank window
    share the same way. The first cut computed the question side in
    Spark and let every aggregate re-exchange: 9 exchanges for the
    same result. Integer micro-unit summation makes the final score
    partition-order independent; rank ties break on doc_id."""
    import math

    from ..functions.hashing import MULT, P, tokens
    from .questions import GOLDEN_QUESTIONS

    pool = (
        exact_pool_topn(spark, sf_dir, _LI_POOL)
        .select("question_id", "doc_id")
        .localCheckpoint(eager=False)  # consumed by 3 legs below
    )
    # Question-side trigram postings: LITERAL data (the golden
    # batch), folded in driver-side with the exact oracle arithmetic
    # (char fold, integer counts, IEEE sqrt — all correctly-rounded
    # ops, so the doubles are bit-identical to the SQL leg's) and
    # shipped as two broadcast literal relations. ≤|q|·tokens·tris
    # rows — the PRF/k-means-centroid bounded-literal class.
    qtri_rows = []
    nqt_rows = []
    for qid, qtext in GOLDEN_QUESTIONS:
        toks = sorted({t for t in qtext.lower().split(" ") if t})
        nqt_rows.append((qid, len(toks)))
        for t in toks:
            tris: dict[int, int] = {}
            for i in range(len(t) - (_LI_TRI - 1)):
                h = (
                    (ord(t[i]) * MULT + ord(t[i + 1])) % P * MULT
                    + ord(t[i + 2])
                ) % P
                tris[h] = tris.get(h, 0) + 1
            if not tris:
                continue  # token shorter than the trigram width
            norm = math.sqrt(sum(c * c for c in tris.values()))
            for h, c in sorted(tris.items()):
                qtri_rows.append((qid, t, h, c, norm))
    qtri = F.broadcast(
        spark.createDataFrame(
            qtri_rows,
            "question_id LONG, qt STRING, tri LONG, qcnt LONG, qnorm DOUBLE",
        )
    )
    nqt = F.broadcast(
        spark.createDataFrame(nqt_rows, "question_id LONG, n_qtok LONG")
    )
    # Document-side postings, pool docs only: the broadcast doc-key
    # semi-join bounds the text read to ≤|questions|·pool documents.
    # ONE hash repartition on (doc_id, dt) serves the posting count,
    # the norm window, and the sim aggregate (their key sets all
    # contain (doc_id, dt) — subset-key co-partition reuse).
    pdoc = F.broadcast(pool.select("doc_id").distinct())
    dtok = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .join(pdoc, "doc_id")
        .select(
            "doc_id",
            F.explode(F.array_distinct(tokens(F.lower(F.col("text"))))).alias(
                "dt"
            ),
        )
        .repartition("doc_id", "dt")
    )
    dn_w = Window.partitionBy("doc_id", "dt")
    dtri = (
        dtok.select("doc_id", "dt", F.explode(_li_tri_hashes(F.col("dt"))).alias("tri"))
        .groupBy("doc_id", "dt", "tri")
        .agg(F.count("*").alias("dcnt"))
        .withColumn(
            "dnorm", F.sqrt(F.sum(F.col("dcnt") * F.col("dcnt")).over(dn_w))
        )
    )
    sim = (
        dtri.join(qtri, "tri")
        .groupBy("question_id", "doc_id", "qt", "dt")
        .agg(
            F.round(
                F.sum(F.col("qcnt") * F.col("dcnt"))
                / (F.max("qnorm") * F.max("dnorm")),
                6,
            ).alias("sim")
        )
    )
    # ONE repartition on question_id that the MaxSim aggregate, the
    # score aggregate, and the final rank window all reuse (each key
    # set contains question_id); a question's rows are bounded by
    # pool·|tokens|, so the coarser clustering cannot skew.
    ms = (
        sim.repartition("question_id")
        .join(F.broadcast(pool), ["question_id", "doc_id"])
        .groupBy("question_id", "doc_id", "qt")
        .agg(F.max("sim").alias("ms"))
    )
    score = (
        ms.groupBy("question_id", "doc_id")
        .agg(
            F.sum(F.round(F.col("ms") * 1_000_000).cast("long")).alias("micros")
        )
        .join(nqt, "question_id")
        .select(
            "question_id",
            "doc_id",
            F.round(
                F.col("micros") / F.col("n_qtok") / 1_000_000.0, 6
            ).alias("li_score"),
        )
    )
    fin_w = Window.partitionBy("question_id").orderBy(
        F.desc("li_score"), F.asc("doc_id")
    )
    return (
        score.withColumn("li_rank", F.row_number().over(fin_w))
        .filter(F.col("li_rank") <= _LI_TOPK)
        .select(
            "question_id",
            "doc_id",
            "li_score",
            F.col("li_rank").cast("long").alias("li_rank"),
        )
    )


# --------------------------------------------- PRF query expansion
#
# Pseudo-relevance feedback (Rocchio / RM-style): assume the first
# pass's top documents are relevant, mine their strongest terms, and
# re-query with the expanded term set — the classical fix for
# vocabulary mismatch ("heart attack" retrieving nothing about
# "myocardial infarction") that needs no model. Two probes of the
# SAME stored indexes the engine already maintains:
#   pass 1  BM25 probe (stored postings)  → top-3 feedback docs/question
#   mine    stored TF-IDF weighted index  → top-5 expansion terms/question
#           (question's own terms excluded; summed tf-idf weight,
#            term tiebreak)
#   pass 2  BM25 probe with original terms at weight 1.0 and
#           expansion terms at 0.5 → top-5 docs/question.
# Weighted sum in integer HALF-micro units (2·micro for originals,
# 1·micro for expansion): the 0.5 weighting never touches floats, so
# the score is partition-order-independent by construction.

_PRF_FB = 3  # feedback depth (docs assumed relevant)
_PRF_EXP = 5  # expansion terms per question
_PRF_TOPK = 5


def _prf_oracle() -> str:
    return (
        _bm25_ctes()
        + f""",
fb AS (
  SELECT question_id, doc_id FROM (
    SELECT question_id, doc_id,
           row_number() OVER (PARTITION BY question_id
                              ORDER BY bm25 DESC, doc_id) AS rk
    FROM scored)
  WHERE rk <= {_PRF_FB}
),
df_all AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
tw AS (
  SELECT f.question_id, t.term,
         round(sum(CAST(round(round(t.tf * ln(s.n_docs / d.df), 6)
                              * 1000000, 0) AS BIGINT)) / 1000000.0, 6) AS tw
  FROM fb f JOIN tf t USING (doc_id)
  JOIN df_all d USING (term) CROSS JOIN stats s
  WHERE NOT EXISTS (SELECT 1 FROM qt x
                    WHERE x.question_id = f.question_id
                      AND x.term = t.term)
  GROUP BY f.question_id, t.term
),
exp AS (
  SELECT question_id, term FROM (
    SELECT *, row_number() OVER (PARTITION BY question_id
                                 ORDER BY tw DESC, term) AS rk
    FROM tw)
  WHERE rk <= {_PRF_EXP}
),
qt2 AS (
  SELECT question_id, term, 2 AS wgt FROM qt
  UNION ALL
  SELECT question_id, term, 1 AS wgt FROM exp
),
dfq2 AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM qt2) GROUP BY term
),
contrib2 AS (
  SELECT q.question_id, t.doc_id, q.wgt,
         round(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * t.tf * ({_BM25_K1} + 1)
               / (t.tf + {_BM25_K1} * (1 - {_BM25_B}
                                       + {_BM25_B} * t.dl / s.avgdl)), 6) AS w
  FROM tf t JOIN qt2 q USING (term) JOIN dfq2 d USING (term)
  CROSS JOIN stats s
),
prf AS (
  SELECT question_id, doc_id,
         round(sum(CAST(round(w * 1000000, 0) AS BIGINT) * wgt)
               / 2000000.0, 4) AS prf_score
  FROM contrib2 GROUP BY question_id, doc_id
)
SELECT question_id, doc_id, prf_score
FROM (SELECT *, row_number() OVER (PARTITION BY question_id
                                   ORDER BY prf_score DESC, doc_id) AS rn
      FROM prf)
WHERE rn <= {_PRF_TOPK}
"""
    )


@register("q_prf_expansion", oracle=_prf_oracle())
def q_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback expanded retrieval, top-5 per golden
    question — see the module comment above _PRF_FB for the two-probe
    recipe and the half-micro-unit weighting.

    Plan: pass 1 is the proven _bm25_scored stored-postings probe,
    COLLECTED — a bounded ≤|questions|·3-row collect (the k-means-
    centroid class; the feedback set is query metadata, like the
    question batch). Term mining then reads the DOC-KEYED twin of the
    stored TF-IDF index (api.ensure_tfidf_by_doc) with the
    feedback doc ids as a LITERAL In(doc_id, …) pushed into the scan —
    a point read; the term-clustered copy would scan every row group
    for a doc-keyed lookup. Original terms are excluded against the
    broadcast question relation and the weights aggregate in one
    exchange. The mined expansion terms are likewise collected
    (≤|questions|·5 rows) so pass 2's term predicate is again a
    LITERAL isin pushed into the postings scan — both probes keep the
    stored-index pushdown contract end-to-end."""
    from ..api import ensure_bm25_index, ensure_tfidf_by_doc
    from .questions import GOLDEN_QUESTIONS

    # ---- pass 1: feedback docs (bounded collect: ≤ |questions|·_PRF_FB)
    fb_w = Window.partitionBy("question_id").orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )
    fb_rows = (
        _bm25_scored(spark, sf_dir)
        .withColumn("rk", F.row_number().over(fb_w))
        .filter(F.col("rk") <= _PRF_FB)
        .select("question_id", "doc_id")
        .collect()
    )
    fb = spark.createDataFrame(
        sorted((r.question_id, r.doc_id) for r in fb_rows),
        "question_id INT, doc_id BIGINT",
    )
    fb_docs = sorted({r.doc_id for r in fb_rows})
    # ---- mine expansion terms from the doc-keyed stored index twin
    pairs = sorted(
        {(qid, w) for qid, q in GOLDEN_QUESTIONS for w in q.lower().split()}
    )
    qt = spark.createDataFrame(pairs, "question_id INT, term STRING")
    wtd = (
        spark.read.parquet(ensure_tfidf_by_doc(spark, sf_dir))
        .filter(F.col("doc_id").isin(fb_docs))
        .select("doc_id", "term", "w")
    )
    tw = (
        wtd.join(F.broadcast(fb), "doc_id")
        .join(F.broadcast(qt), ["question_id", "term"], "left_anti")
        .groupBy("question_id", "term")
        .agg(
            F.round(
                F.sum(F.round(F.col("w") * 1e6, 0).cast("long")) / F.lit(1e6),
                6,
            ).alias("tw")
        )
    )
    exp_w = Window.partitionBy("question_id").orderBy(
        F.desc("tw"), F.asc("term")
    )
    exp_rows = (  # bounded collect: ≤ |questions|·_PRF_EXP rows
        tw.withColumn("rk", F.row_number().over(exp_w))
        .filter(F.col("rk") <= _PRF_EXP)
        .select("question_id", "term")
        .collect()
    )
    # ---- pass 2: expanded probe, literal-term pushdown again
    qt2_rows = [(qid, t, 2) for qid, t in pairs] + [
        (r.question_id, r.term, 1) for r in exp_rows
    ]
    qt2 = spark.createDataFrame(
        sorted(qt2_rows), "question_id INT, term STRING, wgt INT"
    )
    terms2 = sorted({t for _, t, _ in qt2_rows})
    base = ensure_bm25_index(spark, sf_dir)
    stats = F.broadcast(spark.read.parquet(os.path.join(base, "stats")))
    tfq = spark.read.parquet(os.path.join(base, "postings")).filter(
        F.col("term").isin(terms2)
    )
    dfq = F.broadcast(tfq.groupBy("term").agg(F.count("*").alias("df")))
    contrib = (
        tfq.join(dfq, "term")
        .join(F.broadcast(qt2), "term")
        .crossJoin(stats)
        .select(
            "question_id",
            "doc_id",
            "wgt",
            F.round(
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("tf")
                * (_BM25_K1 + 1)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                ),
                6,
            ).alias("w"),
        )
    )
    prf = (
        contrib.repartition("question_id")
        .groupBy("question_id", "doc_id")
        .agg(
            F.round(
                F.sum(
                    F.round(F.col("w") * 1e6, 0).cast("long") * F.col("wgt")
                )
                / F.lit(2e6),
                4,
            ).alias("prf_score")
        )
    )
    fin_w = Window.partitionBy("question_id").orderBy(
        F.desc("prf_score"), F.asc("doc_id")
    )
    return (
        prf.withColumn("rn", F.row_number().over(fin_w))
        .filter(F.col("rn") <= _PRF_TOPK)
        .drop("rn")
    )
