"""Mergeable frequency sketches: a count-min sketch (Cormode &
Muthukrishnan 2005) built with the engine-portable polynomial hash
family (functions/hashing.py), probed for the corpus heavy hitters.

Unlike the HLL/percentile sketches (A7 — Spark-internal hash
families, rows-only checkable), this sketch is built from OUR hash
family, so the full structure — cells, estimates, overcounts — is
bit-reproducible in DuckDB and the query carries a real value oracle.

Scale shape: the sketch is d×w counters (4×16 here; 4×2^20 in
production) produced by a partial-aggregable groupBy — every
partition collapses to ≤ d·w cells before the exchange, and two
sketches merge by cell-wise addition, which is exactly why CMS is
the standard distributed/streaming frequency structure (a
foreachBatch upsert on (row_i, cell) keeps it incrementally fresh;
see streaming/event_windows.py for that sink pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import P, token_hash, token_hash_sql, tokens, tokens_sql
from ..registry import register
from ..sources.tables import load

_CMS_W = 16  # counters per row — sized so the 31-term synthetic vocab
# actually collides (est > true on ~half the heavy hitters); in
# production w ≈ ceil(e/ε) for an ε·N error bound
_CMS_AB = [(1, 0), (31, 17), (131, 101), (1009, 907)]  # d=4 pairwise hashes
_CMS_TOPK = 20


def cms_cell_structs(h):
    """Array of (row_i, cell) structs for one hash column — the d
    CMS coordinates of a key. Shared with the streaming CMS
    (streaming/event_windows.py), which appends per-batch partial
    cells and merges by cell-wise sum."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (((h * a + b) % P) % _CMS_W).alias("cell"),
            )
            for i, (a, b) in enumerate(_CMS_AB)
        ]
    )


def cms_cells_sql(h_expr: str, src: str) -> str:
    """UNION ALL form of the same d coordinates for the DuckDB twin."""
    return " UNION ALL ".join(
        f"SELECT {i} AS row_i, (({h_expr}*{a}+{b}) % {P}) % {_CMS_W} AS cell FROM {src}"
        for i, (a, b) in enumerate(_CMS_AB)
    )


def _cms_sql() -> str:
    cells = " UNION ALL ".join(
        f"SELECT {i} AS row_i, ((h*{a}+{b}) % {P}) % {_CMS_W} AS cell, cnt, term FROM th"
        for i, (a, b) in enumerate(_CMS_AB)
    )
    return f"""
WITH toks AS (
  SELECT unnest({tokens_sql('text')}) AS term FROM documents
),
tc AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
th AS (SELECT t.term, t.cnt, {token_hash_sql('t.term')} AS h FROM tc t),
hashed AS ({cells}),
sketch AS (SELECT row_i, cell, sum(cnt) AS total FROM hashed GROUP BY row_i, cell),
probes AS (
  SELECT term, cnt FROM (
    SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rn FROM tc)
  WHERE rn <= {_CMS_TOPK}
),
est AS (
  -- CAST: sum()→HUGEINT in DuckDB; the driver's pandas hash renders
  -- HUGEINT as float64 vs Spark's int64 (r6 verdict bug class).
  SELECT h.term AS eterm, CAST(min(s.total) AS BIGINT) AS est_count
  FROM hashed h JOIN sketch s ON s.row_i = h.row_i AND s.cell = h.cell
  WHERE h.term IN (SELECT term FROM probes)
  GROUP BY h.term
)
SELECT p.term AS term, p.cnt AS true_count, e.est_count AS est_count,
       e.est_count - p.cnt AS overcount
FROM probes p JOIN est e ON e.eterm = p.term
"""


@register("q_heavy_hitters_cms", oracle=_cms_sql())
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over document token frequencies, probed for
    the top-20 true heavy hitters: (term, true_count, est_count,
    overcount). CMS guarantees est ≥ true; with w=16 the synthetic
    vocab collides, so overcount is a real, deterministic diagnostic
    (both engines compute identical cells — same hash family).

    Plan: ONE corpus-sized shuffle (term counts, map-side combined);
    everything after runs on vocabulary-sized data — the d·w-cell
    sketch aggregate, a 20-row probe set, and a cell-keyed equi-join
    back. At 100 TB the sketch build is a partial agg whose exchange
    carries ≤ d·w rows per partition, and sketches from disjoint
    corpus shards merge by cell-wise addition."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    # Lazily checkpointed: tc feeds the sketch build, the probe
    # top-k, AND the estimate join — without truncation Catalyst
    # re-derives the corpus-sized token aggregate per consumer.
    tc = (
        toks.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    th = tc.withColumn("h", token_hash(F.col("term")))
    hashed = th.select(
        "term",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        (((F.col("h") * a + b) % P) % _CMS_W).alias("cell"),
                    )
                    for i, (a, b) in enumerate(_CMS_AB)
                ]
            )
        ).alias("rc"),
    ).select("term", "cnt", F.col("rc.row_i").alias("row_i"), F.col("rc.cell").alias("cell"))
    sketch = hashed.groupBy("row_i", "cell").agg(F.sum("cnt").alias("total"))
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    probes = (
        tc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CMS_TOPK)
        .select("term", F.col("cnt").alias("true_count"))
    )
    est = (
        hashed.join(F.broadcast(probes.select("term")), "term")
        .join(sketch, ["row_i", "cell"])
        .groupBy("term")
        .agg(F.min("total").alias("est_count"))
    )
    return (
        probes.join(est, "term")
        .select(
            "term",
            "true_count",
            "est_count",
            (F.col("est_count") - F.col("true_count")).alias("overcount"),
        )
    )


_HLL_P = 8  # 2^8 = 256 buckets
_HLL_M = 1 << _HLL_P
# h is a uniform 32-bit integer (md5 prefix); the 24-bit suffix
# w = h // m ranges over [0, 2^24) and the textbook rank (Flajolet's
# rho = leading zeros of the suffix + 1) is 25 − bitlen(w), with the
# all-zero suffix defined as rho = 25. (An earlier form ranked
# suffix+1, under-reporting by 1 whenever the suffix was 0 or 2^k−1 —
# r6 ADVICE.) The polynomial token_hash is NOT usable here: on short
# numeric keys it never wraps P, so its high bits carry no entropy
# and the rank distribution collapses (measured 8× overestimate).
_HLL_WBITS = 24
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)  # Flajolet et al. 2007


def _hll_sql() -> str:
    key = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        "(a, c) -> a * 16 + c)"
    )
    return f"""
WITH h AS (SELECT {key} AS h FROM lineitem),
b AS (SELECT h % {_HLL_M} AS bucket, h // {_HLL_M} AS w FROM h),
m AS (SELECT bucket,
             CAST(max(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                           ELSE {_HLL_WBITS + 1} - length(bin(w)) END)
                  AS BIGINT) AS mj
      FROM b GROUP BY bucket),
s AS (SELECT sum(pow(2.0, -mj)) AS sp, count(*) AS n_present FROM m),
e AS (SELECT round(CAST({_HLL_ALPHA} AS DOUBLE) * {_HLL_M} * {_HLL_M}
                   / (sp + ({_HLL_M} - n_present)), 4) AS hll_estimate
      FROM s)
SELECT (SELECT count(DISTINCT l_partkey) FROM lineitem) AS exact_distinct,
       hll_estimate,
       round(abs(hll_estimate - (SELECT count(DISTINCT l_partkey) FROM lineitem))
             / (SELECT count(DISTINCT l_partkey) FROM lineitem), 4) AS rel_err
FROM e
"""


@register("q_hll_portable", oracle=_hll_sql())
def q_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built from the engine-portable hash family — the
    value-checkable twin of A7's rows-only approx_count_distinct
    (whose Spark-internal HLL++ sketch cannot be reproduced
    elsewhere). Hashes keys to a uniform 32-bit integer via an md5
    prefix (both engines produce identical hex), buckets on the low
    8 bits, ranks the remaining 24 with Flajolet's rho (leading
    zeros + 1 = 25 − bitlen, all-zero suffix → 25) via bin()-string
    length (integer-exact in both engines), and
    applies the raw HLL estimator; 2^-M sums are dyadic rationals, so
    they are bit-identical regardless of aggregation order. Emits the
    exact distinct count, the sketch estimate, and the relative error
    (expected ~1.04/√256 ≈ 6.5%). Raw estimator only — production
    adds the small-range linear-counting correction.

    Scale shape: one partial-aggregable groupBy producing ≤ 256
    (bucket, max-rank) cells per partition — like the CMS above, two
    HLL sketches merge by cell-wise max, which is why this is the
    distributed/streaming distinct-count structure."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    h = li.select(
        F.conv(F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h")
    )
    b = h.select(
        (F.col("h") % _HLL_M).alias("bucket"),
        F.floor(F.col("h") / _HLL_M).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(F.col("w")))
    )
    m = b.groupBy("bucket").agg(F.max(rho).alias("mj"))
    s = m.coalesce(1).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("sp"),
        F.count("*").alias("n_present"),
    )
    est = s.select(
        F.round(
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
            / (F.col("sp") + (F.lit(_HLL_M) - F.col("n_present"))),
            4,
        ).alias("hll_estimate")
    )
    exact = li.agg(F.countDistinct("l_partkey").alias("exact_distinct"))
    return (
        exact.crossJoin(F.broadcast(est))
        .select(
            "exact_distinct",
            "hll_estimate",
            F.round(
                F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
    )
