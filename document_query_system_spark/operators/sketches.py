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
  SELECT h.term AS eterm, min(s.total) AS est_count
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
