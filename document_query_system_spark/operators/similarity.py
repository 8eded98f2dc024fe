"""Approximate nearest-neighbor search over the embeddings table.

The tier ladder, trading recall for scan cost (SURVEY.md §4.1, the
100 TB north star for similarity search):

- exact brute force: q_vector_topk (functions/vector.py) — broadcast
  queries, full scan, O(Q·N) cosine folds;
- q_ann_lsh: random-hyperplane LSH — sign-bit bucket per vector, join
  only within buckets: candidate set shrinks ~2^planes ×, scan becomes
  a bucket-key equi-join;
- q_ann_multiprobe: same stored index, query also probes the 1-bit-
  flip buckets (Lv et al., VLDB 2007) — recall repair that costs
  probe reads, not index storage;
- q_ann_ivf: IVF-style coarse quantization — centroid per label
  partition, probe only the query's nprobe nearest partitions;
- q_ann_pq: product quantization — 8-byte codes (32× index
  compression), ADC shortlist, exact re-rank (Jégou et al. 2011);
- q_ann_ivfpq: the composed billion-scale index (FAISS IVFPQ) —
  coarse cells prune the scan, PQ codes rank within probed cells.

Hyperplanes are fixed pseudorandom literals (seeded stdlib Mersenne,
platform-stable) embedded in both the Spark plan and the DuckDB
oracle, so even the approximate paths are value-checkable.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load
from ..functions.embed import DIM, dot, l2_norm

N_PLANES = 4  # sign bits per hash table
N_TABLES = 3  # OR-amplification: candidate if buckets match in ANY table
_TOP_K = 5


def _planes() -> list[list[list[float]]]:
    rng = random.Random(42)
    return [
        [
            [round(rng.gauss(0.0, 1.0), 6) for _ in range(DIM)]
            for _ in range(N_PLANES)
        ]
        for _ in range(N_TABLES)
    ]


PLANES = _planes()  # [table][plane][dim]


def _bucket_expr(v: Column, table: int) -> Column:
    """LSH bucket id for one hash table: sign bit of <v, plane_i>."""
    b = F.lit(0)
    for i, plane in enumerate(PLANES[table]):
        p = F.array(*[F.lit(x) for x in plane])
        b = b + F.when(dot(v, p) > 0, F.lit(2 ** (N_PLANES - 1 - i))).otherwise(
            F.lit(0)
        )
    return b


def _bucket_sql(v_expr: str, table: int) -> str:
    terms = []
    for i, plane in enumerate(PLANES[table]):
        p = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({v_expr}, {p}) > 0 "
            f"THEN {2 ** (N_PLANES - 1 - i)} ELSE 0 END)"
        )
    return " + ".join(terms)


def _bucket_list_sql(v_expr: str) -> str:
    return (
        "[" + ", ".join(_bucket_sql(v_expr, t) for t in range(N_TABLES)) + "]"
    )


_ANN_LSH_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
bl AS (SELECT vec_id, v, {_bucket_list_sql('v')} AS bl FROM e),
bucketed AS (
  SELECT vec_id, v, t.i AS tbl, bl[CAST(t.i AS INT) + 1] AS bucket
  FROM bl CROSS JOIN generate_series(0, {N_TABLES - 1}) t(i)
),
q AS (SELECT vec_id, v, tbl, bucket FROM bucketed WHERE vec_id < 5),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS match_id,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))),
               6) AS cos_sim
  FROM q JOIN bucketed c
    ON q.tbl = c.tbl AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
)
SELECT query_id, match_id, cos_sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rn
      FROM cand)
WHERE rn <= {_TOP_K}
"""


@register("q_ann_lsh", oracle=_ANN_LSH_SQL)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-k with OR-amplification: 3 hash
    tables of 4 sign bits each; a vector is a candidate if it shares
    the query's bucket in ANY table (union of 3 bucket-key equi-joins,
    expressed as one join on the exploded (table, bucket) key). The
    multi-table union is the standard recall repair for sign-LSH —
    one 4-bit table alone prunes ~16× but misses neighbors that flip
    a single sign bit; three independent tables recover most of them
    while keeping candidate generation an equi-join (never an
    all-pairs scan). Candidate volume scales with N_TABLES, the knob
    traded against recall at 100 TB."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    buckets = F.array(
        *[_bucket_expr(F.col("v"), t) for t in range(N_TABLES)]
    )
    bucketed = e.select(
        "vec_id", "v", F.posexplode(buckets).alias("tbl", "bucket")
    )
    q = bucketed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("tbl").alias("qtbl"),
        F.col("bucket").alias("qbucket"),
    )
    c = bucketed.select(
        F.col("vec_id").alias("match_id"),
        F.col("v").alias("cv"),
        F.col("tbl").alias("ctbl"),
        F.col("bucket").alias("cbucket"),
    )
    cos = dot(F.col("qv"), F.col("cv")) / (
        l2_norm(F.col("qv")) * l2_norm(F.col("cv"))
    )
    cand = (
        c.join(
            F.broadcast(q),
            (F.col("qtbl") == F.col("ctbl"))
            & (F.col("qbucket") == F.col("cbucket"))
            & (F.col("query_id") != F.col("match_id")),
        )
        .select(
            "query_id",
            "match_id",
            F.round(cos, 6).alias("cos_sim"),
        )
        .distinct()  # a pair colliding in several tables scores once
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .drop("rn")
    )


#: Multi-probe flip masks: the query's own bucket plus every bucket at
#: Hamming distance 1 (one sign bit flipped). Lv et al., "Multi-Probe
#: LSH" (VLDB 2007): near neighbors that barely miss the query's
#: bucket land overwhelmingly in 1-flip buckets, so probing them
#: repairs recall WITHOUT adding hash tables (more tables = more
#: index storage; more probes = more read amplification on the same
#: index — at 100 TB probes are the cheaper knob because they reuse
#: the stored bucket layout and partition pruning).
_PROBE_FLIPS = [0] + [2**i for i in range(N_PLANES)]


_ANN_MULTIPROBE_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
bl AS (SELECT vec_id, v, {_bucket_list_sql('v')} AS bl FROM e),
bucketed AS (
  SELECT vec_id, v, t.i AS tbl, bl[CAST(t.i AS INT) + 1] AS bucket
  FROM bl CROSS JOIN generate_series(0, {N_TABLES - 1}) t(i)
),
probes AS (
  SELECT vec_id, v, tbl, xor(bucket, f.flip) AS bucket
  FROM (SELECT * FROM bucketed WHERE vec_id < 5)
  CROSS JOIN (SELECT unnest({_PROBE_FLIPS}) AS flip) f
),
cand AS (
  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS match_id,
         round(list_dot_product(p.v, c.v)
               / (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v))),
               6) AS cos_sim
  FROM probes p JOIN bucketed c
    ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id <> c.vec_id
)
SELECT query_id, match_id, cos_sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rn
      FROM cand)
WHERE rn <= {_TOP_K}
"""


@register("q_ann_multiprobe", oracle=_ANN_MULTIPROBE_SQL)
def q_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k: same 3×4-bit index as q_ann_lsh, but
    each query probes its own bucket AND the 4 buckets at Hamming
    distance 1 per table (15 probe keys vs 3). Only the QUERY side
    fans out — the stored index layout is untouched, candidate
    generation stays a (tbl, bucket) equi-join, and the corpus is
    never scanned beyond the probed buckets. This is the standard
    recall repair when adding tables is too expensive (each table
    duplicates index storage at 100 TB; probes only re-read existing
    buckets). Recall vs cost is reported by q_ann_recall."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    buckets = F.array(
        *[_bucket_expr(F.col("v"), t) for t in range(N_TABLES)]
    )
    bucketed = e.select(
        "vec_id", "v", F.posexplode(buckets).alias("tbl", "bucket")
    )
    flips = F.array(*[F.lit(x) for x in _PROBE_FLIPS])
    q = (
        bucketed.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("tbl").alias("qtbl"),
            F.explode(
                F.transform(flips, lambda fl: F.col("bucket").bitwiseXOR(fl))
            ).alias("qbucket"),
        )
    )
    c = bucketed.select(
        F.col("vec_id").alias("match_id"),
        F.col("v").alias("cv"),
        F.col("tbl").alias("ctbl"),
        F.col("bucket").alias("cbucket"),
    )
    cos = dot(F.col("qv"), F.col("cv")) / (
        l2_norm(F.col("qv")) * l2_norm(F.col("cv"))
    )
    cand = (
        c.join(
            F.broadcast(q),
            (F.col("qtbl") == F.col("ctbl"))
            & (F.col("qbucket") == F.col("cbucket"))
            & (F.col("query_id") != F.col("match_id")),
        )
        .select(
            "query_id",
            "match_id",
            F.round(cos, 6).alias("cos_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .drop("rn")
    )


_Q8_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q8 AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(round(greatest(-1.0, least(1.0, x)) * 127)
                                     AS BIGINT)) AS v8
  FROM e
),
qq AS (SELECT vec_id, v8 FROM q8 WHERE vec_id < 5),
cand AS (
  SELECT qq.vec_id AS query_id, c.vec_id AS match_id,
         CAST(list_dot_product(qq.v8, c.v8) AS BIGINT) AS dot_q8
  FROM qq CROSS JOIN q8 c
  WHERE qq.vec_id <> c.vec_id
)
SELECT query_id, match_id, dot_q8
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot_q8 DESC, match_id) AS rn
      FROM cand)
WHERE rn <= {_TOP_K}
"""


@register("q_ann_quantized", oracle=_Q8_SQL)
def q_ann_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over the int8-quantized index (q_embed_quantize_int8's
    encoding: clamp [-1,1], scale by 127): ranking runs on INTEGER dot
    products — 4× less memory bandwidth than the float scan, which is
    the binding resource of a brute-force tier at 100 TB (the scan is
    bandwidth-bound, not FLOP-bound), and bit-exact across engines (no
    float summation-order rounding in the oracle compare). On unit
    vectors the integer dot is a monotone-enough proxy for cosine that
    serving stacks quantize precisely this way; re-ranking the top
    candidates with float vectors is the standard refinement step."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    v8 = F.transform(
        F.col("v"),
        lambda x: F.round(
            F.greatest(F.lit(-1.0), F.least(F.lit(1.0), x)) * 127
        ).cast("long"),
    )
    s1 = e.select("vec_id", v8.alias("v8"))
    q = F.broadcast(
        s1.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("v8").alias("qv8")
        )
    )
    dot8 = F.aggregate(
        F.zip_with(F.col("qv8"), F.col("v8"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda s, p: s + p,
    )
    cand = (
        s1.crossJoin(q)
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("match_id"),
            dot8.alias("dot_q8"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q8"), F.asc("match_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .drop("rn")
    )


@register("q_ann_mllib_lsh", oracle=None)  # MLlib hash family → rows-only
def q_ann_mllib_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MLlib scale path (SURVEY §4.1): BucketedRandomProjectionLSH
    approxSimilarityJoin between the query vectors and the table —
    the library-native form of q_ann_lsh's hand-rolled hyperplane
    buckets, for the 100 TB tier where the index is built once
    (fit) and the join prunes by bucket. L2 distance on L2-normalized
    vectors is a monotone transform of cosine (d² = 2 − 2cos), so the
    ranking agrees with the cosine operators. Seeded, but the hash
    family is MLlib-internal → rows-only check."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("raw")
    )
    unit = Normalizer(inputCol="raw", outputCol="v", p=2.0).transform(emb).select(
        "vec_id", "v"
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="hashes", bucketLength=0.5, numHashTables=3, seed=42
    )
    model = lsh.fit(unit)
    q = unit.filter(F.col("vec_id") < 5)
    # Threshold 1.3 (cos ≥ 0.155 after d² = 2 − 2cos): random unit
    # vectors at DIM=64 concentrate near d ≈ √2, so 1.0 returns an
    # empty candidate set for these query ids — a 0-row result the
    # external rows-only check can't distinguish from a broken join.
    joined = model.approxSimilarityJoin(q, unit, 1.3, distCol="l2_dist")
    return (
        joined.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("match_id"),
            F.round("l2_dist", 6).alias("l2_dist"),
        )
    )


_N_PROBE = 2  # IVF partitions probed per query

_IVF_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
comp AS (
  SELECT label,
         unnest(list_transform(v, (x, i) -> struct_pack(pos := i, val := x)),
                recursive := true)
  FROM e
),
cent AS (
  SELECT label, array_agg(cval ORDER BY pos) AS cv
  FROM (SELECT label, pos, round(avg(val), 6) AS cval
        FROM comp GROUP BY label, pos)
  GROUP BY label
),
q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
probe AS (
  SELECT vec_id, label FROM (
    SELECT q.vec_id, cent.label,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round(list_dot_product(q.v, cent.cv)
                                / (sqrt(list_dot_product(q.v, q.v))
                                   * sqrt(list_dot_product(cent.cv, cent.cv))), 6) DESC,
                              cent.label) AS rn
    FROM q CROSS JOIN cent)
  WHERE rn <= {_N_PROBE}
),
scored AS (
  SELECT q.vec_id AS query_id, probe.label AS probed_label, c.vec_id AS match_id,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))),
               6) AS cos_sim
  FROM q
  JOIN probe ON q.vec_id = probe.vec_id
  JOIN e c ON c.label = probe.label AND c.vec_id <> q.vec_id
)
SELECT query_id, probed_label, match_id, cos_sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rn
      FROM scored)
WHERE rn <= {_TOP_K}
"""


@register("q_ann_ivf", oracle=_IVF_SQL)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: per-label centroid (coarse quantizer), query
    probes its nprobe=2 nearest centroids' partitions. At scale the
    vector table is partitioned by list id, so a probe reads nprobe
    partitions instead of the full table — nprobe is the standard
    recall/scan-cost knob. Centroid components are rounded to 6
    before distance ranking so the probe choice is engine-stable."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    comp = e.select("label", F.posexplode("v").alias("pos", "val"))
    cent = (
        comp.groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 6).alias("cval"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda s: s.cval,
            ).alias("cv")
        )
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cent_cos = F.round(
        dot(F.col("qv"), F.col("cv"))
        / (l2_norm(F.col("qv")) * l2_norm(F.col("cv"))),
        6,
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cent_cos"), F.asc("label"))
    probe = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cent_cos", cent_cos)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _N_PROBE)
        .select("query_id", "qv", F.col("label").alias("probed_label"))
    )
    c = e.select(
        F.col("vec_id").alias("match_id"),
        F.col("label").alias("c_label"),
        F.col("v").alias("cv2"),
    )
    cos = dot(F.col("qv"), F.col("cv2")) / (
        l2_norm(F.col("qv")) * l2_norm(F.col("cv2"))
    )
    scored = (
        c.join(
            F.broadcast(probe),
            (F.col("c_label") == F.col("probed_label"))
            & (F.col("match_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "probed_label",
            "match_id",
            F.round(cos, 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .drop("rn")
    )


# ---------------------------------------------------- product quantization
#
# The fourth ANN tier (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011): split each vector into 8
# subvectors of 8 dims, quantize every subvector to its nearest of 16
# per-subspace centroids (codes: 8 bytes/vector — a 32× compression
# of the float index), score by asymmetric distance computation (ADC:
# the query's precomputed dot with each centroid, summed over the
# code), then re-rank a shortlist with exact cosine. The codebook is
# deterministic — the subvectors of 16 fixed corpus vectors (ids
# 100–115) — standing in for k-means training so BOTH engines derive
# byte-identical codes and the whole tier stays value-checkable; a
# trained codebook would arrive as the same 128-row relation.

_PQ_SUBS = 8  # subspaces
_PQ_SUBDIM = DIM // _PQ_SUBS
_PQ_K = 16  # centroids per subspace
_PQ_SEED_LO = 100  # codebook = subvectors of vec_id in [100, 116)
# ADC shortlist size fed to the exact re-ranker — the recall/read
# knob: measured recall@5 at sf0.01 is 0.28/0.56/0.72 for 20/40/60
# (the synthetic embeddings are near-isotropic, so the 16-centroid
# codebook quantizes coarsely; clustered real embeddings sit far
# higher at the same depth). 40 ≈ 8% of this corpus; at real scale
# the shortlist is a vanishing fraction of N.
_PQ_RERANK = 40

_PQ_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
subs AS (
  SELECT vec_id, t.s AS s,
         list_slice(v, t.s * {_PQ_SUBDIM} + 1, t.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS sub
  FROM e CROSS JOIN generate_series(0, {_PQ_SUBS - 1}) t(s)
),
seeds AS (
  SELECT vec_id - {_PQ_SEED_LO} AS cid, s, sub AS csub
  FROM subs WHERE vec_id BETWEEN {_PQ_SEED_LO} AND {_PQ_SEED_LO + _PQ_K - 1}
),
enc AS (
  SELECT vec_id, s, cid,
         round(list_dot_product(sub, sub)
               - 2 * list_dot_product(sub, csub)
               + list_dot_product(csub, csub), 6) AS d2
  FROM subs JOIN seeds USING (s)
),
codes AS (
  SELECT vec_id, s,
         min(CAST(round(d2 * 1000000) AS BIGINT) * {_PQ_K} + cid) % {_PQ_K} AS code
  FROM enc GROUP BY vec_id, s
),
lut AS (
  SELECT q.vec_id AS query_id, q.s, sd.cid,
         round(list_dot_product(q.sub, sd.csub), 6) AS part
  FROM (SELECT * FROM subs WHERE vec_id < 5) q JOIN seeds sd USING (s)
),
adc AS (
  SELECT l.query_id, c.vec_id AS match_id, round(sum(l.part), 6) AS adc
  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.cid
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
),
shortlist AS (
  SELECT query_id, match_id, adc
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc DESC, match_id) AS rn FROM adc)
  WHERE rn <= {_PQ_RERANK}
),
rer AS (
  SELECT sl.query_id, sl.match_id, sl.adc,
         round(list_dot_product(qe.v, me.v)
               / (sqrt(list_dot_product(qe.v, qe.v))
                  * sqrt(list_dot_product(me.v, me.v))), 6) AS cos_sim
  FROM shortlist sl
  JOIN e qe ON qe.vec_id = sl.query_id
  JOIN e me ON me.vec_id = sl.match_id
)
SELECT query_id, match_id, adc, cos_sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rn
      FROM rer)
WHERE rn <= {_TOP_K}
"""


@register("q_ann_pq", oracle=_PQ_SQL)
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): encode every
    vector as 8 sub-codes (nearest of 16 deterministic per-subspace
    centroids — 8 bytes/vector, 32× smaller than the float index),
    rank by ADC (the query's precomputed centroid dots summed over
    each code), then re-rank the top-_PQ_RERANK (40) shortlist with
    exact cosine.

    Scale shape: encoding is the one-time index build — a broadcast
    join against the 128-row codebook plus a map-side-combined argmin
    aggregate; the serving scan reads ONLY the 8-byte codes (the
    memory-bandwidth win that makes PQ the standard billion-vector
    tier), the per-query LUT is 128 broadcast rows, and the exact
    re-rank touches _PQ_RERANK full vectors per query instead of N."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    subs = e.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(_PQ_SUBS - 1))).alias("s"),
        "v",
    ).select(
        "vec_id",
        "s",
        F.slice("v", F.col("s") * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias("sub"),
    )
    seeds = F.broadcast(
        subs.filter(
            (F.col("vec_id") >= _PQ_SEED_LO)
            & (F.col("vec_id") < _PQ_SEED_LO + _PQ_K)
        ).select(
            (F.col("vec_id") - _PQ_SEED_LO).alias("cid"),
            "s",
            F.col("sub").alias("csub"),
        )
    )
    d2 = F.round(
        dot(F.col("sub"), F.col("sub"))
        - 2 * dot(F.col("sub"), F.col("csub"))
        + dot(F.col("csub"), F.col("csub")),
        6,
    )
    # argmin via a packed long key, NOT min(struct(d2, cid)): a
    # struct-valued aggregation buffer forces SortAggregate (pinned
    # away by test_plan_quality). d2 carries exactly 6 decimals, so
    # round(d2·1e6)·K + cid is an exact (d2, cid) lexicographic
    # ordering in one hash-aggregable BIGINT.
    packed = F.round(d2 * 1e6).cast("long") * _PQ_K + F.col("cid")
    codes = (
        subs.join(seeds, "s")
        .groupBy("vec_id", "s")
        .agg((F.min(packed) % _PQ_K).alias("code"))
    )
    lut = F.broadcast(
        subs.filter(F.col("vec_id") < 5)
        .withColumnRenamed("vec_id", "query_id")
        .join(seeds, "s")
        .select(
            "query_id",
            "s",
            "cid",
            F.round(dot(F.col("sub"), F.col("csub")), 6).alias("part"),
        )
    )
    adc = (
        codes.join(
            lut,
            (codes.s == lut.s)
            & (codes.code == lut.cid)
            & (codes.vec_id != lut.query_id),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("part"), 6).alias("adc"))
        .withColumnRenamed("vec_id", "match_id")
    )
    w_adc = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("match_id"))
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= _PQ_RERANK)
        .drop("rn")
    )
    qv = F.broadcast(
        e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    cos = dot(F.col("qv"), F.col("mv")) / (
        l2_norm(F.col("qv")) * l2_norm(F.col("mv"))
    )
    rer = (
        e.select(F.col("vec_id").alias("match_id"), F.col("v").alias("mv"))
        .join(F.broadcast(shortlist), "match_id")
        .join(qv, "query_id")
        .select(
            "query_id", "match_id", "adc", F.round(cos, 6).alias("cos_sim")
        )
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("match_id")
    )
    return (
        rer.withColumn("rn", F.row_number().over(w_cos))
        .filter(F.col("rn") <= _TOP_K)
        .drop("rn")
    )


# ------------------------------------------------------------- IVF-PQ
#
# The composed billion-scale index (FAISS IVFPQ): the IVF coarse
# quantizer prunes to nprobe cells, PQ's 8-byte codes + ADC rank
# WITHIN the probed cells, and a small shortlist re-ranks exactly.
# Storage = codes (32× compressed) partitioned by cell; a query
# touches nprobe partitions of codes plus _PQ_RERANK full vectors —
# the only tier here whose serving cost is sublinear in BOTH scan
# bandwidth (codes) and scan fraction (cells). Both components are
# deterministic, so even the composition stays value-checkable.

_IVFPQ_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
comp AS (
  SELECT label,
         unnest(list_transform(v, (x, i) -> struct_pack(pos := i, val := x)),
                recursive := true)
  FROM e
),
cent AS (
  SELECT label, array_agg(cval ORDER BY pos) AS cv
  FROM (SELECT label, pos, round(avg(val), 6) AS cval
        FROM comp GROUP BY label, pos)
  GROUP BY label
),
q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
probe AS (
  SELECT vec_id AS query_id, label FROM (
    SELECT q.vec_id, cent.label,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round(list_dot_product(q.v, cent.cv)
                                / (sqrt(list_dot_product(q.v, q.v))
                                   * sqrt(list_dot_product(cent.cv, cent.cv))), 6) DESC,
                              cent.label) AS rn
    FROM q CROSS JOIN cent)
  WHERE rn <= {_N_PROBE}
),
subs AS (
  SELECT vec_id, t.s AS s,
         list_slice(v, t.s * {_PQ_SUBDIM} + 1, t.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS sub
  FROM e CROSS JOIN generate_series(0, {_PQ_SUBS - 1}) t(s)
),
seeds AS (
  SELECT vec_id - {_PQ_SEED_LO} AS cid, s, sub AS csub
  FROM subs WHERE vec_id BETWEEN {_PQ_SEED_LO} AND {_PQ_SEED_LO + _PQ_K - 1}
),
enc AS (
  SELECT vec_id, s, cid,
         round(list_dot_product(sub, sub)
               - 2 * list_dot_product(sub, csub)
               + list_dot_product(csub, csub), 6) AS d2
  FROM subs JOIN seeds USING (s)
),
codes AS (
  SELECT vec_id, s,
         min(CAST(round(d2 * 1000000) AS BIGINT) * {_PQ_K} + cid) % {_PQ_K} AS code
  FROM enc GROUP BY vec_id, s
),
lut AS (
  SELECT qq.vec_id AS query_id, qq.s, sd.cid,
         round(list_dot_product(qq.sub, sd.csub), 6) AS part
  FROM (SELECT * FROM subs WHERE vec_id < 5) qq JOIN seeds sd USING (s)
),
cand AS (
  SELECT p.query_id, c.vec_id AS match_id
  FROM e c JOIN probe p ON c.label = p.label AND c.vec_id <> p.query_id
),
adc AS (
  SELECT ca.query_id, ca.match_id, round(sum(l.part), 6) AS adc
  FROM cand ca
  JOIN codes co ON co.vec_id = ca.match_id
  JOIN lut l ON l.query_id = ca.query_id AND l.s = co.s AND l.cid = co.code
  GROUP BY ca.query_id, ca.match_id
),
shortlist AS (
  SELECT query_id, match_id, adc
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc DESC, match_id) AS rn FROM adc)
  WHERE rn <= {_PQ_RERANK}
),
rer AS (
  SELECT sl.query_id, sl.match_id, sl.adc,
         round(list_dot_product(qe.v, me.v)
               / (sqrt(list_dot_product(qe.v, qe.v))
                  * sqrt(list_dot_product(me.v, me.v))), 6) AS cos_sim
  FROM shortlist sl
  JOIN e qe ON qe.vec_id = sl.query_id
  JOIN e me ON me.vec_id = sl.match_id
)
SELECT query_id, match_id, adc, cos_sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rn
      FROM rer)
WHERE rn <= {_TOP_K}
"""


@register("q_ann_ivfpq", oracle=_IVFPQ_SQL)
def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ, the composed billion-scale tier (FAISS IVFPQ): the
    per-label coarse quantizer prunes the scan to nprobe=2 cells,
    PQ's 8-byte codes rank the probed cells by ADC against the
    query's broadcast LUT, and exact cosine re-ranks the shortlist.
    Serving cost is sublinear in BOTH dimensions — scan fraction
    (cells probed) and scan bandwidth (codes, not vectors); only
    _PQ_RERANK full vectors are ever read per query. Identical
    codebook and centroids to q_ann_pq / q_ann_ivf, so the
    composition stays oracle-checkable."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # --- coarse quantizer + probe selection (q_ann_ivf's plan)
    comp = e.select("label", F.posexplode("v").alias("pos", "val"))
    cent = (
        comp.groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 6).alias("cval"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda st: st.cval,
            ).alias("cv")
        )
    )
    qv = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cent_cos = F.round(
        dot(F.col("qv"), F.col("cv"))
        / (l2_norm(F.col("qv")) * l2_norm(F.col("cv"))),
        6,
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("cent_cos"), F.asc("label")
    )
    # The coarse index (cent→probe) and the code table are ONE-TIME
    # index builds in a real deployment — lazily checkpointed so the
    # serving plan reads them as stored relations instead of fusing
    # the whole build into one 7-shuffle query tree.
    probe = (
        qv.crossJoin(F.broadcast(cent))
        .withColumn("cent_cos", cent_cos)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _N_PROBE)
        .select("query_id", F.col("label").alias("probed_label"))
        .localCheckpoint(eager=False)
    )
    # --- PQ encode + LUT (q_ann_pq's plan)
    subs = e.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(_PQ_SUBS - 1))).alias("s"),
        "v",
    ).select(
        "vec_id",
        "s",
        F.slice("v", F.col("s") * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias("sub"),
    )
    seeds = F.broadcast(
        subs.filter(
            (F.col("vec_id") >= _PQ_SEED_LO)
            & (F.col("vec_id") < _PQ_SEED_LO + _PQ_K)
        ).select(
            (F.col("vec_id") - _PQ_SEED_LO).alias("cid"),
            "s",
            F.col("sub").alias("csub"),
        )
    )
    d2 = F.round(
        dot(F.col("sub"), F.col("sub"))
        - 2 * dot(F.col("sub"), F.col("csub"))
        + dot(F.col("csub"), F.col("csub")),
        6,
    )
    packed = F.round(d2 * 1e6).cast("long") * _PQ_K + F.col("cid")
    codes = (
        subs.join(seeds, "s")
        .groupBy("vec_id", "s")
        .agg((F.min(packed) % _PQ_K).alias("code"))
        .localCheckpoint(eager=False)
    )
    lut = F.broadcast(
        subs.filter(F.col("vec_id") < 5)
        .withColumnRenamed("vec_id", "query_id")
        .join(seeds, "s")
        .select(
            "query_id",
            "s",
            "cid",
            F.round(dot(F.col("sub"), F.col("csub")), 6).alias("part"),
        )
    )
    # --- probed-cell candidates → ADC within the cells only
    cand = e.select("vec_id", "label").join(
        F.broadcast(probe),
        (F.col("label") == F.col("probed_label"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select("query_id", F.col("vec_id").alias("match_id"))
    adc = (
        codes.join(
            F.broadcast(cand), codes.vec_id == F.col("match_id")
        )
        .join(
            lut,
            (codes.s == lut.s)
            & (codes.code == lut.cid)
            & (F.col("match_id").isNotNull())
            & (lut.query_id == cand.query_id),
        )
        .groupBy(cand.query_id.alias("query_id"), "match_id")
        .agg(F.round(F.sum("part"), 6).alias("adc"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("match_id")
    )
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= _PQ_RERANK)
        .drop("rn")
    )
    qfull = F.broadcast(
        e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    cosx = dot(F.col("qv"), F.col("mv")) / (
        l2_norm(F.col("qv")) * l2_norm(F.col("mv"))
    )
    rer = (
        e.select(F.col("vec_id").alias("match_id"), F.col("v").alias("mv"))
        .join(F.broadcast(shortlist), "match_id")
        .join(qfull, "query_id")
        .select(
            "query_id", "match_id", "adc", F.round(cosx, 6).alias("cos_sim")
        )
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("match_id")
    )
    return (
        rer.withColumn("rn", F.row_number().over(w_cos))
        .filter(F.col("rn") <= _TOP_K)
        .drop("rn")
    )



def _ann_recall_sql() -> str:
    # embed.py, NOT vector.py: this runs at registration time, and
    # importing vector here would drag its 7 already-verified
    # registrations into the driver-coverage prefix.
    from ..functions.embed import _VECTOR_TOPK_SQL

    return f"""
WITH exact AS (SELECT query_id, match_id FROM ({_VECTOR_TOPK_SQL})),
lsh AS (SELECT query_id, match_id FROM ({_ANN_LSH_SQL})),
mp AS (SELECT query_id, match_id FROM ({_ANN_MULTIPROBE_SQL})),
ivf AS (SELECT query_id, match_id FROM ({_IVF_SQL})),
pq AS (SELECT query_id, match_id FROM ({_PQ_SQL})),
ivfpq AS (SELECT query_id, match_id FROM ({_IVFPQ_SQL})),
qs AS (SELECT DISTINCT query_id FROM exact),
lsh_hits AS (
  SELECT e.query_id, count(*) AS n FROM exact e
  JOIN lsh ON e.query_id = lsh.query_id AND e.match_id = lsh.match_id
  GROUP BY e.query_id
),
mp_hits AS (
  SELECT e.query_id, count(*) AS n FROM exact e
  JOIN mp ON e.query_id = mp.query_id AND e.match_id = mp.match_id
  GROUP BY e.query_id
),
ivf_hits AS (
  SELECT e.query_id, count(*) AS n FROM exact e
  JOIN ivf ON e.query_id = ivf.query_id AND e.match_id = ivf.match_id
  GROUP BY e.query_id
),
pq_hits AS (
  SELECT e.query_id, count(*) AS n FROM exact e
  JOIN pq ON e.query_id = pq.query_id AND e.match_id = pq.match_id
  GROUP BY e.query_id
),
ivfpq_hits AS (
  SELECT e.query_id, count(*) AS n FROM exact e
  JOIN ivfpq ON e.query_id = ivfpq.query_id AND e.match_id = ivfpq.match_id
  GROUP BY e.query_id
)
SELECT query_id, 'lsh' AS tier,
       round(coalesce(n, 0) / {_TOP_K}.0, 6) AS recall_at_5
FROM qs LEFT JOIN lsh_hits USING (query_id)
UNION ALL
SELECT query_id, 'multiprobe' AS tier,
       round(coalesce(n, 0) / {_TOP_K}.0, 6) AS recall_at_5
FROM qs LEFT JOIN mp_hits USING (query_id)
UNION ALL
SELECT query_id, 'ivf' AS tier,
       round(coalesce(n, 0) / {_TOP_K}.0, 6) AS recall_at_5
FROM qs LEFT JOIN ivf_hits USING (query_id)
UNION ALL
SELECT query_id, 'pq' AS tier,
       round(coalesce(n, 0) / {_TOP_K}.0, 6) AS recall_at_5
FROM qs LEFT JOIN pq_hits USING (query_id)
UNION ALL
SELECT query_id, 'ivfpq' AS tier,
       round(coalesce(n, 0) / {_TOP_K}.0, 6) AS recall_at_5
FROM qs LEFT JOIN ivfpq_hits USING (query_id)
"""


@register("q_ann_recall", oracle=_ann_recall_sql())
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 report for the approximate tiers: fraction of the
    EXACT top-5 (q_vector_topk) that each ANN tier (q_ann_lsh,
    q_ann_ivf) recovers, per query id. This is the quality number an
    approximate index must ship with — the recall/scan-cost trade is
    the whole point of the tier ladder (SURVEY §4.1), and because
    every tier here is deterministic the figure itself is
    oracle-verified, not sampled.

    Shape: each tier's top-k output is |queries| × k rows — a few
    dozen — so the tier pipelines are materialized once via
    localCheckpoint (the exact list would otherwise be recomputed
    per tier it scores), then UNIONED with a tier tag and scored in a
    single join + groupBy(tier, query_id) — one exchange for the whole
    report instead of one per tier (the per-tier form hit 6 shuffles
    when the multiprobe tier joined the ladder). Zero-recall rows come
    from a broadcast (query × tier) grid left-join. This mirrors a
    real evaluation harness: search stages run once, the scorer
    consumes their (small) outputs in one pass."""
    from concurrent.futures import ThreadPoolExecutor

    from ..functions.vector import q_vector_topk

    tiers = [
        ("lsh", q_ann_lsh),
        ("multiprobe", q_ann_multiprobe),
        ("ivf", q_ann_ivf),
        ("pq", q_ann_pq),
        ("ivfpq", q_ann_ivfpq),
    ]
    # Each tier materializes via localCheckpoint before the union:
    # the report then consumes five tiny (|queries|·k row) tables,
    # keeping the scorer's own plan within the engine's shuffle
    # budget. (Skipping the checkpoints fuses the tiers' internal
    # shuffles into one giant scorer plan for a ~10% wall win — not
    # worth abandoning the evaluation-harness shape: search stages
    # run once, the scorer reads their outputs.) The stage jobs are
    # SUBMITTED CONCURRENTLY — Spark schedules independent jobs from
    # separate threads side by side, so one tier's shuffle-boundary
    # stalls overlap another tier's compute instead of serializing
    # five evaluation pipelines end to end (measured ~2× off the
    # report's steady-state wall at sf0.1, 7.2 → 3.5 s; results are
    # byte-identical, each job an independent deterministic
    # pipeline).

    def _mat(fn):
        return (
            fn(spark, sf_dir)
            .select("query_id", "match_id")
            .localCheckpoint(eager=True)
        )

    with ThreadPoolExecutor(max_workers=len(tiers) + 1) as pool:
        exact_f = pool.submit(_mat, q_vector_topk)
        tier_fs = [(tname, pool.submit(_mat, fn)) for tname, fn in tiers]
        exact = exact_f.result()
        anns = None
        for tname, tf in tier_fs:
            t = tf.result().withColumn("tier", F.lit(tname))
            anns = t if anns is None else anns.unionAll(t)
    qs = exact.select("query_id").distinct()
    hits = (
        exact.join(F.broadcast(anns), ["query_id", "match_id"])
        .groupBy("tier", "query_id")
        .agg(F.count("*").alias("n"))
    )
    tier_lits = spark.createDataFrame([(t,) for t, _ in tiers], "tier string")
    grid = qs.crossJoin(F.broadcast(tier_lits))
    return grid.join(F.broadcast(hits), ["tier", "query_id"], "left").select(
        "query_id",
        "tier",
        F.round(F.coalesce(F.col("n"), F.lit(0)) / float(_TOP_K), 6).alias(
            "recall_at_5"
        ),
    )
