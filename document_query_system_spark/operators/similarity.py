"""Approximate nearest-neighbor search over the embeddings table.

Three tiers, trading recall for scan cost (SURVEY.md §4.1, the 100 TB
north star for similarity search):

- exact brute force: q_vector_topk (functions/vector.py) — broadcast
  queries, full scan, O(Q·N) cosine folds;
- q_ann_lsh: random-hyperplane LSH — sign-bit bucket per vector, join
  only within buckets: candidate set shrinks ~2^planes ×, scan becomes
  a bucket-key equi-join;
- q_ann_ivf: IVF-style coarse quantization — centroid per label
  partition, probe only the query's nearest partition (here nprobe=1).

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
from ..functions.vector import DIM, dot, l2_norm

N_PLANES = 4
_TOP_K = 5


def _planes() -> list[list[float]]:
    rng = random.Random(42)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(DIM)] for _ in range(N_PLANES)
    ]


PLANES = _planes()


def _planes_sql() -> list[str]:
    return ["[" + ", ".join(repr(x) for x in p) + "]" for p in PLANES]


def _bucket_expr(v: Column) -> Column:
    """LSH bucket id: sign bit of <v, plane_i> for each hyperplane."""
    b = F.lit(0)
    for i, plane in enumerate(PLANES):
        p = F.array(*[F.lit(x) for x in plane])
        b = b + F.when(dot(v, p) > 0, F.lit(2 ** (N_PLANES - 1 - i))).otherwise(
            F.lit(0)
        )
    return b


def _bucket_sql(v_expr: str) -> str:
    terms = [
        f"(CASE WHEN list_dot_product({v_expr}, {p}) > 0 "
        f"THEN {2 ** (N_PLANES - 1 - i)} ELSE 0 END)"
        for i, p in enumerate(_planes_sql())
    ]
    return " + ".join(terms)


_ANN_LSH_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
bucketed AS (
  SELECT vec_id, v, {_bucket_sql('v')} AS bucket FROM e
),
q AS (SELECT vec_id, v, bucket FROM bucketed WHERE vec_id < 5),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS match_id, q.bucket AS bucket,
         round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))),
               6) AS cos_sim
  FROM q JOIN bucketed c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
)
SELECT query_id, match_id, bucket, cos_sim
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rn
      FROM scored)
WHERE rn <= {_TOP_K}
"""


@register("q_ann_lsh", oracle=_ANN_LSH_SQL)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-k: bucket every vector by 4 sign
    bits, then search only within the query's bucket — the candidate
    join key is the bucket id, so the all-pairs scan never happens."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucketed = e.select("vec_id", "v", _bucket_expr(F.col("v")).alias("bucket"))
    q = bucketed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    c = bucketed.select(
        F.col("vec_id").alias("match_id"),
        F.col("v").alias("cv"),
        F.col("bucket").alias("cbucket"),
    )
    cos = dot(F.col("qv"), F.col("cv")) / (
        l2_norm(F.col("qv")) * l2_norm(F.col("cv"))
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("qbucket") == F.col("cbucket"))
            & (F.col("query_id") != F.col("match_id")),
        )
        .select(
            "query_id",
            "match_id",
            F.col("qbucket").alias("bucket"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
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
    joined = model.approxSimilarityJoin(q, unit, 1.0, distCol="l2_dist")
    return (
        joined.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("match_id"),
            F.round("l2_dist", 6).alias("l2_dist"),
        )
    )


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
  WHERE rn = 1
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
    probes its nearest centroid's partition only (nprobe=1). At scale
    the vector table is partitioned by list id, so a probe reads one
    partition instead of the full table. Centroid components are
    rounded to 6 before distance ranking so the probe choice is
    engine-stable."""
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
        .filter(F.col("rn") == 1)
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
