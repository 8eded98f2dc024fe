"""Scale-up stress check: synthesize an N× documents/embeddings corpus
in /tmp (id-remapped copies of the sf0.1 driver tables) and time the
compute-heavy pipeline operators on it. The point is the *scaling
exponent*, not the absolute numbers: a near-linear wall-clock ratio at
10× is evidence the plan shapes (inverted-index dedup, salted cosine,
broadcast search) hold; a super-linear one is a cliff to fix.

Run: python tools/stress.py [factor] [query ...]   (default 10, all HEAVY)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from document_query_system_spark.session import get_spark  # noqa: E402
from document_query_system_spark.registry import all_specs  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEAVY = [
    "q_dedup_minhash_pairs",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_dedup_embedding_cosine",
    "q_dedup_embedding_lsh",
    "q_dedup_clusters",
    "q_embed_hash",
    "q_golden_vector_search",
    "q_ann_lsh",
    "q_ann_multiprobe",
    "q_ann_quantized",
    "q_cross_score",
    "q_quality_filter_chain",
    "q_sequence_pack",
    "q_token_budget_cap",
    "q_bm25_topk",
    "q_ann_pq",
    "q_ann_ivfpq",
    "q_lm_perplexity",
    "q_dup_span_frac",
    "q_quality_classifier",
    "q_dedup_levenshtein",
    "q_collocation_pmi",
    "q_cluster_kmeans",
    "q_dedup_semantic",
    "q_dedup_containment",
    "q_rrf_fusion",
    "q_dedup_tier_eval",
    "q_temperature_mix",
    "q_hard_negatives",
    "q_training_triplets",
    "q_training_triplets_ann",
    "q_ndcg_eval",
    "q_classifier_calibration",
    "q_heavy_hitters_cms",
    "q_phrase_search",
    "q_proximity_search",
    "q_mmr_diversify",
    "q_mmr_ann_pool",
    "q_mmr_ivf_pool",
    "q_ivf_recall_scaled",
    "q_mmr_ivf_serving",
    "q_training_triplets_join",
    "q_late_interaction",
    "q_prf_expansion",
    "q_vocab_coverage",
    "q_scene_changes",
    "q_corpus_refresh",
    "q_tfidf_topk",
]


def scale_corpus(spark, factor: int) -> str:
    out = f"/tmp/dqs_stress_x{factor}"
    if not os.path.exists(f"{out}/_done"):
        docs = spark.read.parquet(f"{BASE}/documents.parquet")
        n = docs.count()
        copies = spark.range(factor).select(F.col("id").alias("copy"))
        big = docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("copy") * n).alias("doc_id"),
            # Perturb the text per copy so copies are near- but not
            # exact duplicates (keeps dedup honest).
            F.when(F.col("copy") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" v"), F.col("copy")))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        big.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
        emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
        ne = emb.count()
        bige = emb.crossJoin(copies).select(
            (F.col("vec_id") + F.col("copy") * ne).alias("vec_id"),
            "embedding",
            "label",
        )
        bige.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
        open(f"{out}/_done", "w").write("ok")
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or HEAVY
    spark = get_spark(app_name="dqs-stress")
    path = scale_corpus(spark, factor)
    specs = all_specs()
    # Warm pools.
    spark.range(128).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    print(f"corpus: {factor}x at {path}")
    for name in names:
        times = {}
        for label, sf_dir in (("1x", BASE), (f"{factor}x", path)):
            t0 = time.perf_counter()
            try:
                specs[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[label] = time.perf_counter() - t0
            except Exception as exc:
                times[label] = float("nan")
                print(f"  ERROR {name}@{label}: {exc}")
        ratio = times.get(f"{factor}x", 0) / max(times.get("1x", 1e-9), 1e-9)
        print(
            f"{name:28s} 1x={times['1x']:6.2f}s {factor}x={times[f'{factor}x']:7.2f}s"
            f"  ratio={ratio:5.1f} (linear would be ≤{factor})"
        )


if __name__ == "__main__":
    main()
