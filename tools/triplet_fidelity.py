"""Fidelity report: ANN-pool triplet mining vs the exact scan.

The tools/mmr_recall.py analog for q_training_triplets_ann (r10
verdict #3): per scale factor, how many of the exact variant's
(anchor, positive, negative) triplets the IVF-pooled miner reproduces
(triplet overlap), and the mean-margin delta — a POSITIVE delta means
the pool's negatives are less hard than the corpus-hardest ones, the
quantified trade of mining inside nprobe cells instead of scanning
the corpus. Run:

    python tools/triplet_fidelity.py [sf_dir ...]

Numbers quoted in q_training_triplets_ann's docstring / SCALE.md.
"""

from __future__ import annotations

import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_query_system_spark import registry  # noqa: E402
from document_query_system_spark.session import get_spark  # noqa: E402


def report(spark, sf_dir: str) -> dict:
    specs = registry.all_specs()
    exact = {
        (r.anchor_id, r.positive_id, r.negative_id): r.margin
        for r in specs["q_training_triplets"].fn(spark, sf_dir).collect()
    }
    ann = {
        (r.anchor_id, r.positive_id, r.negative_id): r.margin
        for r in specs["q_training_triplets_ann"].fn(spark, sf_dir).collect()
    }
    # The scaled-geometry distributed miner (r12 verdict #4): cells =
    # ivf_cells_for(N) with the ratio-preserved deeper probe — at the
    # demo corpus the probe is exhaustive (nprobe >= cells), so its
    # overlap vs exact is expected to be ~1.0; at production N the
    # same plan reads a vanishing fraction.
    scaled = {
        (r.anchor_id, r.positive_id, r.negative_id): r.margin
        for r in specs["q_training_triplets_join"].fn(spark, sf_dir).collect()
    }
    def mean(vals) -> float | None:
        return round(statistics.mean(vals), 4) if vals else None

    return {
        "sf_dir": sf_dir,
        "n_exact": len(exact),
        "n_ann": len(ann),
        "n_scaled": len(scaled),
        # No triplets at all (no anchor has a same-label candidate) is
        # a reportable state, not a crash.
        "triplet_overlap": (
            round(len(set(exact) & set(ann)) / len(exact), 2) if exact else None
        ),
        "triplet_overlap_scaled": (
            round(len(set(exact) & set(scaled)) / len(exact), 2)
            if exact
            else None
        ),
        "mean_margin_exact": mean(list(exact.values())),
        "mean_margin_ann": mean(list(ann.values())),
        "mean_margin_scaled": mean(list(scaled.values())),
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        r = report(spark, d)
        delta = (
            round(r["mean_margin_ann"] - r["mean_margin_exact"], 4)
            if r["mean_margin_ann"] is not None
            and r["mean_margin_exact"] is not None
            else None
        )
        delta_s = (
            round(r["mean_margin_scaled"] - r["mean_margin_exact"], 4)
            if r["mean_margin_scaled"] is not None
            and r["mean_margin_exact"] is not None
            else None
        )
        print(
            f"{d}: exact={r['n_exact']} ann={r['n_ann']} "
            f"triplet_overlap={r['triplet_overlap']} "
            f"mean_margin exact={r['mean_margin_exact']} "
            f"ann={r['mean_margin_ann']} delta={delta} | "
            f"scaled: n={r['n_scaled']} "
            f"overlap={r['triplet_overlap_scaled']} "
            f"mean_margin={r['mean_margin_scaled']} delta={delta_s}"
        )


if __name__ == "__main__":
    main()
