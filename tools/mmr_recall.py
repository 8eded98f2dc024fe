"""Selection-overlap report: MMR over the ANN pool vs the exact pool.

The q_ann_recall analog for the composed retrieval ops (r9 verdict #5,
r10 verdict #2 — LSH and trained-IVF pools reported side by side):
per golden question, |selected_ann ∩ selected_exact| / k for the
final MMR selections, plus pool recall (how much of the exact top-20
pool the LSH candidate pool recovered). Run:

    python tools/mmr_recall.py [sf_dir ...]

Prints one line per scale factor with mean/min pool-recall@20 and
selection-overlap@5 — the number quoted in q_mmr_ann_pool's docstring.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_query_system_spark import registry  # noqa: E402
from document_query_system_spark.session import get_spark  # noqa: E402


def _selections(rows) -> dict:
    out: dict = {}
    for r in rows:
        out.setdefault(r.question_id, set()).add(r.doc_id)
    return out


def report(spark, sf_dir: str) -> dict:
    specs = registry.all_specs()
    ex = _selections(specs["q_mmr_diversify"].fn(spark, sf_dir).collect())
    if not ex:
        # Empty exact pool (e.g. a scale dir with no golden questions):
        # every overlap/recall mean below divides by the selection
        # count — mirror ivf_nprobe_curve.py's 'empty exact pool'
        # guard (r12 ADVICE) instead of raising ZeroDivisionError.
        return {"sf_dir": sf_dir, "n_questions": 0, "note": "empty exact pool"}
    an = _selections(specs["q_mmr_ann_pool"].fn(spark, sf_dir).collect())
    iv = _selections(specs["q_mmr_ivf_pool"].fn(spark, sf_dir).collect())
    # The promoted serving point (r13): scaled cells + calibrated
    # nprobe — its final-selection overlap vs the exact-pool MMR.
    sv = _selections(specs["q_mmr_ivf_serving"].fn(spark, sf_dir).collect())
    overlaps = [
        len(ex[q] & an.get(q, set())) / len(ex[q]) for q in sorted(ex)
    ]
    overlaps_ivf = [
        len(ex[q] & iv.get(q, set())) / len(ex[q]) for q in sorted(ex)
    ]
    overlaps_serving = [
        len(ex[q] & sv.get(q, set())) / len(ex[q]) for q in sorted(ex)
    ]
    # Pool recall@20 comes from the registered (driver-checkable)
    # report, so the tool and the oracle gate read the same numbers.
    recall_rows = specs["q_mmr_pool_recall"].fn(spark, sf_dir).collect()
    pr = [r.pool_recall for r in recall_rows]
    pri = [r.pool_recall_ivf for r in recall_rows]
    # The corpus-adaptive geometry's point on the sizing curve
    # (cells = ivf_cells_for(N), r12) — also a registered report.
    scaled_rows = specs["q_ivf_recall_scaled"].fn(spark, sf_dir).collect()
    prs = [r.pool_recall for r in scaled_rows]
    return {
        "ivf_cells_scaled": int(scaled_rows[0].cells),
        "ivf_probe_fraction_scaled": round(
            float(scaled_rows[0].nprobe) / float(scaled_rows[0].cells), 3
        ),
        "mean_pool_recall_ivf_scaled": round(sum(prs) / len(prs), 3),
        "min_pool_recall_ivf_scaled": round(min(prs), 3),
        "sf_dir": sf_dir,
        "n_questions": len(ex),
        "mean_overlap": round(sum(overlaps) / len(overlaps), 3),
        "min_overlap": round(min(overlaps), 3),
        "per_question": [round(o, 2) for o in overlaps],
        "mean_pool_recall": round(sum(pr) / len(pr), 3),
        "min_pool_recall": round(min(pr), 3),
        "mean_overlap_ivf": round(sum(overlaps_ivf) / len(overlaps_ivf), 3),
        "min_overlap_ivf": round(min(overlaps_ivf), 3),
        "per_question_ivf": [round(o, 2) for o in overlaps_ivf],
        "mean_pool_recall_ivf": round(sum(pri) / len(pri), 3),
        "min_pool_recall_ivf": round(min(pri), 3),
        "mean_overlap_serving": round(
            sum(overlaps_serving) / len(overlaps_serving), 3
        ),
        "min_overlap_serving": round(min(overlaps_serving), 3),
        "per_question_serving": [round(o, 2) for o in overlaps_serving],
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark(app_name="mmr-recall")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        print(report(spark, d))
    spark.stop()


if __name__ == "__main__":
    main()
