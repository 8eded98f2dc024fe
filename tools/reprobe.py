"""Standalone re-probe with attribution (r11 verdict #2): run named
queries in a FRESH session at the bench scale factor, isolated from
the ~246-query suite, recording per-run wall time plus the JVM's
cumulative JIT-compilation and GC time deltas (bench.py's
golden_attrib counters) and the box load average — so a driver-sample
regression can be attributed (recompile / GC / box load / real plan
cost) before anyone touches a plan that has no diff.

Run: python tools/reprobe.py q_dedup_tier_eval q_stream_dedup ...
     [--runs N]  (default 3 steady runs after 1 cold run)
     [--band [--round rN]]  (band mode, see below)

Prints one JSON line per query:
  {"query": ..., "cold": {...}, "steady": [{...}, ...],
   "load_before": [...], "load_after": [...]}

Band mode (r14 verdict #4): ``--band`` measures every named query —
default: the ~20 historically driver-scattered ones (_BAND_QUERIES)
— and writes repo-root BANDS.json mapping each query to its
measured steady range, so the next round's verdict can classify
a driver sample MECHANICALLY (inside band = host noise class;
above band = investigate a plan diff) instead of re-arguing host
noise from ad-hoc reprobes. Refresh each round:
    python tools/reprobe.py --band --round r15

Band semantics, stated honestly: all named queries run SEQUENTIALLY
in ONE fresh session (per-query subprocesses would pay a JVM start +
full artifact rebuild each — ~30+ min for the default set), so
early-listed queries carry the session's tiered-compilation backlog
and late-listed ones its accumulated codegen profile; the per-run
jit/gc deltas printed alongside attribute exactly that. A re-run of
a SUBSET (--band q_x q_y) MERGES into the existing BANDS.json —
other queries' bands are preserved, never clobbered.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_query_system_spark import registry  # noqa: E402
from document_query_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: The historically driver-scattered set — every query a round-9..14
#: verdict or BENCH_NOTES entry had to reprobe-adjudicate at least
#: once (dedup family, eval harnesses, MMR/ANN servers, streaming,
#: the golden comparator). Band mode measures these by default.
_BAND_QUERIES = (
    "q_ann_recall",
    "q_bloom_prefilter_join",
    "q_dedup_containment",
    "q_dedup_embedding_lsh",
    "q_dedup_incremental",
    "q_dedup_keep_canonical",
    "q_dedup_levenshtein",
    "q_dedup_lines",
    "q_dedup_tier_eval",
    "q_extract_cascade",
    "q_golden_vector_search",
    "q_ivf_lifecycle_roundtrip",
    "q_late_interaction",
    "q_mmr_ann_pool",
    "q_mmr_diversify",
    "q_mmr_ivf_serving",
    "q_mmr_pool_recall",
    "q_ndcg_eval",
    "q_ocr_text",
    "q_pagerank",
    "q_prf_expansion",
    "q_python_datasource",
    "q_stream_dedup",
    "q_stream_ivf_maintenance",
    # r15 verdict #3/#4: the three untouched paths that swung 7-10× in
    # driver runs (q_dedup_embedding_lsh, q_dedup_incremental,
    # q_ocr_text) plus the scatter-class dedup trio member missing
    # from the set (q_dedup_containment) — added r16 so driver swings
    # on them are mechanically adjudicable.
)


def main() -> None:
    args: list[str] = []
    runs = 3
    band = False
    round_tag = None
    argv = sys.argv[1:]
    i = 0
    def _flag_value(flag: str) -> tuple[str, int]:
        """Value of ``--flag X`` or ``--flag=X`` at argv[i]; exits
        with a usage message when the value is missing (r15 review:
        a trailing valueless flag used to IndexError)."""
        if "=" in argv[i]:
            return argv[i].split("=", 1)[1], 1
        if i + 1 >= len(argv):
            sys.exit(f"usage: {flag} requires a value")
        return argv[i + 1], 2

    while i < len(argv):
        if argv[i] == "--runs" or argv[i].startswith("--runs="):
            v, step = _flag_value("--runs")
            runs = int(v)
            i += step
        elif argv[i] == "--band":
            band = True
            i += 1
        elif argv[i] == "--round" or argv[i].startswith("--round="):
            round_tag, step = _flag_value("--round")
            i += step
        else:
            args.append(argv[i])
            i += 1
    if band and not args:
        args = list(_BAND_QUERIES)
    spark = get_spark(app_name="dqs-reprobe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()

    def _counters() -> dict[str, int]:
        mf = spark._jvm.java.lang.management.ManagementFactory
        jit = int(mf.getCompilationMXBean().getTotalCompilationTime())
        gc_ms = 0
        it = mf.getGarbageCollectorMXBeans().iterator()
        while it.hasNext():
            gc_ms += int(it.next().getCollectionTime())
        return {"jit_ms": jit, "gc_ms": gc_ms}

    def timed(fn) -> dict:
        before = _counters()
        t0 = time.perf_counter()
        n = fn().count()
        wall = time.perf_counter() - t0
        after = _counters()
        return {
            "wall_sec": round(wall, 3),
            "rows": n,
            "jit_ms_delta": after["jit_ms"] - before["jit_ms"],
            "gc_ms_delta": after["gc_ms"] - before["gc_ms"],
        }

    # Same warmup discipline as bench.py: a trivial force + a tiny
    # mapInPandas so the first timed run isn't paying JVM/worker-pool
    # cold start it wouldn't pay inside the suite.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(128).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    records = []
    for name in args:
        spec = specs[name]
        load_before = list(os.getloadavg())
        rec = {
            "query": name,
            "sf_dir": SF_DIR,
            "load_before": [round(x, 2) for x in load_before],
            "cold": timed(lambda: spec.fn(spark, SF_DIR)),
            "steady": [
                timed(lambda: spec.fn(spark, SF_DIR)) for _ in range(runs)
            ],
        }
        rec["load_after"] = [round(x, 2) for x in os.getloadavg()]
        records.append(rec)
        print(json.dumps(rec))
    if band:
        # One committed artifact per refresh: query → one-session
        # steady band [min, max] (+ cold, the first-run ceiling), so a
        # verdict classifies driver samples against MEASURED ranges.
        # Band width reflects this box's scatter at measurement time;
        # a sample above max(cold, band_hi) is the investigate signal.
        # A subset run MERGES into the existing file (r15 review: a
        # one-query re-check used to clobber the other 19 bands).
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BANDS.json",
        )
        prior: dict = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    prior = json.load(f).get("queries", {})
            except (OSError, ValueError):
                prior = {}
        measured = {
            r["query"]: {
                "cold_sec": r["cold"]["wall_sec"],
                "band_sec": [
                    min(s["wall_sec"] for s in r["steady"]),
                    max(s["wall_sec"] for s in r["steady"]),
                ],
                "load_before": r["load_before"],
                "load_after": r["load_after"],
            }
            for r in records
        }
        out = {
            "sf_dir": SF_DIR,
            "runs_per_query": runs,
            **({"round": round_tag} if round_tag else {}),
            "queries": {**prior, **measured},
        }
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
        print(
            f"wrote {path} ({len(measured)} measured, "
            f"{len(out['queries'])} total)"
        )


if __name__ == "__main__":
    main()
