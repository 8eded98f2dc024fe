"""Standalone re-probe with attribution (r11 verdict #2): run named
queries in a FRESH session at the bench scale factor, isolated from
the ~246-query suite, recording per-run wall time plus the JVM's
cumulative JIT-compilation and GC time deltas (bench.py's
golden_attrib counters) and the box load average — so a driver-sample
regression can be attributed (recompile / GC / box load / real plan
cost) before anyone touches a plan that has no diff.

Run: python tools/reprobe.py q_dedup_tier_eval q_stream_dedup ...
     [--runs N]  (default 3 steady runs after 1 cold run)

Prints one JSON line per query:
  {"query": ..., "cold": {...}, "steady": [{...}, ...],
   "load_before": [...], "load_after": [...]}
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


def main() -> None:
    args: list[str] = []
    runs = 3
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i].startswith("--runs"):
            if "=" in argv[i]:
                runs = int(argv[i].split("=", 1)[1])
                i += 1
            else:
                runs = int(argv[i + 1])
                i += 2
        else:
            args.append(argv[i])
            i += 1
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
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
