"""Benchmark harness (BASELINE.md protocol, B4 + flagship B3).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop writer (full plan runs, nothing
collected to the driver) — measures engine time, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from document_query_system_spark import registry
from document_query_system_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="dqs-bench")
    specs = registry.all_specs()

    # JVM/codegen warmup on a trivial plan so q1 doesn't pay startup.
    _force(spark.read.parquet(f"{sf_dir}/region.parquet"))

    timings: dict[str, float] = {}
    t_total0 = time.perf_counter()
    for name in sorted(specs):
        t0 = time.perf_counter()
        try:
            _force(specs[name].fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # record failures, keep benching
            timings[name] = -1.0
            print(f"BENCH-ERROR {name}: {exc}", file=sys.stderr)
    total = round(time.perf_counter() - t_total0, 3)

    print(
        json.dumps(
            {
                "metric": "queries_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "n_queries": len(timings),
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
