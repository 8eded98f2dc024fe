"""Partitioning-determinism audit (O3, SURVEY §2.9): every registered
query must produce byte-identical results at shuffle.partitions=3 and
=32 — the local stand-in for "results don't depend on cluster width",
which the driver's order-insensitive value-hash gate implicitly
requires and which every float-sum / top-k tiebreak convention in
registry.py exists to guarantee.

Two SEPARATE processes (not one session flipping the conf): stored
artifacts (vector/BM25/TF-IDF/co-order indexes, bucketed tables,
landing dirs) are memoized per session, so a single-session sweep
would only vary the PROBE-side partitioning. Separate processes
rebuild every artifact under each width — the build legs are audited
too.

Run:  python tools/determinism_sweep.py            # full sweep + log
      python tools/determinism_sweep.py hash N OUT # one leg (internal)

Writes DETERMINISM_SWEEP.json {n_queries, widths, mismatches, errors}.
"""

from __future__ import annotations

import datetime
import hashlib
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
WIDTHS = (3, 32)


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _hash_leg(width: int, out_path: str) -> None:
    """Child process: run every query at shuffle.partitions=width,
    write {name: sha256-of-sorted-normalized-rows or '!error'}."""
    from document_query_system_spark import registry
    from document_query_system_spark.session import get_spark

    spark = get_spark(
        app_name=f"dqs-determinism-{width}", shuffle_partitions=width
    )
    spark.sparkContext.setLogLevel("ERROR")
    hashes: dict[str, str] = {}
    for name, spec in sorted(registry.all_specs().items()):
        try:
            df = spec.fn(spark, SF_DIR)
            # The registered wrapper pins session confs per call but
            # never touches shuffle.partitions; assert the width held.
            assert spark.conf.get("spark.sql.shuffle.partitions") == str(width)
            cols = df.columns
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            rows = sorted(
                repr(tuple(_norm_cell(r[i]) for i in order))
                for r in df.collect()
            )
            h = hashlib.sha256()
            h.update(repr(sorted(cols)).encode())
            for r in rows:
                h.update(r.encode())
            hashes[name] = h.hexdigest()
        except Exception as exc:  # noqa: BLE001 — audit, record and go on
            hashes[name] = f"!error: {exc!r}"[:300]
        print(f"  [{width}] {name}: {hashes[name][:16]}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(hashes, f, indent=1, sort_keys=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "hash":
        _hash_leg(int(sys.argv[2]), sys.argv[3])
        return
    legs: dict[int, dict[str, str]] = {}
    for w in WIDTHS:
        out = f"/tmp/dqs_determinism_{w}.json"
        print(f"== leg shuffle.partitions={w} -> {out}", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "hash", str(w), out],
            cwd=REPO,
        )
        if r.returncode != 0:
            raise SystemExit(f"leg {w} failed rc={r.returncode}")
        legs[w] = json.load(open(out))
    a, b = (legs[w] for w in WIDTHS)
    names = sorted(set(a) | set(b))
    mismatches = {
        n: {str(WIDTHS[0]): a.get(n, "<missing>")[:80],
            str(WIDTHS[1]): b.get(n, "<missing>")[:80]}
        for n in names
        if a.get(n) != b.get(n)
    }
    errors = sorted(
        n for n in names
        if str(a.get(n, "")).startswith("!") or str(b.get(n, "")).startswith("!")
    )
    report = {
        "sf_dir": SF_DIR,
        "widths": list(WIDTHS),
        "n_queries": len(names),
        # Identical ERRORS are not evidence of determinism — a wrong
        # SF_DIR errors every query identically on both legs (r9
        # review). Only error-free hash matches count as identical,
        # and any error fails the sweep.
        "n_identical": sum(
            1
            for n in names
            if a.get(n) == b.get(n)
            and not str(a.get(n, "")).startswith("!")
        ),
        "mismatches": mismatches,
        "errors": errors,
    }
    out = os.path.join(REPO, "DETERMINISM_SWEEP.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({k: report[k] for k in
                      ("n_queries", "n_identical", "errors")}))
    print(f"wrote {out}")
    if mismatches or errors:
        print("MISMATCHES:", sorted(mismatches), "ERRORS:", errors)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
