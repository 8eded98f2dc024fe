"""Bench contract: bench.py must print EXACTLY one JSON line with the
driver-required keys and no failed (-1.0) timings. Runs a small query
subset at sf0.001 via SPARK_GRAFT_BENCH_ONLY so the check is fast; the
JSON shape is identical to the full run the driver records."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        # Redirect the sidecar: the repo-root BENCH_FULL.json is the
        # tracked artifact of the last FULL bench run and a subset test
        # run must not clobber it (round-2 verdict housekeeping).
        SPARK_GRAFT_BENCH_SIDECAR="/tmp/bench_full_subset_test.json",
        # q_embed_pandas is deliberately in the subset: it is UDF-backed,
        # so this also regression-guards the addPyFile worker-shipping
        # path from a foreign cwd. q_stream_stateful_counts is too:
        # its applyInPandasWithState serializer emits pandas
        # FutureWarnings from worker stderr (4 copies in BENCH_r06's
        # captured tail) unless the session's PYTHONWARNINGS
        # suppression reaches the workers — the Python-warning half of
        # the tail-hygiene contract below.
        SPARK_GRAFT_BENCH_ONLY=(
            "q_scan_lineitem,q_join_hash,q_topk_per_question,q_embed_pandas,"
            "q_stream_stateful_counts"
        ),
    )
    env.pop("PYTHONWARNINGS", None)  # bench must self-suppress
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
        cwd="/tmp",  # foreign cwd, like the driver
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, out.stdout
    # The summary line must stay SHORT — the driver captures a bounded
    # stdout tail and round 1's full 120-entry line overflowed it.
    assert len(json_lines[0]) < 2000, len(json_lines[0])
    d = json.loads(json_lines[0])
    assert {"metric", "value", "unit", "queries", "sf"} <= set(d)
    assert d["unit"] == "sec" and d["sf"] == 0.001
    assert d["n_failed"] == 0
    subset = {
        "q_scan_lineitem", "q_join_hash", "q_topk_per_question",
        "q_embed_pandas", "q_stream_stateful_counts",
    }
    assert set(d["queries"]) <= subset
    assert all(v >= 0 for v in d["queries"].values()), d["queries"]
    # Sidecar carries the complete per-query map.
    with open(d["full_timings_file"]) as f:
        full = json.load(f)
    assert set(full["queries"]) == subset
    assert all(v >= 0 for v in full["queries"].values()), full["queries"]
    assert "BENCH-ERROR" not in out.stderr
    # r5 verdict item 7: cold (first-run, JIT included) AND steady-state
    # both reported, cold >= steady is the expected direction.
    assert full["value_cold"] is not None and d["value_cold"] is not None
    assert set(full["queries_cold"]) == set(full["queries"])
    # r5 verdict item 6 (r2 ADVICE, third recurrence): the driver
    # captures a bounded output tail — it must contain the JSON line
    # and no log4j WARN spray (streaming checkpoint/AQE notices,
    # function-replaced). The only WARNs allowed are the fixed JVM /
    # context-startup lines that print before any log level applies
    # (documented in BENCH_NOTES.md §tail).
    startup_ok = ("NativeCodeLoader",)
    tail_lines = (out.stdout + out.stderr).splitlines()[-25:]
    bad = [
        l
        for l in tail_lines
        if " WARN " in l and not any(p in l for p in startup_ok)
    ]
    assert bad == [], bad
    # ...and no Python warnings either (r6 verdict item 6, the fourth
    # recurrence of tail hygiene): the applyInPandasWithState
    # serializer's pandas FutureWarning shipped 4 copies into
    # BENCH_r06's tail. The session env suppression must reach worker
    # processes — checked against the WHOLE output, not just the tail.
    warn_lines = [
        l
        for l in (out.stdout + out.stderr).splitlines()
        if "Warning:" in l or "warnings.warn" in l
    ]
    assert warn_lines == [], warn_lines
