"""Physical-plan inspection: the ".explain and iterate" loop as code
(build guidance: after each operator works, check the plan IS the plan
you'd want at 1000× the data, not the first one that passed).

``plan_report`` extracts the scale-relevant facts from an executed
plan:

- exchanges (every one is a shuffle — the thing to minimize),
- broadcast exchanges / BNLJ (fine only when a side is small by
  design),
- SortAggregate (struct-valued or otherwise non-hashable aggregation
  buffers falling out of whole-stage codegen),
- Parquet scans with their ReadSchema + PushedFilters (column pruning
  and predicate pushdown actually reaching the reader).

``tests/test_plan_quality.py`` pins these per query; the audit loop
there is how several real regressions in this engine were found
(filter-pushdown alias inlining below a repartition, single-task
compute stages).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    n_exchanges: int = 0
    n_broadcasts: int = 0
    n_bnlj: int = 0
    n_sort_aggregates: int = 0
    n_codegen_spans: int = 0
    n_spread_repartitions: int = 0
    scans: list[dict] = field(default_factory=list)
    raw: str = ""

    @property
    def n_shuffles(self) -> int:
        """Keyed data-moving exchanges (broadcasts counted separately).

        Round-robin exchanges whose partition count matches a
        sources.tables.spread() call are excluded: those fan a
        one-row-group local parquet file across cores — a
        test-fixture artifact that does not exist on a real
        multi-file table, not a join/agg shuffle the plan needs.
        Other round-robin repartitions (a future query's own
        df.repartition(n)) stay inside the budget — spread() uses a
        distinctive 2×cores+1 count so the two don't collide."""
        return (
            self.n_exchanges - self.n_broadcasts - self.n_spread_repartitions
        )


def _explain_formatted(df: DataFrame) -> str:
    """explain("formatted") as a string — the un-truncated form (plain
    toString() abbreviates long FileScan lines, losing PushedFilters)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_report(df: DataFrame) -> PlanReport:
    plan = _explain_formatted(df)
    rep = PlanReport(raw=plan)
    # Formatted mode prints each node in the tree AND as a numbered
    # "(N) NodeName" detail block — count detail headers only.
    rep.n_exchanges = len(re.findall(r"\(\d+\) (?:Exchange|BroadcastExchange)\b", plan))
    rep.n_broadcasts = len(re.findall(r"\(\d+\) BroadcastExchange\b", plan))
    rep.n_bnlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin\b", plan))
    rep.n_sort_aggregates = len(re.findall(r"\(\d+\) SortAggregate\b", plan))
    rep.n_codegen_spans = len(re.findall(r"WholeStageCodegen", plan))
    # Each scan node has an indented detail block.
    from ..sources.tables import SPREAD_COUNTS

    for block in re.split(r"\n\(\d+\) ", plan):
        if block.startswith("Exchange"):
            m = re.search(r"RoundRobinPartitioning\((\d+)\)", block)
            if m and int(m.group(1)) in SPREAD_COUNTS:
                rep.n_spread_repartitions += 1
        if not block.startswith("Scan parquet"):
            continue
        cols = re.search(r"ReadSchema: struct<([^>]*)>", block)
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        loc = re.search(r"Location: \S+ \[([^\]]*)\]", block)
        rep.scans.append(
            {
                "columns": cols.group(1) if cols else "",
                "pushed": pf.group(1) if pf else "",
                "location": loc.group(1) if loc else "",
            }
        )
    return rep


def audit(df: DataFrame, name: str = "", shuffle_budget: int = 4) -> list[str]:
    """Red-flag heuristics for one query plan. Returns human-readable
    warnings; empty list = nothing suspicious. ``shuffle_budget``
    raises the exchange bar for composed queries whose legs each
    justify their own budget (callers document the arithmetic)."""
    rep = plan_report(df)
    warns: list[str] = []
    if rep.n_sort_aggregates:
        warns.append(
            f"{name}: {rep.n_sort_aggregates} SortAggregate node(s) — "
            "aggregation buffer not hash-able (struct-valued agg?)"
        )
    for s in rep.scans:
        cols = [c for c in s["columns"].split(",") if c.strip()]
        if len(cols) > 8:
            warns.append(
                f"{name}: scan reads {len(cols)} columns — check projection pruning"
            )
    if rep.n_shuffles > shuffle_budget:
        warns.append(f"{name}: {rep.n_shuffles} shuffles — check for redundant exchanges")
    return warns
