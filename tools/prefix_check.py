"""Driver-replica pre-flight for the CORRECTNESS prefix.

The external driver runs the first ~50 queries of ``queries()`` against
their oracles and compares row count, schema, and an order-insensitive
value hash computed THROUGH PANDAS — which is type-sensitive in ways
the fetchall()-based local suite is not (the r6 red row was a DuckDB
HUGEINT rendering as float64 against Spark's int64: every value equal,
hash red). This tool replicates that comparison as closely as the
driver's observable behavior allows:

- Spark side via ``df.toPandas()`` (Arrow), oracle side via DuckDB's
  ``.df()`` — the same pandas materialization paths;
- columns sorted by name, rows sorted by their full rendered tuple;
- every cell rendered through one canonical function where dtype
  leaks into the rendering exactly as it would into a hash
  (np.float64(5) -> '5.0' vs np.int64(5) -> '5').

Run: python tools/prefix_check.py [N]        (default 50 — first N)
     python tools/prefix_check.py LO HI      (slice [LO:HI] of the order)
Exit code 1 if any checked query mismatches.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from document_query_system_spark.registry import all_specs  # noqa: E402
from document_query_system_spark.session import get_spark  # noqa: E402
from document_query_system_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _render(v) -> str:
    """Dtype-sensitive canonical rendering: float-kind values keep a
    decimal point (as pandas would print them), ints don't, so an
    int64-vs-float64 divergence between engines changes the rendered
    value — the same failure surface as the driver's hash."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "<null>"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
    # Spark DateType → object-dtype datetime.date; DuckDB DATE →
    # datetime64 (midnight Timestamp). The driver's hash treats these
    # as equal — calibrated against q_date_funcs, which is date-typed
    # and driver-hash-green — so render dates as midnight timestamps.
    import datetime

    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return pd.Timestamp(v).isoformat()
    return repr(v)


def _canon(pdf: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_render(row[c]) for c in cols)
        for _, row in pdf.iterrows()
    ]
    rows.sort()
    return cols, rows


def main() -> None:
    if len(sys.argv) > 2:
        lo, hi = int(sys.argv[1]), int(sys.argv[2])
    else:
        lo, hi = 0, int(sys.argv[1]) if len(sys.argv) > 1 else 50
    specs = all_specs()
    prefix = list(specs)[lo:hi]
    spark = get_spark(app_name="dqs-prefix-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = []
    for name in prefix:
        spec = specs[name]
        try:
            s_pdf = spec.fn(spark, SF_DIR).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {exc}"))
            print(f"{name:32s} SPARK-ERROR {exc}")
            continue
        if spec.oracle is None:
            print(f"{name:32s} rows-only ({len(s_pdf)} rows)")
            continue
        d_pdf = con.execute(spec.oracle).df()
        s_cols, s_rows = _canon(s_pdf)
        d_cols, d_rows = _canon(d_pdf)
        if s_cols != d_cols:
            bad.append((name, f"columns {s_cols} != {d_cols}"))
            print(f"{name:32s} SCHEMA-MISMATCH")
        elif len(s_rows) != len(d_rows):
            bad.append((name, f"rows {len(s_rows)} != {len(d_rows)}"))
            print(f"{name:32s} ROWS-MISMATCH {len(s_rows)} vs {len(d_rows)}")
        elif s_rows != d_rows:
            diff = next(
                (i, a, b)
                for i, (a, b) in enumerate(zip(s_rows, d_rows))
                if a != b
            )
            bad.append((name, f"first diff row {diff}"))
            print(f"{name:32s} VALUE-MISMATCH {diff}")
        else:
            print(f"{name:32s} MATCH ({len(s_rows)} rows)")
    print(f"\n{len(prefix) - len(bad)}/{len(prefix)} green")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
