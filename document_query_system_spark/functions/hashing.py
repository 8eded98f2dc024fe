"""Deterministic, engine-portable hashing primitives.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` use
different algorithms, so every operator that needs token hashes
(embedder, MinHash, SimHash, fingerprints) uses this shared
polynomial char-fold instead — same arithmetic on both engines, so
results stay oracle-checkable:

    h(token) = fold(ascii codes c): a ← (a*131 + c) mod 1_000_000_007

Each helper returns the Spark Column and the equivalent DuckDB SQL
fragment side by side; keeping them adjacent is what keeps them in
lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007
MULT = 131


def token_hash(token: Column) -> Column:
    """Polynomial hash of one token (Spark side)."""
    codes = F.transform(
        F.filter(F.split(token, ""), lambda c: c != F.lit("")), F.ascii
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * MULT + c.cast("long")) % P,
    )


def token_hash_sql(token_expr: str) -> str:
    """Same polynomial hash, DuckDB SQL. DuckDB's list_reduce has no
    init accumulator, so 0 is prepended to the code list — 0*131+c ≡
    Spark's aggregate() with a zero init."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({token_expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(a, c) -> (a * {MULT} + c) % {P})"
    )


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped (Spark's split keeps a
    trailing '' that DuckDB's doesn't — filtering makes them agree)."""
    return F.filter(F.split(text, " "), lambda t: t != F.lit(""))


def tokens_sql(text_expr: str) -> str:
    return f"list_filter(string_split({text_expr}, ' '), t -> t <> '')"


def token_hashes(text: Column) -> Column:
    """Array of token hashes for a text column (Spark side)."""
    return F.transform(tokens(text), token_hash)


def token_hashes_sql(text_expr: str) -> str:
    return f"list_transform({tokens_sql(text_expr)}, t -> {token_hash_sql('t')})"
