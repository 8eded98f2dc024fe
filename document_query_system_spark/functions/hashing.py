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


SHINGLE = 3  # token n-gram width shared by dedup + contamination


def shingle_hashes(ths: Column) -> Column:
    """Hashes of 3-token shingles from a token-hash array column:
    s_j = (h_j*31² + h_{j+1}*31 + h_{j+2}) mod P.

    Short-doc guard: Spark's ``sequence(1, 0)`` is DESCENDING
    ``[1, 0]`` (DuckDB's ``generate_series(1, 0)`` is empty), so a
    document with fewer than SHINGLE tokens must branch to an
    explicit empty array — otherwise ``element_at(ths, 0)`` aborts
    the whole job with INVALID_ARRAY_INDEX_IN_ELEMENT_AT.

    CALLER CONTRACT (measured 12× at sf0.1): ``ths`` must be a
    *staged* column reference (``select(token_hashes(...).alias(
    "ths"))`` first, then apply this to ``col("ths")``), never the
    inline ``token_hashes(...)`` expression — this body references
    ``ths`` 4 times per shingle, and Catalyst's CollapseProject
    would otherwise re-evaluate the whole O(chars) token-hash fold
    per reference, turning one corpus pass into O(tokens²·chars)."""
    n = F.size(ths)
    idx = F.when(
        n >= SHINGLE, F.sequence(F.lit(1), n - (SHINGLE - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda j: (
            F.element_at(ths, j) * (31 * 31)
            + F.element_at(ths, j + 1) * 31
            + F.element_at(ths, j + 2)
        )
        % P,
    )


def shingle_hashes_sql(ths_expr: str) -> str:
    return (
        f"list_transform(generate_series(1, greatest(len({ths_expr}) - {SHINGLE - 1}, 0)), "
        f"j -> ({ths_expr}[j] * {31 * 31} + {ths_expr}[j + 1] * 31 + {ths_expr}[j + 2]) % {P})"
    )
