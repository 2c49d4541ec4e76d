"""Vector (embedding) column math — JVM-side, no UDFs.

``embedding`` arrives as ``array<float>``; all math is done in
``array<double>`` with the dot product computed as a **sequential
left-to-right fold** in index order. Spark's ``F.aggregate`` and
DuckDB's ``list_reduce`` both fold arrays sequentially, and IEEE-754
double addition of identical operands in identical order is
deterministic — so cosine similarity is bit-identical across engines
without any decimal detour. (Decimal accumulation — used for row
aggregates in ``functions.stable`` — is NOT portable here: casting a
full-precision double to a scale-18 decimal lands sub-ULP from a
rounding boundary, and the two engines' double→decimal conversions
round a 1-ULP-different digit 18, observed as 1-ULP dot drift.)

Within one engine the fold is also partitioning-independent: the whole
reduction happens inside a single row's expression, never across rows.

At 100 TB these expressions run inside whole-stage codegen over the
array values; for very high dimensions a Pandas-UDF BLAS path would
win — that switch lives in the similarity operator, not here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["as_double", "dot", "norm", "cosine", "sql_dot", "sql_norm", "sql_cosine"]


def as_double(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (oracle mirror: ``list_reduce`` over
    the same element order)."""
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = dot/(|a||b|) — deterministic double ops on
    deterministic inputs, so bit-identical to the SQL mirror."""
    return dot(a, b) / (norm(a) * norm(b))


# --- DuckDB SQL mirrors ----------------------------------------------------
# a_ref/b_ref are SQL expressions of type DOUBLE[] (cast lists first).


def sql_dot(a_ref: str, b_ref: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a_ref})+1), i -> {a_ref}[i] * {b_ref}[i])), "
        f"(acc, p) -> acc + p)"
    )


def sql_norm(a_ref: str) -> str:
    return f"SQRT({sql_dot(a_ref, a_ref)})"


def sql_cosine(a_ref: str, b_ref: str) -> str:
    return f"({sql_dot(a_ref, b_ref)} / ({sql_norm(a_ref)} * {sql_norm(b_ref)}))"
