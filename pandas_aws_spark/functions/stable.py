"""Numerically-stable aggregate helpers for oracle-comparable results.

Double-precision SUM is not associative: Spark's partial aggregation
(map-side combine, then merge across shuffle partitions) and DuckDB's
parallel aggregation add the same values in different orders, so two
correct engines can disagree in the last few ULPs — enough to break a
value-hash comparison.

Fix: route floating sums through fixed-point decimal. Decimal addition
IS associative, so any grouping/ordering of partials yields the same
value; casting the final decimal back to DOUBLE then produces the same
IEEE-754 bits on both engines. The cast double->decimal(18,s) rounds
identically on both engines for the test data (money-like values far
from half-way points at scale 6).

The DuckDB oracle uses the literal SQL equivalents:

    dsum(c)       <->  CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE)
    dsum_mul(a,b) <->  CAST(SUM(CAST(a AS DECIMAL(18,6)) * CAST(b AS DECIMAL(18,6))) AS DOUBLE)
    davg(c)       <->  CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) / COUNT(c)

This costs a widened shuffle row (decimal128 vs 8-byte double) in
exchange for run-to-run AND engine-to-engine determinism — the right
trade for a correctness-gated pipeline; swap to plain double sums where
bit-stability is not required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "dec",
    "dsum",
    "dsum_mul",
    "davg",
    "dsum_micro",
    "SCALE",
    "sql_dsum",
    "sql_dsum_mul",
    "sql_davg",
    "sql_dsum_micro",
]

SCALE = 6
_DEC = T.DecimalType(18, SCALE)


def dec(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(_DEC)


def dsum(c: Column | str) -> Column:
    """Order-independent SUM(double) -> double."""
    return F.sum(dec(c)).cast("double")


def dsum_mul(a: Column | str, b: Column | str) -> Column:
    """Order-independent SUM(a*b) with fixed-point operands."""
    return F.sum(dec(a) * dec(b)).cast("double")


def dsum_micro(c: Column | str) -> Column:
    """Exact integer micro-units of a decimal SUM — NO double roundtrip
    anywhere (``dsum``'s final double cast loses the last micro once the
    scaled sum exceeds 2^53; this stays decimal end to end).
    Spark types: sum(decimal(18,6)) -> decimal(28,6); x decimal(7,0)
    -> decimal(36,6), still exact; cast long."""
    return (F.sum(dec(c)) * F.lit(1000000).cast("decimal(7,0)")).cast("long")


def davg(c: Column | str) -> Column:
    """Order-independent AVG: decimal sum, then one double division."""
    c = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec(c)).cast("double") / F.count(c)).cast("double")


# --- SQL-side mirrors (for building oracle strings) -----------------------


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{SCALE}))) AS DOUBLE)"


def sql_dsum_mul(a: str, b: str) -> str:
    return f"CAST(SUM(CAST({a} AS DECIMAL(18,{SCALE})) * CAST({b} AS DECIMAL(18,{SCALE}))) AS DOUBLE)"


def sql_dsum_micro(expr: str) -> str:
    """DuckDB mirror of :func:`dsum_micro`. The inner DECIMAL(25,6)
    re-cast keeps the product within DuckDB's 38-digit cap — a direct
    DECIMAL(38,6) x INT multiply silently falls back to DOUBLE."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,{SCALE}))) AS DECIMAL(25,{SCALE}))"
        f" * CAST(1000000 AS DECIMAL(7,0)) AS BIGINT)"
    )


def sql_davg(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,{SCALE}))) AS DOUBLE) / COUNT({expr}))"

