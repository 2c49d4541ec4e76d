"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of :mod:`pandas_aws_spark.registry` — the engine's named
query corpus. Each query has a PySpark implementation and (where
SQL-expressible) a DuckDB oracle; see SURVEY.md §2 for the operator
inventory each entry covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pandas_aws_spark.registry import load_registry

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: TPC-H-Q1-shaped pricing summary
    (scan -> pushed filter -> partial+final hash agg -> sort)."""
    reg = load_registry()
    return reg["q01_pricing_summary"].fn(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-expressible
    query; non-SQL-expressible ops are omitted (driver does rows-only)."""
    return {
        name: spec.oracle for name, spec in load_registry().items() if spec.oracle is not None
    }
