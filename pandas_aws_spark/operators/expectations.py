"""Declarative data-quality expectations (validation suite).

The reference validates inputs imperatively at the API boundary
(``s3.py:121-149`` type/format whitelists); a pipeline feeding a 100 TB
warehouse needs *data* validation: uniqueness, ranges, referential
integrity. Each expectation reduces to a violation-counting DataFrame
(anti-joins for integrity, filters for ranges), so the whole suite is a
union of tiny aggregates — every check pushes down to scans and
broadcast/shuffle joins; nothing touches the driver but the final
per-rule counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["expect_unique", "expect_condition", "expect_ref_integrity", "run_expectations"]


def expect_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations = rows beyond the first per key (0 when key is unique)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(F.sum(F.col("_n") - 1).cast("long").alias("n"))
    )


def expect_condition(df: DataFrame, violation_cond) -> DataFrame:
    """Violations = rows matching ``violation_cond``."""
    return df.filter(violation_cond).agg(F.count(F.lit(1)).alias("n"))


def expect_ref_integrity(child: DataFrame, fk: str, parent: DataFrame, pk: str) -> DataFrame:
    """Violations = child rows whose foreign key misses the parent
    (left-anti join; AQE broadcasts the parent when small)."""
    orphans = child.join(parent.select(F.col(pk).alias(fk)).distinct(), on=fk, how="left_anti")
    return orphans.agg(F.count(F.lit(1)).alias("n"))


def run_expectations(rules: dict[str, DataFrame]) -> DataFrame:
    """Union the named one-row violation counts into a report:
    ``rule, n_violations, passed``."""
    parts = [
        df.select(
            F.lit(name).alias("rule"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_violations"),
        )
        for name, df in rules.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)
