"""Single-pass column profiling (data-quality summary).

The reference validates schemas by hand when generating DDL
(``redshift.py:116-122``); a 100 TB pipeline needs the reverse — a
cheap profile of what actually landed: null counts, cardinality,
numeric ranges. This computes ALL metrics for ALL requested columns in
ONE aggregate over ONE scan (Catalyst plans the distinct counts with a
single expand), then unpivots the metric row into tidy long format with
``stack`` — no second pass, no driver-side loop.

Scale note: exact ``count_distinct`` per column shuffles the expanded
rows; at 100 TB swap ``exact_distinct=False`` to use HLL
(``approx_count_distinct``, no expansion, mergeable partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(df: DataFrame, cols: list[str], exact_distinct: bool = True) -> DataFrame:
    """Per-column profile: ``col_name, n_nulls, n_distinct, min_num,
    max_num`` (numeric min/max as double; -1.0 for non-numeric)."""
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("byte", "short", "integer", "long", "float", "double", "decimal")
    }
    aggs = []
    for c in cols:
        nd = F.count_distinct(F.col(c)) if exact_distinct else F.approx_count_distinct(c)
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"),
            nd.alias(f"nd_{c}"),
            (F.min(c).cast("double") if c in numeric else F.lit(-1.0)).alias(f"mn_{c}"),
            (F.max(c).cast("double") if c in numeric else F.lit(-1.0)).alias(f"mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols)
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct, min_num, max_num)"
        )
    )
