"""As-of (point-in-time) join — the canonical time-series operator
Spark lacks natively.

Semantics (``direction='backward'``, the default): for every left row,
attach the single right row with the greatest ``right_ts <= left_ts``
within the same key group — "the last quote before this trade", "the
most recent click before this purchase".

Implementation is the union-and-sweep rewrite, NOT a join:

* tag both inputs and union them (right rows sorted before left rows
  at equal timestamps, so the boundary is inclusive);
* one window pass per key, ordered by time, carries the latest right
  row forward via ``last(..., ignorenulls=True)``;
* keep the left rows.

Why this shape at 100 TB: a naive inequality join explodes to
|left| x |right| per key before ranking; the union-sweep is ONE
shuffle of |left| + |right| rows on the key and a linear scan within
each partition — the same cost as a group-by over the combined tables.
DuckDB's native ``ASOF JOIN`` replays it exactly for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: left rows + ``prefix``-named columns of the
    latest right row at-or-before each left timestamp (NULLs when no
    right row precedes). ``right`` should be unique per (on, right_ts)
    — pre-aggregate if not, or the carried row among equal timestamps
    is the unionwise-last, which is partition-order dependent.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]

    carried = [f"{prefix}{c}" for c in right_cols] + [f"{prefix}ts"]
    l_tagged = left.withColumn("_evt_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for rc, cc in zip(right_cols + [right_ts], carried):
        l_tagged = l_tagged.withColumn(cc, F.lit(None).cast(right.schema[rc if rc != right_ts else right_ts].dataType))

    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_evt_ts"),
        F.lit(0).alias("_side"),
        *[F.col(rc).alias(f"{prefix}{rc}") for rc in right_cols],
        F.col(right_ts).alias(f"{prefix}ts"),
    )
    for lc in left.columns:
        if lc not in on:
            r_tagged = r_tagged.withColumn(lc, F.lit(None).cast(left.schema[lc].dataType))

    left_rest = [c for c in left.columns if c not in on]
    both = l_tagged.select(*on, "_evt_ts", "_side", *left_rest, *carried).unionByName(
        r_tagged.select(*on, "_evt_ts", "_side", *left_rest, *carried),
        allowMissingColumns=False,
    )

    # right rows (_side=0) sort before left rows at the same instant ->
    # an equal-timestamp right row IS visible to the left row (inclusive
    # boundary, matching DuckDB ASOF's l.ts >= r.ts)
    w = (
        Window.partitionBy(*on)
        .orderBy("_evt_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for cc in carried:
        both = both.withColumn(cc, F.last(cc, ignorenulls=True).over(w))
    return both.filter(F.col("_side") == 1).drop("_evt_ts", "_side")
