"""Point-in-interval (range) join without a cartesian product.

Spark has no native range-join optimization (Databricks' range-join
hint is proprietary), so a naive ``ON p.ts BETWEEN i.start AND i.end``
with no equi-key plans as BroadcastNestedLoopJoin — O(points x
intervals) comparisons, unusable at 100 TB. The scalable re-expression
is *bucket expansion*: quantize time into fixed buckets, explode each
interval into the buckets it covers, and equi-join points to exploded
intervals on the bucket id, keeping the exact range predicate as a
residual filter. Cost becomes O(points + intervals x avg_buckets) with
an ordinary shuffled hash join that AQE can also skew-split.

Pick ``bucket`` near the typical interval length: too small explodes
the interval side, too large packs many points per bucket and the
residual filter does the work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def _bucket(col: Column, bucket_us: int) -> Column:
    # Integer division in the JVM long domain — us-epoch never overflows.
    return (F.unix_micros(col) / F.lit(bucket_us)).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``start <= point_ts < end``. Returns points columns + intervals
    columns. Each (point, interval) pair appears exactly once: a point
    owns ONE bucket, and an interval's exploded bucket list is
    distinct, so no post-join dedup is needed.
    """
    unit_us = {"1 hour": 3_600_000_000, "1 minute": 60_000_000, "1 day": 86_400_000_000}
    bucket_us = unit_us[bucket]
    expl = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(_bucket(F.col(start_col), bucket_us), _bucket(F.col(end_col), bucket_us))
        ),
    )
    pts = points.withColumn("_bucket", _bucket(F.col(point_ts), bucket_us))
    cond = (
        (pts["_bucket"] == expl["_bucket"])
        & (pts[point_ts] >= expl[start_col])
        & (pts[point_ts] < expl[end_col])
    )
    return pts.join(expl, cond).drop("_bucket")
