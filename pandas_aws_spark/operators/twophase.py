"""Two-phase global-ordering primitives (scale-safe rank / ntile / cumsum).

A ``Window.orderBy(...)`` with no partition spec funnels the entire
input through ONE task — fine on per-group aggregates at sf0.1, a
stall at 10^8+ rows on a 1000-executor cluster. These helpers compute
the same answers with the classic two-phase pattern:

1. ``repartitionByRange`` on the sort key — partition *i* holds a
   contiguous, ordered slice of the key space (Spark's
   ``RangePartitioner`` samples with deterministic per-partition
   seeds, so boundaries are stable for a given input).
2. A *partitioned* window inside each range slice (parallel, bounded
   by the slice size).
3. A per-partition summary (≤ ``numPartitions`` rows — kilobytes) is
   window-scanned for prefix offsets and broadcast-joined back.

The per-slice numbering plus the broadcast offset equals the global
answer for ANY range boundary choice, provided ``order_by`` is a
TOTAL order (callers must include a tie-break column — same
requirement the deterministic oracles impose anyway).

Cost: one range shuffle + one kilobyte broadcast, versus the
single-task global sort. The only unpartitioned windows left run over
the per-partition summary table, provably ≤ ``numPartitions`` rows
(allowlisted in tests/test_plans.py's unpartitioned-window gate).

Reference parity note: the reference engine sorts whole frames on the
driver (pandas ``sort_values`` in ``pandas_aws/s3.py:231-236``); this
module is the distributed equivalent of that global ordering.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "distributed_row_number",
    "distributed_ntile",
    "distributed_cumsum",
    "distributed_grouped_cumsum",
]

_PID = "_tp_pid"


def _ranged(
    df: DataFrame, order_by: Sequence[Column | str], num_partitions: int | None
) -> DataFrame:
    clash = [c for c in df.columns if c.startswith("_tp_")]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with the _tp_ scratch namespace"
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if num_partitions is not None:
        d = df.repartitionByRange(num_partitions, *cols)
    else:  # default: spark.sql.shuffle.partitions
        d = df.repartitionByRange(*cols)
    return d.withColumn(_PID, F.spark_partition_id())


def distributed_row_number(
    df: DataFrame,
    order_by: Sequence[Column | str],
    *,
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based ``row_number`` over ``order_by`` without a
    single-partition sort. ``order_by`` must be a total order (include
    a tie-break key) so the numbering is deterministic regardless of
    where range boundaries land."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    d = _ranged(df, order_by, num_partitions)
    w_local = Window.partitionBy(_PID).orderBy(*cols)
    d = d.withColumn("_tp_local_rn", F.row_number().over(w_local))
    counts = d.groupBy(_PID).agg(F.count(F.lit(1)).alias("_tp_n"))
    # prefix offsets over <= numPartitions rows — bounded unpartitioned window
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        _PID, F.coalesce(F.sum("_tp_n").over(w_off), F.lit(0)).alias("_tp_off")
    )
    return (
        d.join(F.broadcast(offs), _PID)
        .withColumn(out, (F.col("_tp_local_rn") + F.col("_tp_off")).cast("int"))
        .drop(_PID, "_tp_local_rn", "_tp_off")
    )


def distributed_ntile(
    df: DataFrame,
    n: int,
    order_by: Sequence[Column | str],
    *,
    out: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n)`` semantics (first ``N mod n`` buckets get one
    extra row) from the two-phase row number — bit-identical to the
    single-partition ``F.ntile`` and to SQL ``NTILE``, minus the
    single-task global sort. The one-row total joins via broadcast."""
    d = distributed_row_number(df, order_by, out="_tp_rn", num_partitions=num_partitions)
    total = d.agg(F.count(F.lit(1)).alias("_tp_total"))
    d = d.crossJoin(F.broadcast(total))
    # NTILE: first (N mod n) buckets have (N div n)+1 rows, the rest
    # (N div n). Integer-only arithmetic; the else-branch divisor is
    # guarded for the N < n case (unreachable then, but ANSI-safe).
    bucket = F.expr(
        f"CASE WHEN _tp_rn <= (_tp_total % {n}) * (_tp_total div {n} + 1) "
        f"THEN (_tp_rn - 1) div (_tp_total div {n} + 1) + 1 "
        f"ELSE (_tp_total % {n}) "
        f"  + (_tp_rn - 1 - (_tp_total % {n}) * (_tp_total div {n} + 1)) "
        f"    div greatest(_tp_total div {n}, 1) + 1 END"
    ).cast("int")
    return d.withColumn(out, bucket).drop("_tp_rn", "_tp_total")


def distributed_cumsum(
    df: DataFrame,
    order_by: Sequence[Column | str],
    value_col: str,
    *,
    out: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running sum of ``value_col`` over ``order_by`` (rows
    UNBOUNDED PRECEDING..CURRENT ROW) via per-range-slice partial
    cumsums plus broadcast prefix offsets. ``order_by`` must be a
    total order for a deterministic result."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    d = _ranged(df, order_by, num_partitions)
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_tp_local_cum", F.sum(value_col).over(w_local))
    totals = d.groupBy(_PID).agg(F.sum(value_col).alias("_tp_pt"))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        _PID, F.coalesce(F.sum("_tp_pt").over(w_off), F.lit(0)).alias("_tp_off")
    )
    return (
        d.join(F.broadcast(offs), _PID)
        .withColumn(out, F.col("_tp_local_cum") + F.col("_tp_off"))
        .drop(_PID, "_tp_local_cum", "_tp_off")
    )


def distributed_grouped_cumsum(
    df: DataFrame,
    group_col: str,
    order_by: Sequence[Column | str],
    value_col: str,
    *,
    out: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group running sum over ``order_by``, scale-safe for LOW-
    cardinality ``group_col`` (event types, status codes): the naive
    ``Window.partitionBy(group)`` funnels each group through one task,
    so 5 groups × 10^9 rows = 5 straggler tasks no matter how many
    executors exist. Here the range partitioner keys on
    ``(group, *order_by)``, so one group spans MANY ordered slices;
    per-slice partial cumsums run in parallel and the per-(group,
    slice) totals (≤ groups × slices rows — kilobytes) provide
    broadcast prefix offsets within each group.

    ``order_by`` must totally order rows WITHIN each group. For
    high-cardinality groups (user ids), the plain partitioned window
    is already parallel — use that instead; this helper's extra range
    shuffle only pays for itself when group cardinality ≪ cores.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    d = _ranged(df, [F.col(group_col), *cols], num_partitions)
    w_local = (
        Window.partitionBy(_PID, group_col)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_tp_local_cum", F.sum(value_col).over(w_local))
    totals = d.groupBy(_PID, group_col).agg(F.sum(value_col).alias("_tp_pt"))
    # Offsets within each group across its ordered slices: the window is
    # partitioned by group over a provably tiny input (one row per
    # (group, range-slice) pair), never the data itself.
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        _PID,
        group_col,
        F.coalesce(F.sum("_tp_pt").over(w_off), F.lit(0)).alias("_tp_off"),
    )
    return (
        d.join(F.broadcast(offs), [_PID, group_col])
        .withColumn(out, F.col("_tp_local_cum") + F.col("_tp_off"))
        .drop(_PID, "_tp_local_cum", "_tp_off")
    )
