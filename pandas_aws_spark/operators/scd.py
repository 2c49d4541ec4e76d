"""Slowly-changing-dimension (Type 2) operators.

The reference's only merge is last-write-wins upsert
(``redshift.py:386-416``, SURVEY.md §2.3 M4) — history is destroyed on
every load. SCD2 is the warehouse-grade extension: every change to a
keyed entity becomes a new *version* row carrying ``valid_from`` /
``valid_to`` / ``is_current``, so point-in-time queries stay answerable.

Scale notes: both operators are one shuffle on the business key — the
window in :func:`scd2_build` and the join in :func:`scd2_merge` hash-
partition by key, so 100 TB of change log spreads across executors with
no driver-side state. Skewed keys (one entity with millions of
versions) would pile into one task; for that shape, pre-aggregate the
change log per key-day first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_build", "scd2_merge"]


def scd2_build(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Fold a change log into SCD2 version ranges.

    Each change row becomes a version valid from its own timestamp until
    the entity's next change (``valid_to`` NULL = still current). Ties
    on the timestamp are broken by ``order_tiebreak`` so the result is
    deterministic under any partitioning.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return changes.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w)
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Apply a batch of updates to an existing SCD2 dimension.

    Matched current rows are *closed out* (``valid_to`` set to the
    update's timestamp); update rows are appended as the new current
    versions; historical rows pass through untouched. One shuffle on
    the key; the update side is usually small enough that AQE turns the
    join into a broadcast.
    """
    upd_min = updates.groupBy(*key_cols).agg(F.min(ts_col).alias("_new_ts"))
    closed = (
        dim.join(upd_min, on=key_cols, how="left")
        .withColumn(
            "valid_to",
            F.when(F.col("is_current") & F.col("_new_ts").isNotNull(), F.col("_new_ts")).otherwise(
                F.col("valid_to")
            ),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_new_ts")
    )
    fresh = scd2_build(updates, key_cols, ts_col)
    return closed.unionByName(fresh.select(*closed.columns))
