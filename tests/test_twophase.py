"""Two-phase global-ordering operators: bit-parity with the
single-partition window versions, plus the plan property that makes
them exist at all — no unpartitioned Window over the data path."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pandas_aws_spark.operators.twophase import (
    distributed_cumsum,
    distributed_ntile,
    distributed_row_number,
)
from pandas_aws_spark.plans.inspect import unpartitioned_windows


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture()
def data(spark):
    # keys with heavy ties (v), unique tie-break (id); odd N so NTILE
    # remainders exercise the uneven-bucket branch
    n = 1003
    return (
        spark.range(n)
        .select(
            F.col("id"),
            (F.col("id") % 17).alias("v"),
            (F.col("id") * 37 % 1000).alias("x"),
        )
        .cache()
    )


def test_row_number_matches_global_window(spark, data):
    want = data.withColumn("rn", F.row_number().over(Window.orderBy("v", "id")))
    got = distributed_row_number(data, ["v", "id"], out="rn", num_partitions=7)
    assert _rows(got, "id", "rn") == _rows(want, "id", "rn")


def test_row_number_desc_order(spark, data):
    want = data.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("v").desc(), "id"))
    )
    got = distributed_row_number(data, [F.col("v").desc(), "id"], out="rn", num_partitions=5)
    assert _rows(got, "id", "rn") == _rows(want, "id", "rn")


@pytest.mark.parametrize("n", [2, 5, 7])
def test_ntile_matches_sql_ntile(spark, data, n):
    want = data.withColumn("b", F.ntile(n).over(Window.orderBy("v", "id")))
    got = distributed_ntile(data, n, ["v", "id"], out="b", num_partitions=6)
    assert _rows(got, "id", "b") == _rows(want, "id", "b")


def test_ntile_fewer_rows_than_buckets(spark):
    small = spark.range(3).select(F.col("id"))
    want = small.withColumn("b", F.ntile(5).over(Window.orderBy("id")))
    got = distributed_ntile(small, 5, ["id"], out="b", num_partitions=4)
    assert _rows(got, "id", "b") == _rows(want, "id", "b")


def test_cumsum_matches_global_window(spark, data):
    w = Window.orderBy(F.col("x").desc(), "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = data.withColumn("c", F.sum("v").over(w))
    got = distributed_cumsum(
        data, [F.col("x").desc(), "id"], "v", out="c", num_partitions=9
    )
    assert _rows(got, "id", "c") == _rows(want, "id", "c")


def test_scratch_namespace_collision_rejected(spark):
    df = spark.range(5).withColumnRenamed("id", "_tp_x")
    with pytest.raises(ValueError, match="_tp_ scratch namespace"):
        distributed_row_number(df, ["_tp_x"])


def test_no_unbounded_unpartitioned_window_in_plan(spark, data):
    """The whole point: the data path has no global-window funnel. The
    only unpartitioned windows run over the per-partition summary
    (<= num_partitions rows) — assert the flagged lines all reference
    the summary pid column, never the data columns."""
    got = distributed_ntile(data, 5, ["v", "id"], out="b", num_partitions=6)
    flagged = unpartitioned_windows(got)
    assert flagged, "expected the bounded offset windows to be visible"
    for line in flagged:
        assert "_tp_pid" in line, f"unpartitioned window over data path: {line}"


def test_grouped_cumsum_matches_partitioned_window(spark, data):
    from pandas_aws_spark.operators.twophase import distributed_grouped_cumsum

    d = data.withColumn("grp", (F.col("id") % 3).cast("string"))
    want = d.withColumn(
        "cum",
        F.sum("x").over(
            Window.partitionBy("grp")
            .orderBy("v", "id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    got = distributed_grouped_cumsum(
        d, "grp", ["v", "id"], "x", out="cum", num_partitions=7
    )
    assert _rows(got, "id", "cum") == _rows(want, "id", "cum")


def test_grouped_cumsum_single_row_groups(spark):
    from pandas_aws_spark.operators.twophase import distributed_grouped_cumsum

    d = spark.range(5).select(
        F.col("id"), F.col("id").cast("string").alias("grp"), F.lit(2).alias("x")
    )
    got = distributed_grouped_cumsum(d, "grp", ["id"], "x", out="cum", num_partitions=3)
    assert _rows(got, "id", "cum") == [(i, 2) for i in range(5)]


def test_grouped_cumsum_no_data_path_unpartitioned_window(spark, data):
    from pandas_aws_spark.operators.twophase import distributed_grouped_cumsum
    from pandas_aws_spark.plans.inspect import unpartitioned_windows

    d = data.withColumn("grp", (F.col("id") % 3).cast("string"))
    got = distributed_grouped_cumsum(d, "grp", ["v", "id"], "x", num_partitions=7)
    assert unpartitioned_windows(got) == []
