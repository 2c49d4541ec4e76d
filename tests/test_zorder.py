"""Z-order layout: the data-skipping locality claim, quantified —
every bucket must be narrow on BOTH dimensions, where a linear sort
leaves the secondary dimension at (nearly) full range in every file."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_aws_spark.operators.zorder import zorder_write_layout
from pandas_aws_spark.registry import load_table


def test_zorder_narrows_both_dimensions(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    full_b = li.agg(F.max("l_partkey") - F.min("l_partkey")).first()[0]

    z = zorder_write_layout(li, "l_orderkey", "l_partkey", bits=8, n_buckets=8)
    z_spans = (
        z.groupBy("zbucket")
        .agg((F.max("l_partkey") - F.min("l_partkey")).alias("span_b"))
        .agg(F.avg("span_b"))
        .first()[0]
    )

    # linear-sort strawman: 8 contiguous l_orderkey ranges
    linear = li.withColumn(
        "bucket", F.ntile(8).over(__import__("pyspark").sql.Window.orderBy("l_orderkey"))
    )
    lin_spans = (
        linear.groupBy("bucket")
        .agg((F.max("l_partkey") - F.min("l_partkey")).alias("span_b"))
        .agg(F.avg("span_b"))
        .first()[0]
    )

    # linear layout: secondary dim ~ full range per bucket; z-order
    # must cut the average secondary span at least in half
    assert lin_spans > 0.9 * full_b
    assert z_spans < 0.6 * lin_spans


def test_zorder_key_is_bijective_within_grid(spark):
    """Distinct (a, b) grid cells map to distinct z-values (the curve
    is a bijection on the normalized grid)."""
    df = spark.range(256).select(
        (F.col("id") % 16).alias("a"), (F.col("id") / 16).cast("long").alias("b")
    )
    z = zorder_write_layout(df, "a", "b", bits=4, n_buckets=4)
    assert z.select("zval").distinct().count() == 256
