"""Skew operators: result-correctness plus the shuffle-shape evidence
(salt in the join keys, pair-grouped first phase)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_aws_spark.operators.skew import salted_join, two_phase_count_distinct
from pandas_aws_spark.plans.inspect import physical_plan
from pandas_aws_spark.registry import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    salted = salted_join(li, orders, ["o_orderkey"], n_salt=8, salt_from="l_linenumber")
    plain = li.join(orders, "o_orderkey")
    assert salted.count() == plain.count()
    a = salted.groupBy("o_orderpriority").count().orderBy("o_orderpriority").collect()
    b = plain.groupBy("o_orderpriority").count().orderBy("o_orderpriority").collect()
    assert a == b


def test_salted_join_actually_salts(spark, sf_dir):
    """The physical join must key on the salt column (that IS the
    mitigation — without it the hot key still lands on one task)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    out = salted_join(li, orders, ["o_orderkey"], n_salt=8, salt_from="l_linenumber")
    assert "_salt" in physical_plan(out)


def test_two_phase_distinct_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r["l_returnflag"]: r["n_distinct"]
        for r in two_phase_count_distinct(li, ["l_returnflag"], "l_orderkey").collect()
    }
    want = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert got == want
