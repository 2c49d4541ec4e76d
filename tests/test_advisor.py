"""scale_audit: the plan-gate logic as a user-facing advisory API."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_aws_spark.plans.advisor import scale_audit
from pandas_aws_spark.registry import load_table


def _rules(findings):
    return {f.rule for f in findings}


def test_clean_aggregate_has_no_errors(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    findings = scale_audit(df)
    assert not [f for f in findings if f.severity == "error"], findings


def test_flags_cartesian(spark, sf_dir):
    a = load_table(spark, sf_dir, "region")
    b = load_table(spark, sf_dir, "nation")
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    df = a.crossJoin(b)
    assert "cartesian-product" in _rules(scale_audit(df)) or "nested-loop-join" in _rules(
        scale_audit(df)
    )


def test_flags_unpartitioned_window(spark, sf_dir):
    from pyspark.sql.window import Window

    df = load_table(spark, sf_dir, "orders").withColumn(
        "rn", F.row_number().over(Window.orderBy("o_orderkey"))
    )
    flagged = scale_audit(df)
    assert "unpartitioned-window" in _rules(flagged)
    assert any(f.severity == "error" for f in flagged)


def test_flags_wide_scan_and_shuffles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")  # wide scan: 11+ columns survive pruning
    df = li.join(li.select("l_orderkey").distinct(), "l_orderkey").repartition(64)
    findings = scale_audit(df, max_scan_columns=8, max_shuffles=1)
    assert "wide-scan" in _rules(findings)
    assert "many-shuffles" in _rules(findings)


def test_nested_loop_policy(spark, sf_dir):
    one = load_table(spark, sf_dir, "orders").agg(F.max("o_totalprice").alias("m"))
    df = load_table(spark, sf_dir, "orders").crossJoin(F.broadcast(one))
    strict = scale_audit(df)
    relaxed = scale_audit(df, allow_nested_loop=True)
    nlj_strict = [f for f in strict if f.rule == "nested-loop-join"]
    nlj_relaxed = [f for f in relaxed if f.rule == "nested-loop-join"]
    assert nlj_strict and nlj_strict[0].severity == "error"
    assert nlj_relaxed and nlj_relaxed[0].severity == "warn"
