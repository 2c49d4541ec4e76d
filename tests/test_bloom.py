"""Bloom-filter semi-join reduction: no false negatives (exactness of
the prune -> exact-join pipeline) plus the actual pruning evidence —
the operator only earns its keep if it shrinks the pre-shuffle row
count toward the true match count."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_aws_spark.operators.bloom import bloom_build, bloom_prune
from pandas_aws_spark.registry import load_table


def test_bloom_never_drops_matches(spark, sf_dir):
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    bloom = bloom_build(cust, "c_custkey")
    pruned = bloom_prune(orders, "o_custkey", bloom)

    exact = orders.join(
        F.broadcast(cust), orders.o_custkey == F.col("c_custkey"), "left_semi"
    )
    exact_after_prune = pruned.join(
        F.broadcast(cust), pruned.o_custkey == F.col("c_custkey"), "left_semi"
    )
    assert exact_after_prune.count() == exact.count()


def test_bloom_actually_prunes(spark, sf_dir):
    """Pruned cardinality must land between the true match count (no
    false negatives) and well below the full fact table (the point of
    the reduction). BUILDING is ~1/5 of customers, so anything under
    half the table proves real pruning even with false positives."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    bloom = bloom_build(cust, "c_custkey")
    pruned_n = bloom_prune(orders, "o_custkey", bloom).count()
    total_n = orders.count()
    exact_n = orders.join(
        F.broadcast(cust), orders.o_custkey == F.col("c_custkey"), "left_semi"
    ).count()
    assert exact_n <= pruned_n < total_n / 2


def test_bloom_tiny_filter_high_fp_still_exact(spark, sf_dir):
    """Degenerate sizing (256 bits for thousands of keys -> nearly
    every probe passes): the pipeline must still return exactly the
    true join result — false positives only cost work, never
    correctness."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    bloom = bloom_build(cust, "c_custkey", num_bits=256, num_hashes=2)
    pruned = bloom_prune(orders, "o_custkey", bloom, num_bits=256, num_hashes=2)
    joined = pruned.join(
        F.broadcast(cust), pruned.o_custkey == F.col("c_custkey"), "left_semi"
    )
    exact = orders.join(
        F.broadcast(cust), orders.o_custkey == F.col("c_custkey"), "left_semi"
    )
    assert joined.count() == exact.count()


def test_bloom_empty_keyset_prunes_everything(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").filter(F.lit(False)).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    bloom = bloom_build(cust, "c_custkey")
    assert bloom_prune(orders, "o_custkey", bloom).count() == 0
