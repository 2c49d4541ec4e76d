"""Skew-mitigation queries — salted join and two-phase distinct, both
oracle-checked (the rewrites are result-invariant, so the oracles are
the plain SQL forms; what the operators change is the *shuffle shape*,
pinned by ``tests/test_skew.py``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import dsum, sql_dsum
from ..operators.skew import salted_join, two_phase_count_distinct
from ..registry import load_table, query

_SALTED_ORACLE = f"""
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("q_skew_salted_join", oracle=_SALTED_ORACLE, tags=("skew", "join"))
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem x orders through an 8-way salted join — the big-big
    skewed-join rewrite (result identical to the plain join; the salt
    spreads any hot orderkey across 8 tasks)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount", "l_linenumber"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, orders, ["o_orderkey"], n_salt=8, salt_from="l_linenumber")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_TPD_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS n_distinct
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q_skew_two_phase_distinct", oracle=_TPD_ORACLE, tags=("skew", "distinct"))
def q_skew_two_phase_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT orderkey) per returnflag via the explicit
    two-phase rewrite: a 3-value group column means every group is hot;
    the pair-grouped first phase spreads each across all partitions."""
    li = load_table(spark, sf_dir, "lineitem")
    return two_phase_count_distinct(li, ["l_returnflag"], "l_orderkey").orderBy("l_returnflag")


_BLOOM_ORACLE = f"""
SELECT o.o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_dsum('o.o_totalprice')} AS total_price
FROM orders o
WHERE o.o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("q_bloom_semi_join", oracle=_BLOOM_ORACLE, tags=("bloom", "semijoin", "scale"))
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via an explicit Bloom filter: the dim key
    set (BUILDING customers) becomes a 1 Mi-bit bitmap that pre-filters
    orders BEFORE the exact semi join — no false negatives, so the
    result equals the plain IN-join oracle. At 100 TB the bitmap
    replaces shuffling the whole fact table when the dim is too big to
    broadcast as a hash relation but its Bloom is a few hundred KB.
    The pruning factor (~1/5 here) is asserted in tests/test_bloom.py.
    """
    from ..operators.bloom import bloom_build, bloom_prune

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    bloom = bloom_build(cust, "c_custkey")
    pruned = bloom_prune(orders, "o_custkey", bloom)
    return (
        pruned.join(F.broadcast(cust), pruned.o_custkey == F.col("c_custkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price"))
        .orderBy("o_orderpriority")
    )


def _zorder_oracle() -> str:
    from ..operators.zorder import sql_zorder_key

    zexpr = sql_zorder_key(
        "l_orderkey", "l_partkey",
        a_min="b.alo", a_max="b.ahi", b_min="b.blo", b_max="b.bhi", bits=8,
    )
    return f"""
WITH b AS (
  SELECT MIN(l_orderkey) AS alo, MAX(l_orderkey) AS ahi,
         MIN(l_partkey)  AS blo, MAX(l_partkey)  AS bhi
  FROM lineitem
),
z AS (
  SELECT l_orderkey, l_partkey, {zexpr} AS zval
  FROM lineitem, b
)
SELECT zval >> 13 AS zbucket,
       COUNT(*) AS n_rows,
       MAX(l_orderkey) - MIN(l_orderkey) AS span_orderkey,
       MAX(l_partkey)  - MIN(l_partkey)  AS span_partkey
FROM z
GROUP BY zbucket
ORDER BY zbucket
"""


@query("q_zorder_locality", oracle=_zorder_oracle(), tags=("zorder", "layout", "scale"))
def q_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering layout: per output bucket, the
    min/max span of BOTH interleaved columns — the data-skipping
    evidence (a linear sort would leave one column's span at full
    range in every file; Z-order narrows both, which is what lets
    parquet min/max stats prune scans on either predicate).
    Deterministic integer bit-interleave — DuckDB replays it exactly.
    """
    from ..operators.zorder import zorder_write_layout

    li = load_table(spark, sf_dir, "lineitem")
    z = zorder_write_layout(li, "l_orderkey", "l_partkey", bits=8, n_buckets=8)
    return (
        z.groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            (F.max("l_orderkey") - F.min("l_orderkey")).alias("span_orderkey"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("span_partkey"),
        )
        .orderBy("zbucket")
    )
