"""TPC-H long-tail shapes — Q9, Q11, Q13, Q16, Q17, Q20, Q21.

Completes the TPC-H-shaped corpus (relational.py covers Q1/Q3-Q8/Q10/
Q12/Q14/Q15/Q18/Q19/Q22). The reference reaches all of this only
through its arbitrary-SQL passthrough (``pandas_aws/redshift.py:417-448``);
here each query is a first-class Catalyst plan.

The driver testdata has no ``partsupp`` table, so the four shapes that
classically scan it (Q9/Q11/Q16/Q20) use ``lineitem`` as the
part-supplier link — same plan skeletons (grouped HAVING subqueries,
semi-join chains, count-distinct over a join), different fact columns.

Scale notes (100 TB design):
* every dimension join broadcasts; the only shuffles are on lineitem
  group/join keys, where AQE handles skew;
* grouped-HAVING thresholds are computed once and broadcast as one-row
  plans — never per-row correlated re-execution;
* Q21's EXISTS/NOT-EXISTS pair becomes ONE shuffle on l_orderkey
  feeding both the semi and anti join (Catalyst reuses the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import davg, dsum, sql_davg, sql_dsum
from ..registry import load_table, query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q9 shape — product-type profit by nation and year. partsupp's
# supplycost is replaced by a retail-price-based cost (0.5 * retail *
# qty); the plan shape (two fact joins + three broadcast dims +
# two-level agg) is identical.
# --------------------------------------------------------------------------
_Q9_ORACLE = f"""
SELECT n.n_name AS nation,
       year(o.o_orderdate) AS o_year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount) - 0.5 * p.p_retailprice * l.l_quantity')} AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


@query("q09_product_profit", oracle=_Q9_ORACLE, tags=("join", "agg", "tpch"))
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: the p_name filter broadcasts a pruned part dim,
    which then semi-filters lineitem *before* the orders shuffle — at
    100 TB the join order (part first, orders last) is the difference
    between shuffling 4% of lineitem and all of it.

    Profit is computed in DOUBLE and cast once to decimal inside the
    sum (casting operands separately rounds differently than DuckDB).
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# Q11 shape — important parts: per-part value from one nation's
# suppliers, kept when above a fraction of the national total
# (grouped agg + scalar-subquery threshold).
# --------------------------------------------------------------------------
_Q11_ORACLE = f"""
WITH pv AS (
  SELECT l.l_partkey,
         {sql_dsum('l.l_extendedprice')} AS part_value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
)
SELECT l_partkey, part_value
FROM pv
WHERE part_value > (SELECT {sql_dsum('part_value')} / COUNT(*) * 2.0 FROM pv)
ORDER BY part_value DESC, l_partkey
"""


@query("q11_important_parts", oracle=_Q11_ORACLE, tags=("subquery", "agg", "tpch"))
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: the per-part aggregate is computed ONCE and
    reused for both the detail rows and the global threshold (Spark
    reuses the shuffle; no second lineitem scan). The threshold —
    2x the average part value, scale-invariant where Q11's fixed
    fraction is not — is a one-row broadcast cross join, and both
    engines derive it from the same decimal sum so the cut-off is
    bit-identical."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    pv = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice").alias("part_value"))
    )
    threshold = pv.agg((dsum("part_value") / F.count("*") * 2.0).alias("cut"))
    return (
        pv.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("cut"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# --------------------------------------------------------------------------
# Q13 shape — customer order-count distribution: LEFT OUTER join with
# an extra join-side predicate, then a histogram of counts.
# --------------------------------------------------------------------------
_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_customer_distribution", oracle=_Q13_ORACLE, tags=("outerjoin", "agg", "tpch"))
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left-outer join keeps order-less customers
    (COUNT of the null-able key counts them as 0), then a second tiny
    aggregate builds the distribution. The priority predicate lives in
    the join condition — pushing it to a WHERE would silently turn the
    outer join into an inner one."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q16 shape — supplier counts per part attribute, excluding a supplier
# blacklist (NOT IN) — count-distinct over a join.
# --------------------------------------------------------------------------
_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q16_supplier_part_counts", oracle=_Q16_ORACLE, tags=("antijoin", "distinct", "tpch"))
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: the NOT IN becomes a broadcast left-anti join
    (the blacklist is provably null-free, so anti-join semantics match
    NOT IN exactly); part predicates prune the broadcast side before
    the fact join; count-distinct plans as a two-phase expand+agg."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad_supp), l.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q17 shape — small-quantity-order revenue: correlated scalar subquery
# (per-part average quantity) via spark.sql, Catalyst decorrelates.
# --------------------------------------------------------------------------
_Q17_ORACLE = f"""
SELECT {sql_dsum('l.l_extendedprice')} / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
"""


@query("q17_small_quantity_revenue", oracle=_Q17_ORACLE, tags=("subquery", "correlated", "tpch"))
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape through the raw-SQL surface (reference S7):
    Catalyst decorrelates the per-part AVG into one grouped aggregate
    of lineitem joined back on l_partkey — two scans total, not one
    per outer row. Quantities are integer-valued doubles, so the AVG
    is exact in both engines regardless of summation order."""
    for t in ("lineitem", "part"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q17_ORACLE)


# --------------------------------------------------------------------------
# Q20 shape — promotable suppliers: semi-join chain through a grouped
# HAVING (suppliers who moved > threshold quantity of matching parts).
# --------------------------------------------------------------------------
_Q20_ORACLE = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_2'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    GROUP BY l.l_suppkey
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,6))) > 100
  )
ORDER BY s.s_suppkey
"""


@query("q20_promotable_suppliers", oracle=_Q20_ORACLE, tags=("semijoin", "subquery", "tpch"))
def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a two-deep IN chain — parts filtered by name
    semi-filter lineitem (broadcast), the grouped HAVING runs on the
    surviving 4%, and the qualifying supplier keys semi-filter the
    supplier dim. Decimal HAVING threshold keeps the boundary exact."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    l = _t(spark, sf_dir, "lineitem")
    small_parts = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("small")).select(
        "p_partkey"
    )
    movers = (
        l.join(F.broadcast(small_parts), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "left_semi")
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q21 shape — suppliers who kept orders waiting: EXISTS + NOT EXISTS
# with non-equi conditions on the same fact table (shipdate plays the
# role of the missing commit/receipt dates).
# --------------------------------------------------------------------------
_Q21_ORACLE = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
JOIN nation n    ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_1'
WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@query("q21_waiting_suppliers", oracle=_Q21_ORACLE, tags=("semijoin", "antijoin", "tpch"))
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the supplier whose line shipped last on a
    multi-supplier order. EXISTS -> left-semi, NOT EXISTS -> left-anti,
    both equi-joins on l_orderkey with extra non-equi conjuncts — the
    two self-joins hash-partition lineitem on l_orderkey once and
    Catalyst reuses the exchange for both."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    l1 = l.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = l.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("x_orderkey"))
            & (F.col("x_suppkey") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            l2,
            (F.col("l_orderkey") == F.col("x_orderkey"))
            & (F.col("x_suppkey") != F.col("l_suppkey"))
            & (F.col("x_shipdate") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        waiting.join(o, F.col("l_orderkey") == o.o_orderkey, "left_semi")
        .join(
            F.broadcast(
                s.join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "left_semi")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# CUBE — all 2^n grouping combinations (completes rollup/grouping-sets/
# pivot/unpivot: the full multi-granularity aggregate family).
# --------------------------------------------------------------------------
_CUBE_ORACLE = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_rows,
       {sql_dsum('l_extendedprice')} AS total_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


@query("q_cube_price", oracle=_CUBE_ORACLE, tags=("cube", "agg"))
def q_cube_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): one Expand pass emits all
    four grouping sets before a single hash aggregate — same cost
    shape as rollup, double the replication. Source flags are never
    NULL, so the 'ALL' coalesce is unambiguous."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), dsum("l_extendedprice").alias("total_price"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "total_price",
        )
        .orderBy("returnflag", "linestatus")
    )
