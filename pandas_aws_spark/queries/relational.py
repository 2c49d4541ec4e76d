"""Relational operator corpus — scans, filters, joins, aggregations,
windows, sorts, limits, set ops, rollup, pivot, subqueries.

The reference exposes this whole surface only as SQL passthrough to the
warehouse (``pandas_aws/redshift.py:417-448`` executes arbitrary SQL);
in the Spark engine the DataFrame API / ``spark.sql`` *is* the
warehouse, so these queries are the engine's primary capability proof
(SURVEY.md §2.5-§2.7, §2.9).

Scale notes (100 TB design):
* fact-fact joins (lineitem x orders) shuffle on the join key and rely
  on AQE for skew; dimension joins (region/nation/customer/supplier/
  part) are explicitly broadcast — at any realistic scale these stay
  under tens of MiB;
* aggregates are expressed declaratively so Catalyst plans partial
  (map-side) aggregation before the shuffle;
* top-k uses orderBy+limit which Spark plans as TakeOrderedAndProject
  (per-partition heap, no global sort);
* every floating SUM/AVG goes through fixed-point decimal (see
  functions.stable) so results are bit-stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.stable import davg, dsum, sql_davg, sql_dsum
from ..registry import load_table, query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q1 — pricing summary (TPC-H Q1 shape): scan -> filter -> hash agg -> sort.
# --------------------------------------------------------------------------
_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')}                                   AS sum_qty,
       {sql_dsum('l_extendedprice')}                              AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')}           AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')}                                   AS avg_qty,
       {sql_davg('l_extendedprice')}                              AS avg_price,
       {sql_davg('l_discount')}                                   AS avg_disc,
       COUNT(*)                                                   AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q01_pricing_summary", oracle=_Q1_ORACLE, headline=True, tags=("agg", "tpch"))
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + 8-way aggregate; Catalyst pushes the shipdate predicate
    into the parquet scan and plans partial aggregation map-side."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q3 — shipping priority: broadcast dim join + fact-fact shuffle join,
# group, top-10 with deterministic tie-break.
# --------------------------------------------------------------------------
_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate  > TIMESTAMP '1996-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q03_shipping_priority", oracle=_Q3_ORACLE, headline=True, tags=("join", "topk", "tpch"))
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer (dim, broadcast) |x| orders |x| lineitem; top-10 revenue.

    At 100 TB: customer filtered on segment broadcasts; orders-lineitem
    is the one real shuffle, on the join key both sides already share.
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way join across the whole star schema.
# --------------------------------------------------------------------------
_Q5_ORACLE = f"""
SELECT n.n_name,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""


@query("q05_region_revenue", oracle=_Q5_ORACLE, headline=True, tags=("join", "tpch"))
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table join; all dims broadcast, single fact-fact shuffle."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# Q6 — forecast revenue change: pure filter + single-row aggregate.
# --------------------------------------------------------------------------
_Q6_ORACLE = f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@query("q06_forecast_revenue", oracle=_Q6_ORACLE, tags=("filter", "agg", "tpch"))
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four predicates push into the parquet scan (PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Q4-shape — order priority with EXISTS (left-semi join).
# --------------------------------------------------------------------------
_Q4_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("q04_order_priority", oracle=_Q4_ORACLE, tags=("semijoin", "tpch"))
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join — no row duplication, early exit per key."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    matched = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Anti-join — customers with no orders (NOT EXISTS).
# --------------------------------------------------------------------------
_QANTI_ORACLE = """
SELECT c.c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_balance
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@query("q_customers_without_pending", oracle=_QANTI_ORACLE, tags=("antijoin",))
def q_customers_without_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join — same primitive the upsert merge uses
    (reference ``redshift.py:348-362`` DELETE USING)."""
    cust = _t(spark, sf_dir, "customer")
    pending = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        cust.join(pending, cust.c_custkey == pending.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal").alias("total_balance"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Top-k per group — window row_number (the canonical OLAP pattern).
# --------------------------------------------------------------------------
_QTOPK_ORACLE = f"""
SELECT c_mktsegment, c_custkey, spend, rank
FROM (
  SELECT c.c_mktsegment, c.c_custkey,
         {sql_dsum('o.o_totalprice')} AS spend,
         ROW_NUMBER() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY {sql_dsum('o.o_totalprice')} DESC, c.c_custkey
         ) AS rank
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_mktsegment, c.c_custkey
)
WHERE rank <= 3
ORDER BY c_mktsegment, rank
"""


@query("q_top_customers_per_segment", oracle=_QTOPK_ORACLE, headline=True, tags=("window", "topk"))
def q_top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agg then windowed rank; rank<=3 filter lets Spark plan a per-
    partition top-k (WindowGroupLimit) instead of a full sort."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(dsum("o_totalprice").alias("spend"))
    )
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("spend"), F.col("c_custkey"))
    return (
        spend.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("c_mktsegment", "c_custkey", "spend", "rank")
        .orderBy("c_mktsegment", "rank")
    )


# --------------------------------------------------------------------------
# Global top-k — orderBy+limit => TakeOrderedAndProject (no global sort).
# --------------------------------------------------------------------------
_QLIMIT_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@query("q_top_orders", oracle=_QLIMIT_ORACLE, tags=("sort", "limit"))
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global top-10 (tie-broken on the key)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Set ops — intersect / except on key sets.
# --------------------------------------------------------------------------
_QSETOPS_ORACLE = """
WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
     o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     both_k   AS (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o),
     only_f   AS (SELECT o_custkey FROM f EXCEPT    SELECT o_custkey FROM o)
SELECT 'intersect' AS op, COUNT(*) AS n FROM both_k
UNION ALL
SELECT 'except' AS op, COUNT(*) AS n FROM only_f
ORDER BY op
"""


@query("q_set_ops", oracle=_QSETOPS_ORACLE, tags=("setops",))
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / exceptAll-style key algebra (SURVEY §2.7)."""
    orders = _t(spark, sf_dir, "orders")
    f_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    inter = f_keys.intersect(o_keys).agg(F.count("*").alias("n")).select(
        F.lit("intersect").alias("op"), "n"
    )
    exc = f_keys.exceptAll(o_keys).agg(F.count("*").alias("n")).select(
        F.lit("except").alias("op"), "n"
    )
    return inter.unionByName(exc).orderBy("op")


# --------------------------------------------------------------------------
# Rollup — hierarchical aggregate (returnflag -> linestatus -> grand total).
# --------------------------------------------------------------------------
_QROLLUP_ORACLE = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


@query("q_rollup_quantity", oracle=_QROLLUP_ORACLE, tags=("rollup", "agg"))
def q_rollup_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with NULL markers coalesced to 'ALL' (source data has no
    NULL flags, so the coalesce is unambiguous)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
        .orderBy("returnflag", "linestatus")
    )


# --------------------------------------------------------------------------
# Pivot — returnflag x linestatus matrix.
# --------------------------------------------------------------------------
_QPIVOT_ORACLE = f"""
SELECT l_returnflag,
       {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o,
       {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q_pivot_status", oracle=_QPIVOT_ORACLE, tags=("pivot",))
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (single-pass, no value discovery job)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_o"),
            F.col("F").alias("qty_f"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Distinct aggregates + HAVING.
# --------------------------------------------------------------------------
_QDISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
HAVING COUNT(*) > 100
ORDER BY l_returnflag
"""


@query("q_distinct_counts", oracle=_QDISTINCT_ORACLE, tags=("agg", "distinct"))
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct (Spark plans expand + two-phase agg) + HAVING."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
        .filter(F.col("n_rows") > 100)
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Scalar subquery + anti-join (TPC-H Q22 shape).
# --------------------------------------------------------------------------
_QRICH_ORACLE = """
SELECT c.c_mktsegment, COUNT(*) AS n_rich
FROM customer c
WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                     FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@query("q_rich_inactive_customers", oracle=_QRICH_ORACLE, tags=("subquery", "antijoin"))
def q_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (broadcast single value) + anti-join.

    The mean threshold is computed through fixed-point decimal so both
    engines derive the identical cut-off (a plain double AVG could
    differ in the last ULP and flip a borderline row).
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    cust.createOrReplaceTempView("customer")
    orders.createOrReplaceTempView("orders")
    return spark.sql(_QRICH_ORACLE)


# --------------------------------------------------------------------------
# Running / lag windows over an unambiguous ordering.
# --------------------------------------------------------------------------
_QRUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_spend,
       ROW_NUMBER() OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS order_seq
FROM orders
ORDER BY o_custkey, order_seq
"""


@query("q_running_customer_spend", oracle=_QRUNNING_ORACLE, tags=("window",))
def q_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window sum per customer; decimal accumulator keeps the
    running values bit-stable. Ordering (o_orderdate, o_orderkey) is
    unique, so frames are deterministic."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("double")
            .alias("running_spend"),
            F.row_number().over(w).alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


_QLAG_ORACLE = """
SELECT o_custkey, o_orderkey,
       o_totalprice - LAG(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS price_delta
FROM orders
QUALIFY price_delta IS NOT NULL
ORDER BY o_custkey, o_orderkey
"""


@query("q_order_price_delta", oracle=_QLAG_ORACLE, tags=("window",))
def q_order_price_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG across consecutive orders per customer (deterministic order);
    single subtraction of identical doubles is bit-stable."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("price_delta"),
        )
        .filter(F.col("price_delta").isNotNull())
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# Scalar-function showcase (string/date/math built-ins, SURVEY §2.8).
# --------------------------------------------------------------------------
_QSCALAR_ORACLE = """
SELECT o_orderkey,
       UPPER(o_orderpriority)                    AS prio_upper,
       SUBSTR(o_orderpriority, 1, 1)             AS prio_code,
       CONCAT(o_orderstatus, '-', o_orderpriority) AS status_prio,
       LENGTH(o_orderpriority)                   AS prio_len,
       CAST(YEAR(o_orderdate) AS INT)            AS order_year,
       CAST(MONTH(o_orderdate) AS INT)           AS order_month,
       CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_bucket,
       ABS(o_totalprice - 100000.0)              AS dist_from_100k
FROM orders
WHERE o_orderkey % 100 = 0
ORDER BY o_orderkey
"""


@query("q_scalar_functions", oracle=_QSCALAR_ORACLE, tags=("scalar",))
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar surface — all JVM-side built-ins inside
    whole-stage codegen (no Python in the row path)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.upper("o_orderpriority").alias("prio_upper"),
            F.substring("o_orderpriority", 1, 1).alias("prio_code"),
            F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
            F.length("o_orderpriority").alias("prio_len"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.floor(F.col("o_totalprice") / 1000).alias("price_bucket"),
            F.abs(F.col("o_totalprice") - 100000.0).alias("dist_from_100k"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q2 shape, lineitem as the
# part-supplier link): min-price supplier per part. Catalyst
# decorrelates the subquery into an aggregate + join — the rewrite the
# reference outsourced to the warehouse planner.
# --------------------------------------------------------------------------
_MINCOST_ORACLE = """
SELECT p.p_partkey, s.s_name, l.l_extendedprice AS min_price
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_partkey % 200 = 0
  AND l.l_extendedprice = (
        SELECT MIN(l2.l_extendedprice)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
ORDER BY p.p_partkey, s.s_name
"""


@query("q_min_cost_supplier", oracle=_MINCOST_ORACLE, tags=("subquery", "correlated"))
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through ``spark.sql`` — the engine's
    raw-SQL surface (reference S7) on a decorrelation-requiring query.
    Catalyst rewrites the per-row MIN into one aggregate of lineitem
    plus a join: two scans, no nested-loop re-execution."""
    for t in ("lineitem", "part", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_MINCOST_ORACLE)


# --------------------------------------------------------------------------
# Exact quantiles — percentile() sorts within-group and interpolates;
# Spark and DuckDB (quantile_cont) produce bit-identical doubles, so
# this stays oracle-checked with no decimal detour.
# --------------------------------------------------------------------------
_QUANTILE_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       quantile_cont(o_totalprice, 0.5) AS median_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("q_quantile_stats", oracle=_QUANTILE_ORACLE, tags=("agg", "quantile"))
def q_quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact quantiles (the profiling pass a data pipeline
    runs before choosing filters/thresholds). Exact percentile is a
    sort-based agg: fine per-group; at extreme group sizes switch to
    approx_percentile (t-digest) and drop the oracle to rows-only."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# GROUPING SETS — the multi-granularity aggregate (completes the
# rollup/pivot family; Catalyst expands to one Expand + one agg pass).
# --------------------------------------------------------------------------
_GSETS_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@query("q_grouping_sets", oracle=_GSETS_ORACLE, tags=("agg", "groupingsets"))
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets (status-only, priority-only, grand
    total) in ONE pass — Spark's Expand operator replicates each input
    row per set before a single hash aggregate, vs. three scans if
    written naively as a union."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# Q7 shape — volume shipping between two nations (supplier nation x
# customer nation), yearly. Two broadcast dims on a two-fact join.
# --------------------------------------------------------------------------
_Q7_ORACLE = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN orders o    ON o.o_orderkey = l.l_orderkey
JOIN supplier s  ON s.s_suppkey = l.l_suppkey
JOIN customer c  ON c.c_custkey = o.o_custkey
JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@query("q07_volume_shipping", oracle=_Q7_ORACLE, tags=("join", "tpch"))
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: lineitem x orders is the only fact-fact shuffle;
    supplier/customer/nation broadcast; the nation-pair predicate
    applies after the dim joins (Catalyst pushes each half to its
    broadcast side)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q10 shape — returned-item reporting: top customers by lost revenue.
# --------------------------------------------------------------------------
_Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_ORACLE, tags=("join", "topk", "tpch"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returnflag filter pushed into the lineitem
    scan, broadcast dims, top-20 by revenue planned as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q14 shape — promo revenue share: conditional aggregation over a join.
# --------------------------------------------------------------------------
_Q14_ORACLE = f"""
SELECT year(l.l_shipdate) AS l_year,
       {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")} AS promo_revenue,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS total_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1
ORDER BY 1
"""


@query("q14_promo_effect", oracle=_Q14_ORACLE, tags=("join", "agg", "tpch"))
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: part broadcasts; promo share is conditional
    aggregation in the same pass as the total (no second scan)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))).alias(
                "promo_revenue"
            ),
            dsum(rev).alias("total_revenue"),
        )
        .orderBy("l_year")
    )


# --------------------------------------------------------------------------
# Q19 shape — discounted revenue with a disjunctive multi-attribute
# predicate (brand x size x quantity bands).
# --------------------------------------------------------------------------
_Q19_ORACLE = f"""
SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 40)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 50)
"""


@query("q19_discounted_revenue", oracle=_Q19_ORACLE, tags=("join", "filter", "tpch"))
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive brand/size/quantity predicate —
    Catalyst extracts the common join key and pushes the per-side
    conjuncts (quantity bands to lineitem, brand/size to part) below
    the broadcast join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    return joined.filter(pred).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


# --------------------------------------------------------------------------
# Q18 shape — large-volume customers: IN-subquery over a grouped HAVING.
# --------------------------------------------------------------------------
_Q18_ORACLE = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       {sql_dsum('l.l_quantity')} AS total_qty
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250
)
GROUP BY 1, 2, 3, 4
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


@query("q18_large_volume_customers", oracle=_Q18_ORACLE, tags=("subquery", "tpch"))
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the IN-subquery (orders whose total quantity
    exceeds a threshold) becomes a left-semi join against a grouped
    HAVING — one extra aggregate of lineitem, no correlated
    re-execution. Decimal HAVING threshold keeps the boundary
    bit-stable across engines."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        l.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate")
        .agg(dsum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q22 shape — global-sales opportunity: scalar-average subquery +
# anti-join (rich customers who never ordered).
# --------------------------------------------------------------------------
_Q22_ORACLE = f"""
WITH avg_bal AS (
  SELECT {sql_davg('c_acctbal')} AS a FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment,
       COUNT(*) AS n_custs,
       {sql_dsum('c.c_acctbal')} AS total_bal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
GROUP BY 1
ORDER BY 1
"""


@query("q22_global_sales_opportunity", oracle=_Q22_ORACLE, tags=("subquery", "antijoin", "tpch"))
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (average positive balance)
    broadcast as a one-row cross join, NOT EXISTS as a left-anti join
    on the filtered orders — no correlated execution anywhere."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal").alias("a"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_custs"), dsum("c_acctbal").alias("total_bal"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q8 shape — national market share: a nation's revenue fraction per
# year within a region's market. Integer-free ratio via decimal sums.
# --------------------------------------------------------------------------
_Q8_ORACLE = f"""
WITH sales AS (
  SELECT year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA'
)
SELECT o_year,
       {sql_dsum("CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END")} AS nation_volume,
       {sql_dsum('volume')} AS total_volume
FROM sales
GROUP BY o_year
ORDER BY o_year
"""


@query("q08_market_share", oracle=_Q8_ORACLE, tags=("join", "tpch"))
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: six-table join (one fact-fact shuffle, five
    broadcasts), market share as conditional vs total decimal sums in
    ONE aggregation pass."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    sales = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    return (
        sales.groupBy("o_year")
        .agg(
            dsum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(F.lit(0.0))).alias(
                "nation_volume"
            ),
            dsum("volume").alias("total_volume"),
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q15 shape — top supplier(s): suppliers whose yearly revenue equals
# the maximum (scalar subquery over an aggregate).
# --------------------------------------------------------------------------
_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE, tags=("subquery", "tpch"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue 'view' computed once, its max as a
    one-row broadcast, equality join back — decimal revenue makes the
    max comparison exact (double ties would be partition-order
    roulette)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q12 shape (adapted: no commit/receipt dates in this schema) — late
# shipments per priority using interval arithmetic on ship vs order
# date.
# --------------------------------------------------------------------------
_Q12_ORACLE = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_fast
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
ORDER BY 1
"""


@query("q12_shipping_latency", oracle=_Q12_ORACLE, tags=("join", "datetime", "tpch"))
def q12_shipping_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape on the available dates: interval arithmetic
    (ship vs order + N days) inside conditional aggregation — one
    fact-fact join, integer counters, no second pass."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    fast = F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(late, 1).otherwise(0)).alias("n_late"),
            F.sum(F.when(fast, 1).otherwise(0)).alias("n_fast"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Ranking-function family: ntile quartiles + percent_rank over customer
# balances within segments.
# --------------------------------------------------------------------------
_NTILE_ORACLE = """
WITH r AS (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         NTILE(4) OVER w AS quartile,
         PERCENT_RANK() OVER w AS pr
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
)
SELECT c_mktsegment, quartile,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal,
       CAST(SUM(CAST(FLOOR(pr * 1000000) AS BIGINT)) AS BIGINT) AS pr_micros
FROM r
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q_ntile_quartiles", oracle=_NTILE_ORACLE, tags=("window", "ranking"))
def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank (deterministic: balance-then-key ordering
    kills ties); percent_rank aggregated as floored micros so the
    double ratio never meets a cross-engine rounding boundary."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    r = c.select(
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
    )
    return (
        r.groupBy("c_mktsegment", "quartile")
        .agg(
            F.count("*").alias("n_custs"),
            dsum("c_acctbal").alias("total_bal"),
            F.sum(F.floor(F.col("pr") * 1_000_000).cast("bigint")).alias("pr_micros"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


# --------------------------------------------------------------------------
# NULL-semantics parity: the rules every engine must agree on.
# --------------------------------------------------------------------------
_NULLSEM_ORACLE = """
WITH a AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS x
  FROM orders
),
b AS (SELECT DISTINCT x FROM a),
eq AS (SELECT COUNT(*) AS n FROM a JOIN b ON a.x = b.x),
ns AS (SELECT COUNT(*) AS n FROM a JOIN b ON a.x IS NOT DISTINCT FROM b.x),
grp AS (SELECT COUNT(*) AS n_groups FROM (SELECT x FROM a GROUP BY x)),
agg AS (SELECT COUNT(*) AS n_rows, COUNT(x) AS count_x,
               SUM(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS n_null_x
        FROM a)
SELECT CAST(agg.n_rows AS BIGINT) AS n_rows,
       CAST(agg.n_null_x AS BIGINT) AS n_null_x,
       CAST(agg.count_x AS BIGINT) AS count_x,
       CAST(eq.n AS BIGINT) AS n_eq_join,
       CAST(ns.n AS BIGINT) AS n_nullsafe_join,
       CAST(grp.n_groups AS BIGINT) AS n_groups
FROM agg, eq, ns, grp
"""


@query("q_null_semantics", oracle=_NULLSEM_ORACLE, tags=("relational", "nulls"))
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics parity contract: plain equality joins DROP null
    keys (n_eq_join < n_rows), null-safe equality (``<=>`` /
    IS NOT DISTINCT FROM) matches them, GROUP BY collects NULLs into
    ONE group, and COUNT(col) skips NULLs while COUNT(*) does not.
    These are the rules that silently corrupt pipelines when two
    engines disagree — pinned here as a single hash-compared row.

    Scale shape: the dim side is a DISTINCT of the derived key
    (broadcastable); everything else is one aggregate per contract."""
    o = load_table(spark, sf_dir, "orders")
    a = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("o_orderpriority")
        ).alias("x"),
    )
    b = a.select("x").distinct()
    eq = a.join(b.withColumnRenamed("x", "bx"), F.col("x") == F.col("bx")).agg(
        F.count(F.lit(1)).alias("n_eq_join")
    )
    ns = a.join(b.withColumnRenamed("x", "bx"), F.col("x").eqNullSafe(F.col("bx"))).agg(
        F.count(F.lit(1)).alias("n_nullsafe_join")
    )
    grp = a.groupBy("x").agg(F.count(F.lit(1))).agg(F.count(F.lit(1)).alias("n_groups"))
    agg = a.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("x").isNull(), 1).otherwise(0)).cast("long").alias("n_null_x"),
        F.count("x").alias("count_x"),
    )
    return (
        agg.crossJoin(F.broadcast(eq))
        .crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(grp))
        .select(
            F.col("n_rows").cast("long"),
            F.col("n_null_x").cast("long"),
            F.col("count_x").cast("long"),
            F.col("n_eq_join").cast("long"),
            F.col("n_nullsafe_join").cast("long"),
            F.col("n_groups").cast("long"),
        )
    )


# --------------------------------------------------------------------------
# GROUPING() disambiguation: data-NULL groups vs rollup-total rows.
# --------------------------------------------------------------------------
_GROUPING_FN_SQL = """
WITH a AS (
  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS x,
         o_totalprice
  FROM orders
)
SELECT x,
       CAST(GROUPING(x) AS BIGINT) AS is_total,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM a
GROUP BY ROLLUP(x)
ORDER BY is_total, x NULLS FIRST
"""


@query("q_grouping_fn", oracle=_GROUPING_FN_SQL, tags=("agg", "groupingsets", "nulls", "sql"))
def q_grouping_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() disambiguation — the classic rollup trap: a grouping
    column that CONTAINS data NULLs produces TWO x=NULL rows under
    ROLLUP, and only GROUPING(x) tells the data-NULL group (0) apart
    from the rollup grand total (1). Engines that disagree here
    silently double-count dashboards. One dialect-portable string runs
    verbatim on both engines (explicit NULLS FIRST — Spark and DuckDB
    default NULL ordering differently, the second trap in the same
    query).

    Scale shape: one Expand + hash aggregate, same as every rollup."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_FN_SQL)
