"""Advanced warehouse / pipeline operators: SCD2 history, range join,
profiling, stratified sampling, fuzzy matching, anomaly detection,
gaps-and-islands.

These extend the reference's DML surface (SURVEY.md §2.3; its only
merge is last-write-wins, ``redshift.py:386-416``) with the operators a
production warehouse actually runs on top of that primitive. All are
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stable import dsum, sql_dsum
from ..operators.fuzzy import blocked_levenshtein_join
from ..operators.intervaljoin import interval_join
from ..operators.profile import profile_columns
from ..operators.scd import scd2_build
from ..registry import load_table, query

# --------------------------------------------------------------------------
# SCD Type 2: fold the orders change-log into versioned history.
# --------------------------------------------------------------------------
_SCD2_ORACLE = """
WITH h AS (
  SELECT o_orderpriority, o_orderdate AS valid_from,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS valid_to
  FROM orders
)
SELECT o_orderpriority,
       COUNT(*) AS n_versions,
       CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
       CAST(SUM(CASE WHEN valid_to IS NULL THEN 0
                     ELSE date_diff('day', valid_from, valid_to) END) AS BIGINT) AS closed_days
FROM h GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("q_scd2_dimension", oracle=_SCD2_ORACLE, tags=("merge", "scd2", "window"))
def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 from a change log: each order is a customer-state
    change; ``scd2_build`` assigns valid_from/valid_to/is_current with
    one hash-shuffle on the key (lead window). The reference can only
    overwrite state (redshift.py:386-416); this keeps full history."""
    orders = load_table(spark, sf_dir, "orders")
    hist = scd2_build(orders, ["o_custkey"], "o_orderdate", ["o_orderkey"])
    return (
        hist.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.sum(F.when(F.col("is_current"), 1).otherwise(0)).cast("long").alias("n_current"),
            F.sum(
                F.when(F.col("is_current"), 0).otherwise(
                    F.datediff(F.col("valid_to"), F.col("valid_from"))
                )
            )
            .cast("long")
            .alias("closed_days"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Point-in-interval join via bucket expansion (no cartesian product).
# --------------------------------------------------------------------------
_INTERVAL_ORACLE = f"""
WITH wins AS (
  SELECT event_id AS win_id, ts AS w_start, ts + INTERVAL 2 HOUR AS w_end
  FROM events WHERE event_type = 'purchase' AND event_id % 31 = 0
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT w.win_id) AS n_windows,
       {sql_dsum('e.value')} AS total_value
FROM events e JOIN wins w ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY e.event_type ORDER BY e.event_type
"""


@query("q_events_interval_join", oracle=_INTERVAL_ORACLE, tags=("events", "join", "range"))
def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (which events fall inside 2-hour incident windows)
    re-expressed as hour-bucket explode + equi-join + residual filter —
    the shape that survives 100 TB where the naive BETWEEN join plans a
    nested-loop cartesian. The oracle runs the naive form (DuckDB's
    IEJoin handles it at this scale)."""
    ev = load_table(spark, sf_dir, "events")
    wins = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("event_id") % 31 == 0))
        .select(
            F.col("event_id").alias("win_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
        )
    )
    pairs = interval_join(ev, wins, "ts", "w_start", "w_end", "1 hour")
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("win_id").alias("n_windows"),
            dsum("value").alias("total_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Column profiling: one scan, all metrics, tidy long output.
# --------------------------------------------------------------------------
_PROFILE_ORACLE = """
SELECT 'o_custkey' AS col_name, COUNT(*) - COUNT(o_custkey) AS n_nulls,
       COUNT(DISTINCT o_custkey) AS n_distinct,
       CAST(MIN(o_custkey) AS DOUBLE) AS min_num, CAST(MAX(o_custkey) AS DOUBLE) AS max_num
FROM orders
UNION ALL
SELECT 'o_orderkey', COUNT(*) - COUNT(o_orderkey), COUNT(DISTINCT o_orderkey),
       CAST(MIN(o_orderkey) AS DOUBLE), CAST(MAX(o_orderkey) AS DOUBLE) FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority),
       -1.0, -1.0 FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
       -1.0, -1.0 FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice), COUNT(DISTINCT o_totalprice),
       CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE) FROM orders
ORDER BY col_name
"""


@query("q_profile_orders", oracle=_PROFILE_ORACLE, tags=("profile", "quality"))
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of ``orders`` — null counts, cardinality,
    numeric ranges — in ONE aggregate pass + stack unpivot (the oracle
    needs five scans to say the same thing)."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"]
    return profile_columns(orders, cols).orderBy("col_name")


# --------------------------------------------------------------------------
# Exact-k stratified sample, deterministic under any partitioning.
# --------------------------------------------------------------------------
_STRAT_ORACLE = f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY CAST(concat('0x', substring(md5(CAST(o_orderkey AS VARCHAR)),1,15)) AS BIGINT),
                    o_orderkey) AS rn
  FROM orders
)
SELECT o_orderpriority, COUNT(*) AS n_sampled, {sql_dsum('o_totalprice')} AS sum_price
FROM ranked WHERE rn <= 100
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@query("q_stratified_sample", oracle=_STRAT_ORACLE, tags=("sampling", "window"))
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 100 rows per stratum, chosen by md5-hash order — the
    reproducible alternative to ``sampleBy`` (whose RNG stream depends
    on partitioning). The rank<=k filter triggers Spark's
    WindowGroupLimit: each input partition pre-keeps its local top-k,
    so the per-stratum task sees O(partitions x k) rows, not the whole
    stratum — this is what keeps one-task-per-stratum safe at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    hv = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10).cast("long")
    w = Window.partitionBy("o_orderpriority").orderBy("hv", "o_orderkey")
    return (
        orders.withColumn("hv", hv)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_sampled"), dsum("o_totalprice").alias("sum_price"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Fuzzy entity resolution: blocked Levenshtein match of dirty names.
# --------------------------------------------------------------------------
_FUZZY_ORACLE = """
WITH dirty AS (
  SELECT substring(c_name, 10, 9) AS digits,
         CASE c_custkey % 4
           WHEN 0 THEN concat('Custmer#',  substring(c_name, 10, 9))
           WHEN 1 THEN concat('Kustomr#',  substring(c_name, 10, 9))
           WHEN 2 THEN concat('XYZ#',      substring(c_name, 10, 9))
           ELSE c_name END AS dirty_name
  FROM customer
)
SELECT CAST(levenshtein(d.dirty_name, c.c_name) AS BIGINT) AS edit_distance,
       COUNT(*) AS n_matches
FROM dirty d JOIN customer c ON d.digits = substring(c.c_name, 10, 9)
WHERE levenshtein(d.dirty_name, c.c_name) <= 2
GROUP BY 1 ORDER BY 1
"""


@query("q_fuzzy_entity_match", oracle=_FUZZY_ORACLE, tags=("join", "fuzzy", "text"))
def q_fuzzy_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: deterministically-corrupted customer names
    matched back to the clean roster. Blocking on the digit suffix
    turns the O(n^2) all-pairs edit-distance join into an equi-join;
    Levenshtein evaluates JVM-side only inside blocks. Names mangled
    beyond distance 2 ('XYZ#') correctly find no match."""
    cust = load_table(spark, sf_dir, "customer")
    digits = F.substring("c_name", 10, 9)
    dirty = cust.select(
        digits.alias("digits"),
        F.when(F.col("c_custkey") % 4 == 0, F.concat(F.lit("Custmer#"), digits))
        .when(F.col("c_custkey") % 4 == 1, F.concat(F.lit("Kustomr#"), digits))
        .when(F.col("c_custkey") % 4 == 2, F.concat(F.lit("XYZ#"), digits))
        .otherwise(F.col("c_name"))
        .alias("dirty_name"),
    )
    matched = blocked_levenshtein_join(
        dirty,
        cust.select("c_name"),
        "dirty_name",
        "c_name",
        F.col("digits"),
        F.substring("c_name", 10, 9),
        max_distance=2,
    )
    return (
        matched.groupBy("edit_distance")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .orderBy("edit_distance")
    )


# --------------------------------------------------------------------------
# Z-score anomaly detection with bit-stable thresholds.
# --------------------------------------------------------------------------
_ZSCORE_ORACLE = f"""
WITH st AS (
  SELECT event_type, COUNT(*) AS n, {sql_dsum('value')} AS s, {sql_dsum('value*value')} AS ss
  FROM events GROUP BY event_type
),
st2 AS (
  SELECT event_type,
         CAST(s AS DOUBLE) / n AS mean,
         sqrt(CAST(ss AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS std
  FROM st
)
SELECT e.event_type, COUNT(*) AS n_outliers, {sql_dsum('e.value')} AS outlier_value
FROM events e JOIN st2 s ON e.event_type = s.event_type
WHERE abs(e.value - s.mean) > 1.5 * s.std
GROUP BY e.event_type ORDER BY e.event_type
"""


@query("q_events_zscore_outliers", oracle=_ZSCORE_ORACLE, tags=("events", "stats"))
def q_events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers. The mean/std come from decimal
    fixed-point sums (partial-agg order cannot perturb them), then the
    SAME double expression tree as the oracle — identical IEEE ops give
    identical thresholds, so no boundary event can classify
    differently. Stats (5 rows) broadcast back onto the fact scan."""
    ev = load_table(spark, sf_dir, "events")
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("s"),
        dsum(F.col("value") * F.col("value")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    st2 = st.select(
        "event_type",
        mean.alias("mean"),
        F.sqrt(F.col("ss").cast("double") / F.col("n") - mean * mean).alias("std"),
    )
    return (
        ev.join(F.broadcast(st2), "event_type")
        .filter(F.abs(F.col("value") - F.col("mean")) > 1.5 * F.col("std"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"), dsum("value").alias("outlier_value"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Gaps-and-islands: consecutive-day activity streaks per user.
# --------------------------------------------------------------------------
_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
),
g AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, COUNT(*) AS streak_len FROM g GROUP BY user_id, grp
)
SELECT streak_len, COUNT(*) AS n_streaks FROM streaks GROUP BY streak_len ORDER BY streak_len
"""


@query("q_events_streaks", oracle=_STREAK_ORACLE, tags=("events", "window"))
def q_events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands via the date-minus-row_number trick: consecutive
    active days share a constant group key, so streaks fall out of two
    hash aggregations plus one per-user window — no self-join, no
    iteration; everything shuffles once on user_id."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    streaks = (
        days.withColumn("grp", F.date_sub(F.col("d"), F.row_number().over(w)))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("streak_len"))
    )
    return (
        streaks.groupBy("streak_len")
        .agg(F.count(F.lit(1)).alias("n_streaks"))
        .orderBy("streak_len")
    )
