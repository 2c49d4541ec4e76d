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

from ..functions.stable import dec, dsum, dsum_micro, sql_dsum, sql_dsum_micro
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


# --------------------------------------------------------------------------
# Market-basket co-occurrence: part pairs ordered together.
# --------------------------------------------------------------------------
_BASKET_ORACLE = """
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY p1, p2 ORDER BY n_orders DESC, p1, p2 LIMIT 20
"""


@query("q_market_basket", oracle=_BASKET_ORACLE, tags=("join", "cooccurrence"))
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence mining (which parts ship in the same order): a
    self-equi-join on the order key, so both sides co-partition in one
    shuffle and pair blow-up is bounded by order size (~4 lines/order),
    never by table size. Top-k plans as TakeOrderedAndProject with a
    total tie-broken order, so the cut is deterministic."""
    lp = (
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = lp.alias("a")
    b = lp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "p1", "p2")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Time-weighted average (TWAP): integral of a step function per user.
# --------------------------------------------------------------------------
_TWAP_ORACLE = f"""
WITH seg AS (
  SELECT user_id, value,
         (epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
          - epoch_us(ts)) / 1000000.0 AS dur_s
  FROM events
)
SELECT user_id,
       {sql_dsum_micro('value * dur_s')}
         // ({sql_dsum_micro('dur_s')} // 1000) AS twap_milli
FROM seg WHERE dur_s IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


@query("q_events_twap", oracle=_TWAP_ORACLE, tags=("events", "window", "stats"))
def q_events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each event's value holds
    until the user's next event (lead window), weight = segment
    duration. Weighted sums go through decimal fixed-point so the
    shuffle's partial-agg order cannot move the result; the quotient
    stays in integer milli-units (a decimal->double cast of a >2^53
    fixed-point sum rounds differently across engines)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur_s = (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))) / F.lit(1000000.0)
    seg = ev.withColumn("dur_s", dur_s).filter(F.col("dur_s").isNotNull())
    sv = dsum_micro(F.col("value") * F.col("dur_s"))
    sd = dsum_micro("dur_s")
    return (
        seg.groupBy("user_id")
        .agg(sv.alias("sv"), sd.alias("sd"))
        .select("user_id", F.expr("sv div (sd div 1000)").alias("twap_milli"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Last-touch attribution: credit each purchase to the nearest prior
# non-purchase event of the same user.
# --------------------------------------------------------------------------
_ATTR_ORACLE = f"""
WITH attr AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src
  FROM events
)
SELECT COALESCE(src, 'none') AS source_type,
       COUNT(*) AS n_purchases,
       {sql_dsum('value')} AS purchase_value
FROM attr WHERE event_type = 'purchase'
GROUP BY source_type ORDER BY source_type
"""


@query("q_attribution_last_touch", oracle=_ATTR_ORACLE, tags=("events", "window"))
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style last-touch attribution as a single per-user
    window pass (``last(..., ignorenulls)`` over preceding rows) — no
    self-join, one shuffle on user_id, linear in events."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    src = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("src", src)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("src"), F.lit("none")).alias("source_type"))
        .agg(F.count(F.lit(1)).alias("n_purchases"), dsum("value").alias("purchase_value"))
        .orderBy("source_type")
    )


# --------------------------------------------------------------------------
# Equi-width histogram of order prices.
# --------------------------------------------------------------------------
_HIST_ORACLE = f"""
SELECT LEAST(CAST(floor(o_totalprice / 25000.0) AS BIGINT), 19) AS bucket,
       COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS sum_price
FROM orders GROUP BY bucket ORDER BY bucket
"""


@query("q_histogram_prices", oracle=_HIST_ORACLE, tags=("stats", "histogram"))
def q_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 x 25k buckets, top-clamped): bucket id
    is a pure projection, so the whole query is one map-side-combined
    hash aggregate over the scan — the cheapest possible distribution
    profile at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / F.lit(25000.0)).cast("long"), F.lit(19))
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("sum_price"))
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Table reconciliation: classify keys as added/removed/changed/unchanged.
# --------------------------------------------------------------------------
_DIFF_ORACLE = """
WITH src AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0 THEN 'Z' ELSE o_orderstatus END AS o_orderstatus,
         o_custkey
  FROM orders WHERE o_orderkey % 17 <> 0
  UNION ALL
  SELECT o_orderkey + 200000000, o_orderstatus, o_custkey FROM orders WHERE o_orderkey % 19 = 0
),
j AS (
  SELECT t.o_orderkey AS tk, s.o_orderkey AS sk,
         t.o_orderstatus AS tstat, s.o_orderstatus AS sstat,
         t.o_custkey AS tcust, s.o_custkey AS scust
  FROM orders t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
)
SELECT CASE WHEN tk IS NULL THEN 'added'
            WHEN sk IS NULL THEN 'removed'
            WHEN tstat IS DISTINCT FROM sstat OR tcust IS DISTINCT FROM scust THEN 'changed'
            ELSE 'unchanged' END AS diff_class,
       COUNT(*) AS n_rows
FROM j GROUP BY diff_class ORDER BY diff_class
"""


@query("q_table_diff", oracle=_DIFF_ORACLE, tags=("merge", "reconcile"))
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load reconciliation: a deterministically-perturbed copy of
    ``orders`` (status flips, dropped keys, new keys) diffed against
    the original with ``diff_tables`` — one full-outer hash join on the
    key, column compares JVM-side, no row hashing (float-hashing is
    bit-fragile across engines)."""
    from ..operators.reconcile import diff_tables

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_custkey"
    )
    kept = orders.filter(F.col("o_orderkey") % 17 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("Z")).otherwise(F.col("o_orderstatus")),
    )
    added = orders.filter(F.col("o_orderkey") % 19 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 200000000
    )
    src = kept.unionByName(added)
    diff = diff_tables(orders, src, ["o_orderkey"], ["o_orderstatus", "o_custkey"])
    return (
        diff.groupBy("diff_class").agg(F.count(F.lit(1)).alias("n_rows")).orderBy("diff_class")
    )


# --------------------------------------------------------------------------
# PMI-ranked bigram collocations with integer fixed-point scores.
# --------------------------------------------------------------------------
_PMI_ORACLE = """
WITH toks AS (
  SELECT string_split_regex(trim(text), '\\s+') AS w FROM documents
),
uni AS (
  SELECT tok, COUNT(*) AS c FROM (SELECT unnest(w) AS tok FROM toks) GROUP BY tok
),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM uni),
big AS (
  SELECT w[i] AS w1, w[i + 1] AS w2, COUNT(*) AS ab
  FROM toks, UNNEST(range(1, len(w))) AS t(i)
  GROUP BY w1, w2
)
SELECT b.w1, b.w2, b.ab AS n_pair,
       (b.ab * 1000 * n.n_total) // (ua.c * ub.c) AS score_fp
FROM big b
JOIN uni ua ON b.w1 = ua.tok
JOIN uni ub ON b.w2 = ub.tok
CROSS JOIN n
WHERE b.ab >= 5
ORDER BY score_fp DESC, w1, w2 LIMIT 15
"""


@query("q_text_pmi_bigrams", oracle=_PMI_ORACLE, tags=("text", "collocation"))
def q_text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: bigrams ranked by pointwise mutual
    information. PMI's log is monotone, so ranking by the *rational*
    p(ab)/(p(a)p(b)) in int64 fixed-point (x1000) sidesteps cross-
    engine libm differences entirely. Unigram/bigram counts are two
    hash aggregates; corpus size N broadcasts as one row."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.trim(F.col("text")), r"\s+").alias("w"))
    uni = toks.select(F.explode("w").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    n = uni.agg(F.sum("c").alias("n_total"))
    big = (
        toks.filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, size(w)-1), i -> struct(w[i-1] AS w1, w[i] AS w2))")
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("ab"))
        .filter(F.col("ab") >= 5)
    )
    ua = uni.select(F.col("tok").alias("w1"), F.col("c").alias("ca"))
    ub = uni.select(F.col("tok").alias("w2"), F.col("c").alias("cb"))
    return (
        big.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("ab").alias("n_pair"),
            F.expr("(ab * 1000 * n_total) div (ca * cb)").alias("score_fp"),
        )
        .orderBy(F.col("score_fp").desc(), "w1", "w2")
        .limit(15)
    )


# --------------------------------------------------------------------------
# Triangle counting on the co-order part graph.
# --------------------------------------------------------------------------
_TRI_ORACLE = """
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY src, dst HAVING COUNT(*) >= 2
)
SELECT e1.src AS p_apex, COUNT(*) AS n_triangles
FROM e e1
JOIN e e2 ON e1.dst = e2.src
JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
GROUP BY p_apex ORDER BY n_triangles DESC, p_apex LIMIT 10
"""


@query("q_graph_triangles", oracle=_TRI_ORACLE, tags=("graph", "join"))
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the frequently-co-ordered part graph.
    Edges orient small->large so each triangle (a<b<c) closes exactly
    once; the two equi-joins shuffle on a vertex key each, so wedge
    blow-up is Σdeg² spread across executors — the standard distributed
    triangle algorithm. The support>=2 filter prunes the edge set
    before any join."""
    lp = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = lp.alias("a"), lp.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("src", "dst")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    return (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(e3, (F.col("e3.src") == F.col("e1.src")) & (F.col("e3.dst") == F.col("e2.dst")))
        .groupBy(F.col("e1.src").alias("p_apex"))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.col("n_triangles").desc(), "p_apex")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Incremental view maintenance: merge partial aggregates of base + delta.
# --------------------------------------------------------------------------
_IVM_ORACLE = f"""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
FROM events GROUP BY day, event_type ORDER BY day, event_type
"""


@query("q_incremental_agg", oracle=_IVM_ORACLE, tags=("agg", "incremental"))
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the daily aggregate
    is computed as base partials (history) MERGED with delta partials
    (new batch) — counts add, decimal sums add, so the merged view is
    bit-identical to a full recompute (the oracle). At 100 TB this is
    the difference between re-scanning everything and scanning only
    the new day."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")

    def partials(df):
        # Partials stay DECIMAL (associative) — merging them and then
        # casting to double is bit-identical to a full decimal recompute,
        # which is exactly what the oracle's sql_dsum produces.
        return df.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum(dec("value")).alias("s")
        )

    base = partials(ev.filter(F.col("ts") < cutoff))
    delta = partials(ev.filter(F.col("ts") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(F.sum("n").alias("n_events"), F.sum("s").cast("double").alias("total_value"))
        .orderBy("day", "event_type")
    )


# --------------------------------------------------------------------------
# Join-key skew report: the diagnostic behind salting decisions.
# --------------------------------------------------------------------------
_SKEWREP_ORACLE = """
WITH k AS (SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY o_custkey)
SELECT COUNT(*) AS n_keys,
       CAST(MAX(c) AS BIGINT) AS max_cnt,
       quantile_cont(c, 0.5) AS p50_cnt,
       quantile_cont(c, 0.99) AS p99_cnt,
       (CAST(MAX(c) AS BIGINT) * 1000000) // CAST(SUM(c) AS BIGINT) AS top_share_ppm
FROM k
"""


@query("q_skew_report", oracle=_SKEWREP_ORACLE, tags=("skew", "profile"))
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution diagnostic for a prospective join/groupBy key:
    cardinality, hottest-key count, exact p50/p99, and the top key's
    share in ppm (integer fixed-point). This is the measurement that
    justifies salting (operators/skew.py) before burning a shuffle on
    a skewed key."""
    orders = load_table(spark, sf_dir, "orders")
    k = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("c"))
    return k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_cnt"),
        F.expr("percentile(c, 0.5)").alias("p50_cnt"),
        F.expr("percentile(c, 0.99)").alias("p99_cnt"),
        F.expr("(max(c) * 1000000) div sum(c)").alias("top_share_ppm"),
    )


# --------------------------------------------------------------------------
# Data-quality expectations suite across the star schema.
# --------------------------------------------------------------------------
_EXPECT_ORACLE = """
SELECT 'customer_nationkey_valid' AS rule,
       (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
          (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS n_violations,
       (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
          (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) = 0 AS passed
UNION ALL
SELECT 'events_value_in_range',
       (SELECT COUNT(*) FROM events WHERE value < 0 OR value > 1000),
       (SELECT COUNT(*) FROM events WHERE value < 0 OR value > 1000) = 0
UNION ALL
SELECT 'lineitem_orderkey_exists',
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0
UNION ALL
SELECT 'orders_orderkey_unique',
       (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders),
       (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) = 0
UNION ALL
SELECT 'orders_totalprice_positive',
       (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0),
       (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) = 0
ORDER BY rule
"""


@query("q_expectations", oracle=_EXPECT_ORACLE, tags=("quality", "expectations"))
def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-gate validation: uniqueness, value ranges, referential
    integrity — each rule is a violation-counting plan (anti-joins /
    pushed-down filters), unioned into one report. The load-then-
    validate counterpart to the reference's API-level type checks
    (s3.py:121-149)."""
    from ..operators.expectations import (
        expect_condition,
        expect_ref_integrity,
        expect_unique,
        run_expectations,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    ev = load_table(spark, sf_dir, "events")
    rules = {
        "customer_nationkey_valid": expect_ref_integrity(
            customer, "c_nationkey", nation, "n_nationkey"
        ),
        "events_value_in_range": expect_condition(
            ev, (F.col("value") < 0) | (F.col("value") > 1000)
        ),
        "lineitem_orderkey_exists": expect_ref_integrity(
            lineitem, "l_orderkey", orders, "o_orderkey"
        ),
        "orders_orderkey_unique": expect_unique(orders, ["o_orderkey"]),
        "orders_totalprice_positive": expect_condition(orders, F.col("o_totalprice") <= 0),
    }
    return run_expectations(rules).orderBy("rule")


# --------------------------------------------------------------------------
# Exponential time-decay scoring with exact power-of-two weights.
# --------------------------------------------------------------------------
_DECAY_ORACLE = """
WITH aged AS (
  SELECT user_id,
         CAST(floor(value * 1000000 /
                    (1::BIGINT << date_diff('day', CAST(date_trunc('day', ts) AS DATE),
                                            DATE '2024-01-31'))) AS BIGINT) AS dv_micro
  FROM events
)
SELECT user_id, CAST(SUM(dv_micro) AS BIGINT) AS decay_score_fp
FROM aged GROUP BY user_id ORDER BY user_id
"""


@query("q_events_decayed_engagement", oracle=_DECAY_ORACLE, tags=("events", "stats"))
def q_events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement: half-life decay of 1 day,
    weight = 2^-age. Dividing a double by a power of two is EXACT, so
    the weights carry no libm wobble; each term floors to integer
    micro-units BEFORE summing (floor of identical doubles is
    rounding-mode-free, unlike a decimal cast near a half boundary).
    Pure projection + one hash aggregate — scan-speed at any scale."""
    ev = load_table(spark, sf_dir, "events")
    age = F.datediff(F.lit("2024-01-31").cast("date"), F.to_date("ts"))
    dv_micro = F.floor(
        F.col("value") * 1000000 / F.expr("shiftleft(1L, cast(age as int))")
    )
    return (
        ev.withColumn("age", age)
        .withColumn("dv_micro", dv_micro)
        .groupBy("user_id")
        .agg(F.sum("dv_micro").cast("long").alias("decay_score_fp"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Quantile discretization (decile feature binning).
# --------------------------------------------------------------------------
_BINNING_ORACLE = f"""
WITH b AS (
  SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bnds FROM events
)
SELECT CAST(len(list_filter(b.bnds, x -> e.value >= x)) AS BIGINT) AS bin,
       COUNT(*) AS n_events, {sql_dsum('e.value')} AS total_value
FROM events e CROSS JOIN b
GROUP BY bin ORDER BY bin
"""


@query("q_feature_binning", oracle=_BINNING_ORACLE, tags=("stats", "binning"))
def q_feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretization: exact decile boundaries (sort-based
    percentile, bit-stable across engines) broadcast as one row; each
    value's bin = how many boundaries it clears. The ML feature-
    engineering step (equal-frequency binning) as two aggregates."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.expr("percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").alias("bnds")
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "value",
            F.expr(
                "CAST(aggregate(bnds, 0, (acc, x) -> acc + IF(value >= x, 1, 0)) AS BIGINT)"
            ).alias("bin"),
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Document chunking with overlap (training-pipeline windowing).
# --------------------------------------------------------------------------
_CHUNK_ORACLE = """
WITH toks AS (
  SELECT source, len(string_split_regex(trim(text), '\\s+')) AS n FROM documents
),
chunks AS (
  SELECT source, LEAST(32, n - s.start) AS chunk_len
  FROM toks, UNNEST(range(0, n, 24)) AS s(start)
)
SELECT source,
       COUNT(*) AS n_chunks,
       CAST(SUM(chunk_len) AS BIGINT) AS sum_chunk_tokens,
       CAST(SUM(CASE WHEN chunk_len = 32 THEN 1 ELSE 0 END) AS BIGINT) AS n_full_chunks
FROM chunks GROUP BY source ORDER BY source
"""


@query("q_text_chunk_overlap", oracle=_CHUNK_ORACLE, tags=("text", "chunking"))
def q_text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (size 32, stride 24, overlap 8) — how a
    training pipeline slices documents into model-context windows.
    Chunk starts materialize via sequence+explode (pure projection, no
    shuffle until the final per-source rollup); only counts leave the
    operator, the text itself never re-serializes."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n")
    )
    chunks = toks.select(
        "source",
        "n",
        F.explode(F.expr("sequence(0, n - 1, 24)")).alias("start"),
    ).select("source", F.least(F.lit(32), F.col("n") - F.col("start")).alias("chunk_len"))
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_len").cast("long").alias("sum_chunk_tokens"),
            F.sum(F.when(F.col("chunk_len") == 32, 1).otherwise(0))
            .cast("long")
            .alias("n_full_chunks"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Ratio-to-report: each nation's share of its region's revenue (ppm).
# --------------------------------------------------------------------------
_SHARE_ORACLE = f"""
WITH nrev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         {sql_dsum_micro('o.o_totalprice')} AS rev_micro
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY region, nation
)
SELECT region, nation, rev_micro,
       CAST(rev_micro // (SUM(rev_micro) OVER (PARTITION BY region) // 1000000) AS BIGINT) AS share_ppm
FROM nrev ORDER BY region, nation
"""


@query("q_revenue_share_ppm", oracle=_SHARE_ORACLE, tags=("window", "ratio"))
def q_revenue_share_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: nation revenue as ppm of its region, all in
    exact integer micro-units (window SUM of longs, integer division)
    — no float division anywhere. Dimension joins broadcast; the only
    shuffles are the group-by and the per-region window."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nrev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(dsum_micro("o_totalprice").alias("rev_micro"))
    )
    w = Window.partitionBy("region")
    return nrev.select(
        "region",
        "nation",
        "rev_micro",
        F.expr("rev_micro div (sum(rev_micro) over (partition by region) div 1000000)").alias(
            "share_ppm"
        ),
    ).orderBy("region", "nation")


# --------------------------------------------------------------------------
# Rolling 7-day distinct users (WAU) via contribution explode.
# --------------------------------------------------------------------------
_WAU_ORACLE = """
WITH contrib AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) + CAST(s.off AS INTEGER) AS bucket_day, user_id
  FROM events, UNNEST(range(0, 7)) AS s(off)
)
SELECT bucket_day, COUNT(DISTINCT user_id) AS wau
FROM contrib GROUP BY bucket_day ORDER BY bucket_day
"""


@query("q_events_wau_rolling", oracle=_WAU_ORACLE, tags=("events", "window", "distinct"))
def q_events_wau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day. COUNT(DISTINCT) doesn't
    compose over sliding windows, so each activity day *contributes*
    to the 7 window-end days instead (explode of 7 offsets), turning
    the rolling distinct into a plain per-day distinct count — 7x row
    inflation on the (user, day) deduped set, fully partial-aggregated,
    vs an unbounded window sort. At extreme scale, swap the exact
    distinct for mergeable HLL sketches per day."""
    ev = load_table(spark, sf_dir, "events")
    contrib = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .select("user_id", F.explode(F.expr("sequence(0, 6)")).alias("off"), "d")
        .select(F.expr("date_add(d, off)").alias("bucket_day"), "user_id")
        .distinct()
    )
    return (
        contrib.groupBy("bucket_day")
        .agg(F.count_distinct("user_id").alias("wau"))
        .orderBy("bucket_day")
    )


# --------------------------------------------------------------------------
# Pareto (80/20) concentration analysis of supplier revenue.
# --------------------------------------------------------------------------
_PARETO_ORACLE = f"""
WITH srev AS (
  SELECT l_suppkey,
         {sql_dsum_micro('l_extendedprice * (1 - l_discount)')} AS rev
  FROM lineitem GROUP BY l_suppkey
),
ranked AS (
  SELECT rev,
         SUM(rev) OVER (ORDER BY rev DESC, l_suppkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(rev) OVER () AS total
  FROM srev
)
SELECT COUNT(*) AS n_suppliers,
       CAST(SUM(CASE WHEN (cum - rev) * 5 < total * 4 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_for_80pct,
       CAST(MAX(CASE WHEN cum = rev THEN rev ELSE 0 END) // (MAX(total) // 1000000)
            AS BIGINT) AS top_share_ppm
FROM ranked
"""


@query("q_supplier_pareto", oracle=_PARETO_ORACLE, tags=("window", "pareto"))
def q_supplier_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration analysis: how many suppliers cover 80% of revenue,
    and the top supplier's share (ppm) — cumulative window sums over
    exact integer micro-units, so the 80% cut is an integer comparison
    ((cum-rev)*5 < total*4), no float thresholds.

    Scale shape: the running revenue sum is a two-phase
    :func:`~pandas_aws_spark.operators.twophase.distributed_cumsum`
    (range-partitioned partial cumsums + broadcast prefix offsets), and
    the grand total is a one-row broadcast — no single-partition window
    over the supplier dimension, which grows with SF."""
    from ..operators.twophase import distributed_cumsum

    li = load_table(spark, sf_dir, "lineitem")
    srev = li.groupBy("l_suppkey").agg(
        dsum_micro(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    cum = distributed_cumsum(
        srev, [F.col("rev").desc(), "l_suppkey"], "rev", out="cum"
    )
    total = srev.agg(F.sum("rev").alias("total"))
    ranked = cum.crossJoin(F.broadcast(total)).select("rev", "cum", "total")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.when((F.col("cum") - F.col("rev")) * 5 < F.col("total") * 4, 1).otherwise(0))
        .cast("long")
        .alias("n_for_80pct"),
        F.expr("max(CASE WHEN cum = rev THEN rev ELSE 0 END) div (max(total) div 1000000)").alias(
            "top_share_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Time-series gap filling with forward fill (dense hourly calendar).
# --------------------------------------------------------------------------
_GAPFILL_ORACLE = f"""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
),
cal AS (
  SELECT t.h AS hour, et.event_type
  FROM bounds, UNNEST(generate_series(bounds.lo, bounds.hi, INTERVAL 1 HOUR)) AS t(h),
       (SELECT DISTINCT event_type FROM events) et
),
agg AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, {sql_dsum_micro('value')} AS val_micro
  FROM events GROUP BY hour, event_type
),
joined AS (
  SELECT c.hour, c.event_type, a.val_micro,
         CASE WHEN a.val_micro IS NULL THEN 0 ELSE 1 END AS observed
  FROM cal c LEFT JOIN agg a ON c.hour = a.hour AND c.event_type = a.event_type
),
filled AS (
  SELECT hour, event_type, observed,
         COALESCE(last_value(val_micro IGNORE NULLS)
                    OVER (PARTITION BY event_type ORDER BY hour
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS filled_micro
  FROM joined
)
SELECT event_type,
       COUNT(*) AS n_hours,
       CAST(COUNT(*) - SUM(observed) AS BIGINT) AS n_filled,
       CAST(SUM(filled_micro) AS BIGINT) AS total_filled_micro
FROM filled GROUP BY event_type ORDER BY event_type
"""


@query("q_events_gap_fill", oracle=_GAPFILL_ORACLE, tags=("events", "window", "gapfill"))
def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type: generate the full calendar
    (sequence + explode — no driver loop), left-join the sparse hourly
    aggregates, forward-fill holes with the last observation
    (``last(ignorenulls)`` running window). The gap-filling shape every
    monitoring/reporting pipeline needs; values stay in exact integer
    micro-units so the fill is bit-stable."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(dsum_micro("value").alias("val_micro"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    cal = (
        bounds.select(
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour")
        )
        .crossJoin(F.broadcast(ev.select("event_type").distinct()))
    )
    joined = cal.join(agg, ["hour", "event_type"], "left").withColumn(
        "observed", F.when(F.col("val_micro").isNull(), 0).otherwise(1)
    )
    wfill = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.withColumn(
        "filled_micro",
        F.coalesce(F.last("val_micro", ignorenulls=True).over(wfill), F.lit(0)),
    )
    return (
        filled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            (F.count(F.lit(1)) - F.sum("observed")).cast("long").alias("n_filled"),
            F.sum("filled_micro").cast("long").alias("total_filled_micro"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintiles).
# --------------------------------------------------------------------------
_RFM_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS freq,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(25,6))
              * CAST(1000000 AS DECIMAL(7,0)) AS BIGINT) AS money_micro
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT NTILE(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
         NTILE(5) OVER (ORDER BY freq, o_custkey) AS f_score,
         NTILE(5) OVER (ORDER BY money_micro, o_custkey) AS m_score
  FROM cust
)
SELECT r_score * 100 + f_score * 10 + m_score AS rfm_segment, COUNT(*) AS n_customers
FROM scored GROUP BY rfm_segment ORDER BY rfm_segment
"""


@query("q_customer_rfm", oracle=_RFM_ORACLE, tags=("window", "segmentation"))
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary
    quintiles (ntile with full tie-breaks -> deterministic), combined
    into a 3-digit segment code. Monetary stays in exact integer
    micro-units.

    Scale shape: each quintile score comes from
    :func:`~pandas_aws_spark.operators.twophase.distributed_ntile`
    (range-partitioned two-phase rank, bit-identical to SQL NTILE) —
    no single-partition global sort anywhere in the plan, so the
    customer dimension can be 10^8+ rows. The three scores re-join on
    ``o_custkey`` (hash shuffles on a well-distributed key)."""
    from ..operators.twophase import distributed_ntile

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        dsum_micro("o_totalprice").alias("money_micro"),
    )
    r = distributed_ntile(
        cust.select("o_custkey", "last_order"), 5, ["last_order", "o_custkey"], out="r_score"
    ).select("o_custkey", "r_score")
    f = distributed_ntile(
        cust.select("o_custkey", "freq"), 5, ["freq", "o_custkey"], out="f_score"
    ).select("o_custkey", "f_score")
    m = distributed_ntile(
        cust.select("o_custkey", "money_micro"), 5, ["money_micro", "o_custkey"], out="m_score"
    ).select("o_custkey", "m_score")
    scored = r.join(f, "o_custkey").join(m, "o_custkey")
    return (
        scored.groupBy(
            (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).alias(
                "rfm_segment"
            )
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("rfm_segment")
    )


# --------------------------------------------------------------------------
# Arbitrary-SQL passthrough: ONE dialect-portable string, run verbatim
# by Spark and by the DuckDB oracle.
# --------------------------------------------------------------------------
_PASSTHROUGH_SQL = """
WITH seg AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_orderpriority
)
SELECT segment, priority, n_orders, revenue,
       ROW_NUMBER() OVER (PARTITION BY segment
                          ORDER BY revenue DESC, priority) AS rev_rank
FROM seg ORDER BY segment, rev_rank
"""


@query("q_sql_passthrough", oracle=_PASSTHROUGH_SQL, tags=("sql", "passthrough"))
def q_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's de-facto query surface is 'whatever SQL the
    warehouse speaks' (RedshiftClient.get_df, redshift.py:417-448;
    SURVEY.md S7). Here the SAME ANSI string runs verbatim through
    spark.sql() AND through the DuckDB oracle — dialect-portable SQL
    with decimal-stabilized aggregates. Catalyst gets full freedom:
    the customer join broadcasts, the aggregate partials map-side."""
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_PASSTHROUGH_SQL)


# --------------------------------------------------------------------------
# Robust outliers via median absolute deviation (MAD).
# --------------------------------------------------------------------------
_MAD_ORACLE = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, m.med, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m ON e.event_type = m.event_type
  GROUP BY e.event_type, m.med
)
SELECT e.event_type, COUNT(*) AS n_outliers, {sql_dsum('e.value')} AS outlier_value
FROM events e JOIN mad d ON e.event_type = d.event_type
WHERE abs(e.value - d.med) > 2.5 * d.mad
GROUP BY e.event_type ORDER BY e.event_type
"""


@query("q_events_mad_outliers", oracle=_MAD_ORACLE, tags=("events", "stats"))
def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: |x - median| > 2.5 x MAD. Unlike the
    z-score variant, immune to the outliers it hunts (median/MAD have
    a 50% breakdown point). Exact percentile is a sort-based aggregate
    that is bit-identical across engines, and the threshold uses the
    same double expression both sides — no classification flicker.
    Two aggregation passes + one broadcast join back onto the scan."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("value") - F.col("med")) > 2.5 * F.col("mad"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"), dsum("value").alias("outlier_value"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Running balance + maximum drawdown per user (ledger analytics).
# --------------------------------------------------------------------------
_DRAWDOWN_ORACLE = """
WITH moves AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type IN ('purchase', 'error')
              THEN -CAST(round(value * 1000000) AS BIGINT)
              ELSE CAST(round(value * 1000000) AS BIGINT) END AS delta_micro
  FROM events
),
bals AS (
  SELECT user_id, ts, event_id,
         SUM(delta_micro) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
  FROM moves
),
ledger AS (
  SELECT user_id, bal,
         MAX(bal) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM bals
)
SELECT user_id,
       CAST(MAX(peak - bal) AS BIGINT) AS max_drawdown_micro,
       CAST(MAX(bal) AS BIGINT) AS peak_balance_micro
FROM ledger GROUP BY user_id ORDER BY user_id
"""


@query("q_events_max_drawdown", oracle=_DRAWDOWN_ORACLE, tags=("events", "window", "ledger"))
def q_events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ledger analytics: credits/debits per user, running balance, and
    maximum drawdown (deepest dip below the running peak) — the nested
    running-extremum window shape from finance. All arithmetic in
    integer micro-units (round once at ingestion, exact thereafter);
    one shuffle on user_id serves every window."""
    ev = load_table(spark, sf_dir, "events")
    delta = F.when(
        F.col("event_type").isin("purchase", "error"),
        -F.round(F.col("value") * 1000000).cast("long"),
    ).otherwise(F.round(F.col("value") * 1000000).cast("long"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ledger = (
        ev.withColumn("delta_micro", delta)
        .withColumn("bal", F.sum("delta_micro").over(w))
        .withColumn("peak", F.max("bal").over(w))
    )
    return (
        ledger.groupBy("user_id")
        .agg(
            F.max(F.col("peak") - F.col("bal")).cast("long").alias("max_drawdown_micro"),
            F.max("bal").cast("long").alias("peak_balance_micro"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Path analysis: most common opening event-type sequences per session day.
# --------------------------------------------------------------------------
_PATHS_ORACLE = """
WITH ordered AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn
  FROM events
),
paths AS (
  SELECT user_id, d, string_agg(event_type, '->' ORDER BY rn) AS path
  FROM ordered WHERE rn <= 3 GROUP BY user_id, d
)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path ORDER BY n_sessions DESC, path LIMIT 15
"""


@query("q_events_path_analysis", oracle=_PATHS_ORACLE, tags=("events", "window", "paths"))
def q_events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opening-path mining: each user-day's first three event types
    joined into a path string, top paths counted. The rank<=3 filter
    hits WindowGroupLimit (per-partition heaps), the path assembles
    from a sorted struct array — no Python, no cross-row UDF; final
    top-k is TakeOrderedAndProject with a full tie-break."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    opening = (
        ev.withColumn("d", F.to_date("ts"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    paths = (
        opening.groupBy("user_id", "d")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s["event_type"],
                ),
                "->",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(15)
    )


# --------------------------------------------------------------------------
# Behavioral diversity (Gini impurity of event-type mix) per user.
# --------------------------------------------------------------------------
_DIVERSITY_ORACLE = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY user_id, event_type
),
per_user AS (
  SELECT user_id,
         (1000000 * (SUM(c) * SUM(c) - SUM(c * c))) // (SUM(c) * SUM(c)) AS gini_ppm
  FROM counts GROUP BY user_id
)
SELECT CAST(gini_ppm // 100000 AS BIGINT) AS gini_decile,
       COUNT(*) AS n_users,
       CAST(MIN(gini_ppm) AS BIGINT) AS min_gini_ppm,
       CAST(MAX(gini_ppm) AS BIGINT) AS max_gini_ppm
FROM per_user GROUP BY gini_decile ORDER BY gini_decile
"""


@query("q_events_user_diversity", oracle=_DIVERSITY_ORACLE, tags=("events", "stats"))
def q_events_user_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity: Gini impurity of each user's event-type
    mix, 1 - sum((c_i/n)^2), kept RATIONAL — (n^2 - sum(c_i^2)) / n^2
    in int64 ppm — so no float division and no libm (the entropy
    alternative needs log). Two hash aggregates, fully map-side
    combinable."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    per_user = counts.groupBy("user_id").agg(
        F.expr("(1000000 * (sum(c) * sum(c) - sum(c * c))) div (sum(c) * sum(c))").alias(
            "gini_ppm"
        )
    )
    return (
        per_user.groupBy(F.expr("gini_ppm div 100000").alias("gini_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("gini_ppm").cast("long").alias("min_gini_ppm"),
            F.max("gini_ppm").cast("long").alias("max_gini_ppm"),
        )
        .orderBy("gini_decile")
    )


# --------------------------------------------------------------------------
# Winsorized (clipped) feature scaling — robust feature engineering.
# --------------------------------------------------------------------------
_WINSOR_ORACLE = f"""
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(SUM(CASE WHEN e.value < q.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       CAST(SUM(CASE WHEN e.value > q.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
       {sql_dsum('greatest(q.lo, least(q.hi, e.value))')} AS winsorized_total
FROM events e JOIN q ON e.event_type = q.event_type
GROUP BY e.event_type ORDER BY e.event_type
"""


@query("q_feature_winsorize", oracle=_WINSOR_ORACLE, tags=("features", "stats"))
def q_feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip each feature at its exact per-group p05/p95
    before aggregation — the robust-scaling step a training pipeline
    runs before normalizing outlier-heavy features (sibling of
    ``q_events_mad_outliers``, which *detects* instead of *clipping*).
    Exact sort-based percentile is bit-identical across engines, and
    the clip expression is the same double arithmetic both sides.
    Two aggregation passes + one broadcast join back onto the scan —
    no global sort, no window."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = ev.join(F.broadcast(q), "event_type")
    return (
        clipped.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_high"),
            dsum(F.greatest("lo", F.least("hi", F.col("value")))).alias("winsorized_total"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# PageRank (3 unrolled iterations, integer ppm arithmetic) over the
# co-purchase graph — the iterative-algorithm family, oracle-replayable.
# --------------------------------------------------------------------------
def _pagerank_oracle() -> str:
    iters = "".join(
        f"""
c{k} AS (
  SELECT e.dst AS node, SUM(r{k - 1}.r // d.outdeg) AS s
  FROM e JOIN r{k - 1} ON r{k - 1}.node = e.src
         JOIN deg d ON d.node = e.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT d.node,
         CAST(150000 + (850000 * COALESCE(c{k}.s, 0)) // 1000000 AS BIGINT) AS r
  FROM deg d LEFT JOIN c{k} ON c{k}.node = d.node
),"""
        for k in (1, 2, 3)
    )
    return f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY src, dst HAVING COUNT(*) >= 2
),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),{iters}
final AS (SELECT * FROM r3)
SELECT node AS p_node, r AS rank_ppm
FROM final ORDER BY rank_ppm DESC, p_node LIMIT 10
"""


@query("q_graph_pagerank", oracle=_pagerank_oracle(), tags=("graph", "iterative"))
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank on the part co-purchase graph (same edge construction
    as ``q_graph_triangles``: >= 2 shared orders, undirected), three
    unrolled power iterations with damping 0.85.

    All arithmetic is INTEGER ppm (rank starts at 1_000_000 per node;
    each step is ``150000 + (850000 * sum(r div outdeg)) div 1e6``) —
    integer sums are order-independent, so the result is bit-identical
    across engines and partitionings, which is what lets an iterative
    algorithm have a full SQL-replay oracle (unrolled CTE chain) at
    all.

    Scale shape: the classic Pregel-as-joins loop — each iteration is
    one hash join ranks-x-edges on ``src`` plus one shuffle-agg on
    ``dst``; edges and ranks stay partitioned, nothing collects. At
    100 TB: checkpoint ranks every few iterations to cut lineage, and
    pre-partition edges by src so iterations reuse the exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct()
    a, b = lp.alias("a"), lp.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )
    e = e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).withColumnRenamed(
        "src", "node"
    )
    ranks = deg.select("node", F.lit(1000000).cast("long").alias("r"))
    for _ in range(3):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg.select(F.col("node").alias("src"), "outdeg"), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r div outdeg")).alias("s"))
        )
        ranks = (
            deg.select("node")
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.expr(
                    "CAST(150000 + (850000 * coalesce(s, 0)) div 1000000 AS BIGINT)"
                ).alias("r"),
            )
        )
    return (
        ranks.orderBy(F.desc("r"), "node")
        .limit(10)
        .select(F.col("node").alias("p_node"), F.col("r").alias("rank_ppm"))
    )


# --------------------------------------------------------------------------
# CUSUM changepoint scan: per-type cumulative deviation extremes.
# --------------------------------------------------------------------------
_CUSUM_ORACLE = """
WITH v AS (
  SELECT event_type, ts, user_id,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v_micro
  FROM events
),
st AS (
  SELECT event_type, COUNT(*) AS n, SUM(v_micro) // COUNT(*) AS mean_micro
  FROM v GROUP BY event_type
),
c AS (
  SELECT v.event_type,
         SUM(v.v_micro - st.mean_micro)
             OVER (PARTITION BY v.event_type ORDER BY v.ts, v.user_id
                   ROWS UNBOUNDED PRECEDING) AS cusum
  FROM v JOIN st USING (event_type)
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(MAX(cusum) AS BIGINT) AS max_cusum_micro,
       CAST(MIN(cusum) AS BIGINT) AS min_cusum_micro
FROM c GROUP BY event_type ORDER BY event_type
"""


@query("q_events_cusum_changepoint", oracle=_CUSUM_ORACLE, tags=("events", "anomaly", "timeseries"))
def q_events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan (Page 1954): per event type, the running
    sum of deviations from the type mean; its extreme excursions are
    the standard changepoint statistic — a mean shift mid-stream drives
    |CUSUM| to a peak at the change. All arithmetic in exact integer
    micro-units (row-local decimal cast, integer-division mean), so
    the excursion extremes replay bit-for-bit in DuckDB.

    Scale shape: the per-type ordered cumsum is the classic
    few-groups/many-rows skew trap (5 types x 10^9 rows = 5 straggler
    tasks under a plain partitioned window); it runs through
    operators/twophase.distributed_grouped_cumsum — range-partitioned
    on (type, ts, user_id), parallel partial cumsums, kilobyte
    broadcast offsets. Type stats (5 rows) broadcast onto the scan."""
    from ..operators.twophase import distributed_grouped_cumsum

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "user_id",
        (dec("value") * F.lit(1000000).cast("decimal(7,0)")).cast("long").alias("v_micro"),
    )
    st = ev.groupBy("event_type").agg(
        F.expr("sum(v_micro) div count(*)").alias("mean_micro")
    )
    dev = ev.join(F.broadcast(st), "event_type").withColumn(
        "dev", F.col("v_micro") - F.col("mean_micro")
    )
    cum = distributed_grouped_cumsum(
        dev, "event_type", ["ts", "user_id"], "dev", out="cusum"
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("cusum").cast("long").alias("max_cusum_micro"),
            F.min("cusum").cast("long").alias("min_cusum_micro"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Item-item collaborative similarity ("customers also bought") —
# normalized co-occurrence with per-item top-k.
# --------------------------------------------------------------------------
_RECSYS_MIN_COOC = 2
_RECSYS_TOPK = 3
_RECSYS_ORACLE = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
cnt AS (SELECT l_partkey, COUNT(*) AS n FROM lp GROUP BY l_partkey),
cooc AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS c
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY p1, p2 HAVING COUNT(*) >= {_RECSYS_MIN_COOC}
),
sym AS (
  SELECT p1 AS item, p2 AS neighbor, c FROM cooc
  UNION ALL
  SELECT p2 AS item, p1 AS neighbor, c FROM cooc
),
scored AS (
  SELECT s.item, s.neighbor, s.c,
         CAST((s.c * s.c * 1000000) // (ca.n * cb.n) AS BIGINT) AS cos2_ppm
  FROM sym s
  JOIN cnt ca ON ca.l_partkey = s.item
  JOIN cnt cb ON cb.l_partkey = s.neighbor
  WHERE s.item % 25 = 0
),
ranked AS (
  SELECT item, neighbor, c, cos2_ppm,
         ROW_NUMBER() OVER (PARTITION BY item
                            ORDER BY cos2_ppm DESC, neighbor) AS rank
  FROM scored
)
SELECT item, neighbor, CAST(c AS BIGINT) AS n_cooc, cos2_ppm, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_RECSYS_TOPK}
ORDER BY item, rank
"""


@query("q_recsys_item_cosine", oracle=_RECSYS_ORACLE, tags=("join", "cooccurrence", "recsys"))
def q_recsys_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering ('customers also bought'):
    co-occurrence counts normalized by each item's order count —
    cosine^2 in integer ppm, c^2 * 1e6 / (n_a * n_b), so no square
    root and no floats — then the top-3 neighbors per item. The
    squared cosine ranks identically to cosine (both sides
    non-negative), which is all a recommender needs.

    Scale shape: the pair space comes from a self-equi-join on the
    order key (bounded by order size, never table size — same property
    as q_market_basket); the min-cooc HAVING prunes the long tail
    before the count joins; per-item ranking plans as WindowGroupLimit
    heaps. The item %% 25 output filter pushes below the ranking
    window (partition-wise independence) so only sampled items rank."""
    lp = (
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    cnt = lp.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a, b = lp.alias("a"), lp.alias("b")
    cooc = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _RECSYS_MIN_COOC)
    )
    sym = cooc.select(
        F.col("p1").alias("item"), F.col("p2").alias("neighbor"), "c"
    ).unionByName(cooc.select(F.col("p2").alias("item"), F.col("p1").alias("neighbor"), "c"))
    ca = cnt.select(F.col("l_partkey").alias("item"), F.col("n").alias("na"))
    cb = cnt.select(F.col("l_partkey").alias("neighbor"), F.col("n").alias("nb"))
    scored = (
        sym.filter(F.col("item") % 25 == 0)
        .join(ca, "item")
        .join(cb, "neighbor")
        .select(
            "item",
            "neighbor",
            "c",
            F.expr("c * c * 1000000 div (na * nb)").alias("cos2_ppm"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("cos2_ppm"), F.col("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _RECSYS_TOPK)
        .select(
            "item",
            "neighbor",
            F.col("c").cast("long").alias("n_cooc"),
            "cos2_ppm",
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("item", "rank")
    )


# --------------------------------------------------------------------------
# Linear (equal-credit) multi-touch attribution with a 7-day lookback.
# --------------------------------------------------------------------------
_ATTR_LIN_ORACLE = """
WITH p AS (
  SELECT user_id, ts AS pts, event_id AS pid FROM events WHERE event_type = 'purchase'
),
c AS (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'),
j AS (
  SELECT p.pid, COUNT(c.cts) AS n_touch
  FROM p LEFT JOIN c
    ON c.user_id = p.user_id AND c.cts <= p.pts
   AND c.cts >= p.pts - INTERVAL 7 DAY
  GROUP BY p.pid
)
SELECT CAST(n_touch AS BIGINT) AS n_touch,
       COUNT(*) AS n_purchases,
       CAST(SUM(CASE WHEN n_touch > 0
                THEN (1000000 // n_touch) * n_touch ELSE 0 END) AS BIGINT) AS distributed_ppm
FROM j GROUP BY n_touch ORDER BY n_touch
"""


@query("q_attribution_linear", oracle=_ATTR_LIN_ORACLE, tags=("events", "attribution"))
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in the 7 days before
    a purchase gets equal credit (1e6 div n_touch ppm each) — the
    complement of last-touch, with the conservation audit built in:
    ``distributed_ppm`` shows exactly how much of each purchase's
    1e6 ppm the integer split distributes (the remainder is the
    documented floor-division loss).

    Scale shape (r6 rewrite): a bare user_id equi-join with the range
    as a post-filter enumerates ALL purchase x click pairs per user
    before filtering — quadratic in per-user event count (fine at one
    decade, measured 13.1x at the 100x point's 10x step, where the
    fixed user dim concentrates 100x events per user). The join key
    now carries a 7-DAY TIME BUCKET (the operators/intervaljoin.py
    technique): clicks key on their own bucket, each purchase probes
    its bucket and the previous one (a 7-day lookback spans at most
    two 7-day buckets — exact: floor((t - W)/W) = floor(t/W) - 1; note
    Spark's ``div`` truncates toward zero, so this identity — and the
    click capture with it — assumes NON-NEGATIVE unix_micros, i.e. no
    pre-1970 event timestamps, which the events schema guarantees), so
    per-key pairs are bounded by one user's WEEKLY click rate at any
    corpus size. Left-join correctness under probe replication: every
    matching click matches in exactly one probe (its own bucket), and
    count(cts) ignores the unmatched replica's NULL, so n_touch = 0
    purchases survive. Re-measured: 13.1x -> linear (SCALE.md)."""
    _W_US = 7 * 86400 * 1_000_000  # 7 days in microseconds
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid"))
        .withColumn("pb", F.expr(f"unix_micros(pts) div {_W_US}"))
        .withColumn("b", F.explode(F.array(F.col("pb") - 1, F.col("pb"))))
        .drop("pb")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cuser"),
        F.col("ts").alias("cts"),
        F.expr(f"unix_micros(ts) div {_W_US}").alias("cb"),
    )
    j = (
        p.join(
            c,
            (F.col("cuser") == F.col("user_id"))
            & (F.col("cb") == F.col("b"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS")),
            "left",
        )
        .groupBy("pid")
        .agg(F.count("cts").alias("n_touch"))
    )
    return (
        j.groupBy("n_touch")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(
                F.when(
                    F.col("n_touch") > 0,
                    F.expr("(1000000 div n_touch) * n_touch"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("distributed_ppm"),
        )
        .select(F.col("n_touch").cast("long").alias("n_touch"), "n_purchases", "distributed_ppm")
        .orderBy("n_touch")
    )


# --------------------------------------------------------------------------
# Strict ordered 3-step funnel: signup -> first click AFTER signup ->
# first purchase AFTER that click.
# --------------------------------------------------------------------------
_FUNNEL3_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
),
tot AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events)
SELECT CAST(t.n_users AS BIGINT) AS n_users,
       CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_step1,
       CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_step2,
       CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_step3,
       CAST(((SELECT COUNT(*) FROM s2) * 1000000) // (SELECT COUNT(*) FROM s1) AS BIGINT) AS conv12_ppm,
       CAST(((SELECT COUNT(*) FROM s3) * 1000000) // (SELECT COUNT(*) FROM s2) AS BIGINT) AS conv23_ppm
FROM tot t
"""


@query("q_events_funnel_steps", oracle=_FUNNEL3_ORACLE, tags=("events", "funnel"))
def q_events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ORDERED 3-step funnel (signup -> first click after it ->
    first purchase after that): each step's timestamp must follow the
    previous step's, so a user who clicked before signing up does not
    count — the semantics product funnels actually need, vs the
    any-order pair funnel of q_events_funnel_latency.

    Scale shape: each step is one filtered aggregate joined back on
    user_id (broadcastable step tables); step-to-step conversion is a
    scalar division of two one-row counts."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    tot = ev.agg(F.countDistinct("user_id").alias("n_users"))
    n1 = s1.agg(F.count(F.lit(1)).alias("n_step1"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n_step2"))
    n3 = s3.agg(F.count(F.lit(1)).alias("n_step3"))
    return (
        tot.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
        .select(
            F.col("n_users").cast("long"),
            F.col("n_step1").cast("long"),
            F.col("n_step2").cast("long"),
            F.col("n_step3").cast("long"),
            F.expr("n_step2 * 1000000 div n_step1").alias("conv12_ppm"),
            F.expr("n_step3 * 1000000 div n_step2").alias("conv23_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Feature engineering: per-event trailing activity counts (1h / 24h
# RANGE windows) — the feature-store backfill shape.
# --------------------------------------------------------------------------
_LAGFEAT_ORACLE = """
WITH f AS (
  SELECT event_type,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                        RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING) AS cnt_1h,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                        RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING) AS cnt_24h
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(cnt_1h) AS BIGINT) AS sum_cnt_1h,
       CAST(SUM(cnt_24h) AS BIGINT) AS sum_cnt_24h,
       CAST(MAX(cnt_24h) AS BIGINT) AS max_cnt_24h
FROM f GROUP BY event_type ORDER BY event_type
"""


@query("q_feature_lag_windows", oracle=_LAGFEAT_ORACLE, tags=("features", "events", "window"))
def q_feature_lag_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-activity features per event (how many events did this
    user emit in the prior hour / prior day) via time-RANGE window
    frames — the exact backfill a feature store runs to train
    realtime-parity models. The frame excludes the current row
    (1 PRECEDING on the microsecond axis) so the feature is strictly
    causal — no label leakage.

    Scale shape: ONE shuffle on user_id serves both frames (same
    window spec modulo frame bounds); RANGE frames evaluate with a
    sliding two-pointer over each partition — linear, constant memory,
    no self-join. Integer microsecond axis on both engines."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    base = Window.partitionBy("user_id").orderBy("us")
    w1h = base.rangeBetween(-3_600_000_000, -1)
    w24 = base.rangeBetween(-86_400_000_000, -1)
    f = ev.select(
        "event_type",
        F.count(F.lit(1)).over(w1h).alias("cnt_1h"),
        F.count(F.lit(1)).over(w24).alias("cnt_24h"),
    )
    return (
        f.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cnt_1h").cast("long").alias("sum_cnt_1h"),
            F.sum("cnt_24h").cast("long").alias("sum_cnt_24h"),
            F.max("cnt_24h").cast("long").alias("max_cnt_24h"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Churn-label generation: inactive in the trailing 14 days of the
# observation window.
# --------------------------------------------------------------------------
_CHURN_ORACLE = """
WITH horizon AS (SELECT MAX(ts) AS tmax FROM events),
u AS (
  SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS n_events
  FROM events GROUP BY user_id
),
labeled AS (
  SELECT u.user_id, u.n_events,
         CASE WHEN u.last_ts < h.tmax - INTERVAL 14 DAY THEN 1 ELSE 0 END AS churned
  FROM u CROSS JOIN horizon h
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(churned) AS BIGINT) AS n_churned,
       CAST((SUM(churned) * 1000000) // COUNT(*) AS BIGINT) AS churn_ppm,
       CAST(SUM(CASE WHEN churned = 1 THEN n_events ELSE 0 END) AS BIGINT) AS churned_events
FROM labeled
"""


@query("q_label_churn", oracle=_CHURN_ORACLE, tags=("features", "labels", "events"))
def q_label_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-label generation: a user is labeled churned when silent
    for the trailing 14 days of the observation window — the label
    table every retention model trains on, derived reproducibly from
    the data itself (horizon = max event time, one-row broadcast).

    Scale shape: one per-user aggregate, one scalar broadcast, one
    final rollup — no window, no skew (user_id is the natural key)."""
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg(F.max("ts").alias("tmax"))
    u = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n_events")
    )
    labeled = u.crossJoin(F.broadcast(horizon)).select(
        "n_events",
        F.when(F.col("last_ts") < F.col("tmax") - F.expr("INTERVAL 14 DAYS"), 1)
        .otherwise(0)
        .alias("churned"),
    )
    return labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("churned").cast("long").alias("n_churned"),
        F.expr("sum(churned) * 1000000 div count(*)").cast("long").alias("churn_ppm"),
        F.sum(F.when(F.col("churned") == 1, F.col("n_events")).otherwise(0))
        .cast("long")
        .alias("churned_events"),
    )


# --------------------------------------------------------------------------
# Monthly seasonal index: each month's revenue share vs a uniform month.
# --------------------------------------------------------------------------
_SEASONAL_IDX_ORACLE = f"""
WITH m AS (
  SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
         {sql_dsum_micro('o_totalprice')} AS rev_micro
  FROM orders GROUP BY month(o_orderdate)
),
tot AS (SELECT SUM(rev_micro) AS total FROM m)
SELECT m.month, m.rev_micro,
       CAST((m.rev_micro * 12) // (t.total // 1000000) AS BIGINT) AS seasonal_index_ppm
FROM m CROSS JOIN tot t
ORDER BY m.month
"""


@query("q_orders_seasonal_index", oracle=_SEASONAL_IDX_ORACLE, tags=("window", "timeseries"))
def q_orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly seasonal index: month revenue x 12 / total revenue in
    ppm — 1e6 means an average month, the multiplicative factor
    demand-planning models divide out before forecasting. Exact
    integer micro-units end to end; the total is divided down to
    whole units BEFORE the ratio so rev_micro * 12 stays inside
    int64 up to ~sf100 (a direct * 1e6 overflows at sf0.001).

    Scale shape: one 12-row aggregate and a one-row total broadcast."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.month("o_orderdate").cast("long").alias("month")).agg(
        dsum_micro("o_totalprice").alias("rev_micro")
    )
    tot = m.agg(F.sum("rev_micro").alias("total"))
    return (
        m.crossJoin(F.broadcast(tot))
        .select(
            "month",
            "rev_micro",
            F.expr("rev_micro * 12 div (total div 1000000)").cast("long").alias("seasonal_index_ppm"),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# Deterministic bootstrap confidence intervals — hash-resampled
# Poisson(1) weights, no RNG state.
# --------------------------------------------------------------------------
_BOOT_B = 32  # resamples
_BOOT_DOMAIN = 268435456  # 2^28 md5 hash space
# Poisson(1) pmf thresholds on the 28-bit hash: P(0)=P(1)=0.3679 ->
# w=2 for the remaining 26.4% tail (2 approximates >=2; documented).
_BOOT_T0 = int(0.36788 * _BOOT_DOMAIN)
_BOOT_T1 = int(0.73576 * _BOOT_DOMAIN)


def _boot_w_sql(b: int) -> str:
    h = f"CAST(concat('0x', substring(md5(CAST(o_orderkey AS VARCHAR) || '|{b}'),1,7)) AS BIGINT)"
    return f"CASE WHEN {h} < {_BOOT_T0} THEN 0 WHEN {h} < {_BOOT_T1} THEN 1 ELSE 2 END"


_BOOT_ORACLE = f"""
WITH r AS (
  SELECT o_orderstatus,
         {", ".join(
             f"CAST(SUM({_boot_w_sql(b)} * CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(25,2)) AS s{b}, "
             f"SUM({_boot_w_sql(b)}) AS n{b}"
             for b in range(_BOOT_B)
         )}
  FROM orders GROUP BY o_orderstatus
),
m AS (
  SELECT o_orderstatus,
         [{", ".join(f"CAST(CAST(s{b} AS DECIMAL(25,2)) * 100 AS BIGINT) // n{b}" for b in range(_BOOT_B))}] AS means
  FROM r
)
SELECT o_orderstatus,
       CAST(list_min(means) AS BIGINT) AS ci_low_centi,
       CAST(list_max(means) AS BIGINT) AS ci_high_centi,
       CAST(list_reduce(means, (a, b) -> a + b) // {_BOOT_B} AS BIGINT) AS boot_mean_centi
FROM m ORDER BY o_orderstatus
"""


@query("q_stats_bootstrap_ci", oracle=_BOOT_ORACLE, tags=("stats", "sampling"))
def q_stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for mean order value per status —
    with NO random state: resample b's weight for a row is a
    Poisson(1)-approximating function of md5(key|b) (0/1/2 by pmf
    thresholds; 2 stands in for >=2, a documented truncation), so all
    32 resamples are computed in ONE scan as 64 aggregate columns and
    the whole CI replays bit-for-bit on any engine, any partitioning,
    any rerun — the reproducibility property RNG-based bootstrap
    cannot give. Means are exact integer centi-units.

    Scale shape: one pass, 64 partially-aggregated counters per group
    — no explode, no 32x data blowup; the min/max/mean over the 32
    resample means is row-local array math on a 32-element array."""
    o = load_table(spark, sf_dir, "orders")

    def w(b: int):
        h = F.conv(
            F.substring(F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(f"|{b}"))), 1, 7),
            16,
            10,
        ).cast("long")
        return (
            F.when(h < _BOOT_T0, 0).when(h < _BOOT_T1, 1).otherwise(2)
        )

    aggs = []
    for b in range(_BOOT_B):
        aggs.append(
            F.sum(w(b) * F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(25,2)")
            .alias(f"s{b}")
        )
        aggs.append(F.sum(w(b)).alias(f"n{b}"))
    r = o.groupBy("o_orderstatus").agg(*aggs)
    means = F.array(
        *[F.expr(f"cast(cast(s{b} as decimal(25,2)) * 100 as bigint) div n{b}") for b in range(_BOOT_B)]
    )
    return (
        r.select("o_orderstatus", means.alias("means"))
        .select(
            "o_orderstatus",
            F.array_min("means").cast("long").alias("ci_low_centi"),
            F.array_max("means").cast("long").alias("ci_high_centi"),
            (
                F.aggregate("means", F.lit(0).cast("long"), lambda a, x: a + x)
                / F.lit(_BOOT_B)
            )
            .cast("long")
            .alias("boot_mean_centi"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Order interarrival times per customer, rolled up by market segment.
# --------------------------------------------------------------------------
_INTERARRIVAL_ORACLE = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
),
g AS (SELECT * FROM gaps WHERE gap_days IS NOT NULL)
SELECT c.c_mktsegment,
       COUNT(*) AS n_gaps,
       CAST(SUM(g.gap_days) AS BIGINT) AS total_gap_days,
       CAST((SUM(g.gap_days) * 1000000) // COUNT(*) AS BIGINT) AS avg_gap_days_ppm,
       CAST(MAX(g.gap_days) AS BIGINT) AS max_gap_days
FROM g JOIN customer c ON c.c_custkey = g.o_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
"""


@query("q_orders_interarrival", oracle=_INTERARRIVAL_ORACLE, tags=("events", "window", "timeseries"))
def q_orders_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order interarrival times (days between consecutive
    orders, lag over (o_orderdate, o_orderkey) — tie-free), rolled up
    per market segment: the purchase-cadence statistic behind
    replenishment and churn-risk models.

    Scale shape: one shuffle on o_custkey for the lag window; the
    customer dimension joins broadcast; integer day arithmetic."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.join(F.broadcast(c.select("c_custkey", "c_mktsegment")), gaps.o_custkey == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_days").cast("long").alias("total_gap_days"),
            F.expr("sum(gap_days) * 1000000 div count(*)").cast("long").alias("avg_gap_days_ppm"),
            F.max("gap_days").cast("long").alias("max_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) — verbatim
# dialect-portable SQL on both engines.
# --------------------------------------------------------------------------
_BAG_SQL = """
WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'F'),
b AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'O'),
i AS (SELECT p FROM a INTERSECT ALL SELECT p FROM b),
x AS (SELECT p FROM a EXCEPT ALL SELECT p FROM b),
d AS (SELECT p FROM a INTERSECT SELECT p FROM b)
SELECT 'intersect_all' AS op, COUNT(*) AS n FROM i
UNION ALL SELECT 'except_all', COUNT(*) FROM x
UNION ALL SELECT 'intersect_distinct', COUNT(*) FROM d
ORDER BY op
"""


@query("q_set_ops_bag", oracle=_BAG_SQL, tags=("relational", "setops", "sql"))
def q_set_ops_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set operations: INTERSECT ALL keeps
    min(count_A(x), count_B(x)) copies and EXCEPT ALL keeps
    max(0, count_A - count_B) — multiplicity rules the DISTINCT
    variants (q_set_ops) erase, and a classic cross-engine divergence
    point. One dialect-portable string runs verbatim on both engines;
    the distinct-intersect row sits alongside for contrast.

    Scale shape: Spark plans INTERSECT/EXCEPT ALL as count-aggregated
    joins on the value — two hash shuffles on a low-cardinality key,
    no row-by-row bag bookkeeping."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_BAG_SQL)


# --------------------------------------------------------------------------
# LATERAL correlated subquery — per-group top-k in pure SQL.
# --------------------------------------------------------------------------
_LATERAL_SQL = """
SELECT s.seg, t.c_custkey, t.bal_milli
FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer) s,
LATERAL (
  SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,3)) * 1000 AS BIGINT) AS bal_milli
  FROM customer
  WHERE c_mktsegment = s.seg
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) t
ORDER BY s.seg, t.bal_milli DESC, t.c_custkey
"""


@query("q_sql_lateral_topk", oracle=_LATERAL_SQL, tags=("relational", "sql", "window"))
def q_sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — top-2 customers per segment
    expressed as a per-row dependent subquery instead of a window
    function: the SQL surface ELT tools generate. The same string runs
    verbatim on Spark (which decorrelates it into a ranked join under
    the hood) and on DuckDB. Balances in exact integer milli-units.

    Scale shape: Catalyst rewrites the correlated LIMIT into a
    window-rank over a single shuffle on the correlation key — no
    per-group re-scan, despite the per-group phrasing."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_SQL)


# --------------------------------------------------------------------------
# Co-purchase graph degree distribution.
# --------------------------------------------------------------------------
_DEGREE_ORACLE = """
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT u AS node, COUNT(*) AS degree FROM (
    SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
  ) GROUP BY u
)
SELECT CAST(degree AS BIGINT) AS degree, COUNT(*) AS n_nodes
FROM deg GROUP BY degree ORDER BY degree
"""


@query("q_graph_degree_dist", oracle=_DEGREE_ORACLE, tags=("graph", "cooccurrence"))
def q_graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part co-purchase graph — the first
    statistic of any graph workload (skew in this histogram is what
    makes or breaks every downstream traversal's partitioning).

    Scale shape: edges come from the order-bounded self-equi-join
    (never all-pairs); degrees are one count per node; the histogram
    is a count per degree — three narrow shuffles."""
    lp = (
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a, b = lp.alias("a"), lp.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    deg = (
        edges.select("u")
        .unionByName(edges.select(F.col("v").alias("u")))
        .groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(F.col("degree").cast("long"), "n_nodes")
        .orderBy("degree")
    )


# --------------------------------------------------------------------------
# Recursive CTE path enumeration over the event-type transition graph
# (Spark 4's WITH RECURSIVE — the same string runs verbatim on DuckDB).
# --------------------------------------------------------------------------
# Engine-portable SQL: FLOOR(a / b) instead of integer div (Spark spells
# it `div`, DuckDB `//`); all operands are non-negative ints within
# 2^53, so the double division + FLOOR is exact on both engines.
# The divisor is spelled 1e6 deliberately: Spark parses an exponent
# FORM literal as DOUBLE, but would parse `1000000.0` as DECIMAL(8,1)
# and run decimal division with HALF_UP rounding — close enough to
# agree with DuckDB today, but not the identical IEEE op this comment
# promises. Keep the exponent form (or CAST(... AS DOUBLE)) if editing.
_RECURSIVE_PATHS_SQL = """
WITH RECURSIVE
steps AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type AS src, event_type AS dst, COUNT(*) AS cnt
  FROM steps WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type
),
tot AS (SELECT src, SUM(cnt) AS tot FROM trans GROUP BY src),
probs AS (
  SELECT t.src, t.dst, CAST(FLOOR(t.cnt * 1e6 / o.tot) AS BIGINT) AS p_ppm
  FROM trans t JOIN tot o ON o.src = t.src
),
paths(path, last_type, p_ppm, depth) AS (
  SELECT src, src, CAST(1000000 AS BIGINT), 1 FROM (SELECT DISTINCT src FROM probs) s
  UNION ALL
  SELECT p.path || '>' || pr.dst, pr.dst,
         CAST(FLOOR(p.p_ppm * pr.p_ppm / 1e6) AS BIGINT), p.depth + 1
  FROM paths p JOIN probs pr ON pr.src = p.last_type
  WHERE p.depth < 3
)
SELECT path, p_ppm FROM paths WHERE depth = 3
ORDER BY p_ppm DESC, path LIMIT 15
"""


@query("q_sql_recursive_paths", oracle=_RECURSIVE_PATHS_SQL, tags=("sql", "graph", "events"))
def q_sql_recursive_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step most-probable paths through the event-type Markov graph,
    enumerated with a RECURSIVE CTE (Spark 4 `WITH RECURSIVE`) — the
    multi-hop extension of q_events_markov_chain's one-step matrix, and
    the portable-SQL surface for graph expansion that BI/ELT layers
    emit. Path probability is an integer-ppm product folded stepwise
    (floor(p1*p2/1e6)), so the recursion is bit-replayable; the SAME
    string is the DuckDB oracle (engine-portable arithmetic only:
    FLOOR(a/b) on 2^53-bounded ints instead of div/`//`).

    Scale shape: the recursion's working set is the TYPE graph
    (|types| + |types|^2 rows), never the event stream — events fold
    into the transition matrix with one LAG window partitioned by user
    and one groupBy before recursion starts; each recursive step is a
    broadcast-size join. Growth is |types|^depth with a hard depth
    guard in the recursive predicate."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_RECURSIVE_PATHS_SQL)


# --------------------------------------------------------------------------
# Cohorted lifetime value: acquisition-year cohorts x order-age revenue.
# --------------------------------------------------------------------------
_COHORT_LTV_ORACLE = f"""
WITH first_order AS (
  SELECT o_custkey, MIN(EXTRACT(year FROM o_orderdate)) AS cohort_year
  FROM orders GROUP BY o_custkey
),
aged AS (
  SELECT f.cohort_year,
         EXTRACT(year FROM o.o_orderdate) - f.cohort_year AS order_age,
         o.o_custkey, o.o_totalprice
  FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
)
SELECT CAST(cohort_year AS BIGINT) AS cohort_year,
       CAST(order_age AS BIGINT) AS order_age,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS revenue
FROM aged GROUP BY cohort_year, order_age ORDER BY cohort_year, order_age
"""


@query("q_orders_cohort_ltv", oracle=_COHORT_LTV_ORACLE, tags=("relational", "cohort"))
def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohorted lifetime value: customers grouped by acquisition year
    (their first order), revenue and distinct actives tracked by order
    age in years — the triangle a growth team reads retention economics
    from, and the orders-side sibling of q_events_cohort_retention.
    Revenue goes through the fixed-point decimal sum so the float
    aggregate replays bit-for-bit.

    Scale shape: the first-order table is a map-side-combinable MIN per
    customer; the age join shuffles orders once on o_custkey (or rides
    an existing customer bucketing); the final rollup is a
    (cohort, age) hash aggregate — two narrow shuffles total."""
    orders = load_table(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("cohort_year")
    )
    aged = orders.join(first, "o_custkey").select(
        F.col("cohort_year").cast("long"),
        (F.year("o_orderdate") - F.col("cohort_year")).cast("long").alias("order_age"),
        "o_custkey",
        "o_totalprice",
    )
    return (
        aged.groupBy("cohort_year", "order_age")
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("cohort_year", "order_age")
    )
