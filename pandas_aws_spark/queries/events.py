"""Event-stream analytics on the ``events`` table (batch side).

The reference has no streaming/time-series surface (SURVEY.md §2.8) —
these queries are the north-star extension, expressed with Spark's
time-window primitives (``F.window``, ``F.session_window``) so the
identical code shape lifts onto ``readStream`` (see
``pandas_aws_spark.streaming`` for the streaming variants).

Oracle equivalence notes: Spark truncates parquet ns-timestamps to
microseconds; DuckDB's TIMESTAMP is also microseconds, so
``epoch_us``-based window arithmetic in the oracle matches Spark's
window alignment exactly (both aligned to the Unix epoch, UTC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import dsum, sql_dsum
from ..registry import load_table, query

# --------------------------------------------------------------------------
# Tumbling window — hourly counts/sums per event type.
# --------------------------------------------------------------------------
_TUMBLING_ORACLE = f"""
SELECT date_trunc('hour', ts) AS win_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q_events_tumbling_hourly", oracle=_TUMBLING_ORACLE, headline=True, tags=("events", "window"))
def q_events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window via ``F.window`` — epoch-aligned, so it
    equals date_trunc('hour') in the oracle. Streaming-ready shape."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events", "total_value")
        .orderBy("win_start", "event_type")
    )


# --------------------------------------------------------------------------
# Sliding window — 1-hour window sliding every 30 minutes.
# Each event belongs to exactly 2 windows; the oracle materializes both
# candidate starts with UNNEST and keeps those covering the event.
# --------------------------------------------------------------------------
_SLIDING_ORACLE = f"""
WITH cand AS (
  SELECT e.*, make_timestamp(s.start_us) AS win_start
  FROM events e,
       UNNEST([ (epoch_us(e.ts) // 1800000000) * 1800000000,
                ((epoch_us(e.ts) // 1800000000) - 1) * 1800000000 ]) AS s(start_us)
)
SELECT win_start, COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
FROM cand
WHERE epoch_us(ts) >= epoch_us(win_start)
  AND epoch_us(ts) <  epoch_us(win_start) + 3600000000
GROUP BY win_start
ORDER BY win_start
"""


@query("q_events_sliding_window", oracle=_SLIDING_ORACLE, tags=("events", "window"))
def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30m slide) via ``F.window`` — Spark
    expands each event into its covering windows natively."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(F.col("win.start").alias("win_start"), "n_events", "total_value")
        .orderBy("win_start")
    )


# --------------------------------------------------------------------------
# Sessionization — 30-minute inactivity gap per user.
# Spark: native session_window. Oracle: gaps-and-islands (lag + cumsum).
# Spark merges an event into the open session iff ts < prev_end
# (= prev_ts + gap), so a NEW session starts when the gap is >= 30 min.
# --------------------------------------------------------------------------
_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start,
       COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
FROM numbered
GROUP BY user_id, sess_id
ORDER BY user_id, session_start
"""


@query("q_events_sessionize", oracle=_SESSION_ORACLE, headline=True, tags=("events", "session"))
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``F.session_window`` (works in batch, lifts to streaming
    with a watermark). Session start = min event ts in the session."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sess"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


# --------------------------------------------------------------------------
# Semi-structured JSON extraction from the props column.
# --------------------------------------------------------------------------
_JSON_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q_events_json_extract", oracle=_JSON_ORACLE, tags=("events", "json"))
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction stays JVM-side (``get_json_object``);
    integer sum needs no decimal stabilization."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# User funnel — first signup -> first purchase latency (self-join via agg).
# --------------------------------------------------------------------------
_FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup'   THEN ts END) AS first_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events
  GROUP BY user_id
)
SELECT user_id, first_signup, first_purchase,
       epoch_us(first_purchase) - epoch_us(first_signup) AS latency_us
FROM firsts
WHERE first_signup IS NOT NULL AND first_purchase IS NOT NULL
  AND first_purchase >= first_signup
ORDER BY user_id
"""


@query("q_events_funnel_latency", oracle=_FUNNEL_ORACLE, tags=("events",))
def q_events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregation funnel — one pass, no self-join shuffle."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return (
        firsts.filter(
            F.col("first_signup").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_signup"))
        )
        .select(
            "user_id",
            "first_signup",
            "first_purchase",
            (
                F.unix_micros(F.col("first_purchase")) - F.unix_micros(F.col("first_signup"))
            ).alias("latency_us"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Windowed heavy hitters: top-3 users per hour by event volume —
# windowed agg composed with a ranking window function.
# --------------------------------------------------------------------------
_HH_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS win_start, user_id, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY win_start
                               ORDER BY n_events DESC, user_id) AS rnk
  FROM hourly
)
SELECT win_start, user_id, n_events, rnk
FROM ranked WHERE rnk <= 3
ORDER BY win_start, rnk
"""


@query("q_events_heavy_hitters", oracle=_HH_ORACLE, tags=("events", "window", "topk"))
def q_events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users per hourly window: time-window agg feeding a ranking
    window. Spark's WindowGroupLimit pushes rnk<=3 into per-partition
    heaps, so the rank shuffle carries at most 3 rows per (partition,
    window) — at stream scale, pair with the CMS sketch for a
    pre-filter."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    hourly = ev.groupBy(
        F.window("ts", "1 hour").alias("win"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    w = W.partitionBy("win").orderBy(F.desc("n_events"), "user_id")
    return (
        hourly.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(F.col("win.start").alias("win_start"), "user_id", "n_events", "rnk")
        .orderBy("win_start", "rnk")
    )


# --------------------------------------------------------------------------
# Anomaly detection: IQR outliers per event type (exact quantiles are
# bit-stable cross-engine, unlike mean/std whose FP order drifts).
# --------------------------------------------------------------------------
_OUTLIER_ORACLE = """
WITH bounds AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS p25,
         quantile_cont(value, 0.75) AS p75
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN e.value < b.p25 - 1.5 * (b.p75 - b.p25)
                  OR e.value > b.p75 + 1.5 * (b.p75 - b.p25)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN bounds b ON b.event_type = e.event_type
GROUP BY e.event_type
ORDER BY e.event_type
"""


@query("q_events_iqr_outliers", oracle=_OUTLIER_ORACLE, tags=("events", "anomaly"))
def q_events_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per event type: per-group exact
    quartiles (broadcast back as a tiny bounds table) + one conditional
    aggregation pass — the monitoring query a streaming deployment runs
    per window."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("p25"),
        F.expr("percentile(value, 0.75)").alias("p75"),
    )
    iqr = F.col("p75") - F.col("p25")
    out = (F.col("value") < F.col("p25") - 1.5 * iqr) | (
        F.col("value") > F.col("p75") + 1.5 * iqr
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(out, 1).otherwise(0)).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Cohort retention: users grouped by first-seen week; how many are
# still active k weeks later.
# --------------------------------------------------------------------------
_RETENTION_ORACLE = """
WITH weeks AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // CAST(604800000000 AS BIGINT) AS BIGINT) AS week
  FROM events
),
cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id
)
SELECT c.cohort_week,
       w.week - c.cohort_week AS weeks_since,
       COUNT(DISTINCT w.user_id) AS n_active
FROM weeks w JOIN cohort c ON c.user_id = w.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q_events_cohort_retention", oracle=_RETENTION_ORACLE, tags=("events", "retention"))
def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: (user, week) dedup -> first
    week per user (broadcastable cohort table) -> distinct-active
    counts per (cohort, offset). Two shuffles end-to-end: the
    (user, week) distinct and the final count-distinct."""
    ev = load_table(spark, sf_dir, "events")
    week = F.expr("unix_micros(ts) div 604800000000")  # integer div: no FP boundary
    weeks = ev.select("user_id", week.alias("week")).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(F.broadcast(cohort), "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("weeks_since"))
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "weeks_since")
    )


# --------------------------------------------------------------------------
# As-of (point-in-time) join — purchase -> most recent prior click.
# --------------------------------------------------------------------------
_ASOF_ORACLE = """
WITH c AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id,
       COUNT(*) AS n_purchases,
       COUNT(c.click_id) AS n_attributed,
       CAST(COALESCE(SUM(date_diff('microseconds', c.ts, p.ts)), 0) AS BIGINT) AS total_lag_us
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
GROUP BY p.user_id
ORDER BY p.user_id
"""


@query("q_events_asof_join", oracle=_ASOF_ORACLE, tags=("asof", "timeseries"))
def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): every purchase picks up the
    latest click at-or-before it per user via the union-and-sweep
    rewrite — ONE shuffle of clicks+purchases on user_id, linear sweep
    within partitions, vs. the quadratic inequality-join a naive plan
    would run. DuckDB's native ASOF JOIN is the oracle. Lags stay in
    exact integer microseconds."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(purchases, clicks, ["user_id"], right_cols=["click_id"])
    lag_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_ts"))
    return (
        joined.groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.count("asof_click_id").alias("n_attributed"),
            F.coalesce(F.sum(lag_us), F.lit(0)).alias("total_lag_us"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Time-RANGE window frame — trailing 7-day spend per user at each event.
# --------------------------------------------------------------------------
_ROLLING_ORACLE = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS spend_7d,
       FIRST_VALUE(event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
       ) AS first_type
FROM events
WHERE event_type = 'purchase'
QUALIFY event_id % 10 = 0
ORDER BY user_id, ts, event_id
"""


@query("q_events_rolling_7d", oracle=_ROLLING_ORACLE, tags=("window", "range-frame"))
def q_events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-interval window frame (trailing 7 days by event time, not
    row count) + first_value — the time-based frame family the
    rows-frame queries don't cover. Decimal accumulator keeps every
    trailing sum bit-stable. Expressed in SQL: interval RANGE frames
    have no DataFrame-API form in PySpark."""
    ev = load_table(spark, sf_dir, "events")
    ev.filter(F.col("event_type") == "purchase").createOrReplaceTempView("purchases_v")
    return spark.sql(
        """
        SELECT * FROM (
          SELECT event_id, user_id, ts,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
                 ) AS DOUBLE) AS spend_7d,
                 FIRST_VALUE(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS first_type
          FROM purchases_v
        ) WHERE event_id % 10 = 0
        ORDER BY user_id, ts, event_id
        """
    )


# --------------------------------------------------------------------------
# Unpivot (melt) — wide per-flag metrics back to long (metric, value).
# --------------------------------------------------------------------------
_UNPIVOT_ORACLE = f"""
WITH wide AS (
  SELECT l_returnflag,
         {sql_dsum('l_quantity')} AS sum_qty,
         {sql_dsum('l_extendedprice')} AS sum_price
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS metric_value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price' AS metric, sum_price AS metric_value FROM wide
ORDER BY l_returnflag, metric
"""


@query("q_unpivot_metrics", oracle=_UNPIVOT_ORACLE, tags=("unpivot",))
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the inverse of q_pivot_status): wide aggregate ->
    long (metric, value) rows via ``DataFrame.unpivot`` — one Expand
    node, no self-union double scan (the oracle's UNION ALL form reads
    the CTE twice; Spark's unpivot replicates rows in-place)."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
    )
    return (
        wide.unpivot(
            ["l_returnflag"], ["sum_qty", "sum_price"], "metric", "metric_value"
        )
        .orderBy("l_returnflag", "metric")
    )


# --------------------------------------------------------------------------
# Rolling-median spike detection (robust smoothing over a 5-row frame).
# --------------------------------------------------------------------------
_ROLLMED_ORACLE = """
WITH v AS (
  SELECT user_id, event_type, ts,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v_micro
  FROM events
),
w AS (
  SELECT user_id, event_type, v_micro,
         list_sort(list(v_micro) OVER (PARTITION BY user_id ORDER BY ts, event_type
                                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS win
  FROM v
),
m AS (
  SELECT user_id, event_type, v_micro,
         win[(len(win) + 1) // 2] AS med_micro
  FROM w
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN med_micro > 0 AND v_micro > 2 * med_micro
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_spikes,
       CAST(SUM(CASE WHEN med_micro > 0 AND v_micro > 2 * med_micro
                     THEN v_micro ELSE 0 END) AS BIGINT) AS spike_mass_micro
FROM m GROUP BY event_type ORDER BY event_type
"""


@query("q_events_rolling_median", oracle=_ROLLMED_ORACLE, tags=("events", "window", "anomaly"))
def q_events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust spike detection: flag an event whose value exceeds 2x the
    rolling MEDIAN of the user's trailing 5 events — the median (unlike
    the rolling mean) is not dragged up by the spike itself, the
    standard robustness argument. The lower median of the sorted frame
    is exact integer arithmetic end to end, so detection replays
    bit-for-bit in DuckDB.

    Scale shape: one shuffle on user_id (high cardinality — naturally
    parallel), a 5-row sliding frame (constant memory per row, no
    whole-partition buffering), then a tiny hash aggregate. The
    sort of 5 elements per row is O(1); no global ordering anywhere."""
    from ..functions.stable import dec

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        (dec("value") * F.lit(1000000).cast("decimal(7,0)")).cast("long").alias("v_micro"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type")
        .rowsBetween(-4, Window.currentRow)
    )
    med = ev.withColumn("win", F.sort_array(F.collect_list("v_micro").over(w))).withColumn(
        "med_micro", F.expr("win[((size(win) + 1) div 2) - 1]")  # 0-based
    )
    spike = (F.col("med_micro") > 0) & (F.col("v_micro") > 2 * F.col("med_micro"))
    return (
        med.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(spike, 1).otherwise(0)).cast("long").alias("n_spikes"),
            F.sum(F.when(spike, F.col("v_micro")).otherwise(0))
            .cast("long")
            .alias("spike_mass_micro"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Interval-union coverage: merge overlapping activity windows per user.
# --------------------------------------------------------------------------
_COVERAGE_WIN_S = 1800  # each event opens a 30-minute activity window
_COVERAGE_ORACLE = f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s_us,
         epoch_us(ts) + {_COVERAGE_WIN_S}::BIGINT * 1000000 AS e_us
  FROM events
),
flag AS (
  SELECT user_id, s_us, e_us,
         CASE WHEN s_us > MAX(e_us) OVER (PARTITION BY user_id ORDER BY s_us, e_us
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
isl AS (
  SELECT user_id, s_us, e_us,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s_us, e_us
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM flag
),
merged AS (
  SELECT user_id, island, MIN(s_us) AS m_s, MAX(e_us) AS m_e
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       COUNT(*) AS n_islands,
       CAST(SUM((m_e - m_s) // 1000000) AS BIGINT) AS covered_s
FROM merged GROUP BY user_id ORDER BY user_id
"""


@query("q_events_interval_coverage", oracle=_COVERAGE_ORACLE, tags=("events", "window", "session"))
def q_events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage (the classic merge-overlapping-intervals
    problem, distributed): every event opens a 30-minute activity
    window; overlapping windows merge into islands and each user
    reports island count + total covered seconds. Differs from
    sessionization by gap: islands are defined by interval OVERLAP
    (an event landing inside an open window extends it), the shape
    used for utilization, billing, and uptime math.

    Scale shape: one shuffle on user_id; the island detector is a
    running MAX over end-times (streaming frame, constant memory) —
    no self-join, no explode of the interval span; integer epoch
    microseconds end to end."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + F.lit(_COVERAGE_WIN_S * 1_000_000)).alias("e_us"),
    )
    from pyspark.sql.window import Window

    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = (
        iv.withColumn(
            "new_island",
            F.when(F.col("s_us") > F.max("e_us").over(w_prev), 1).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_run))
    )
    merged = isl.groupBy("user_id", "island").agg(
        F.min("s_us").alias("m_s"), F.max("e_us").alias("m_e")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.expr("sum((m_e - m_s) div 1000000)").cast("long").alias("covered_s"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences.
# --------------------------------------------------------------------------
_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
trans AS (
  SELECT prev, event_type AS next, COUNT(*) AS n_trans
  FROM seq WHERE prev IS NOT NULL
  GROUP BY prev, event_type
)
SELECT prev, next, n_trans,
       CAST((n_trans * 1000000) // SUM(n_trans) OVER (PARTITION BY prev) AS BIGINT) AS prob_ppm
FROM trans
ORDER BY prev, next
"""


@query("q_events_markov_chain", oracle=_MARKOV_ORACLE, tags=("events", "sequence", "model"))
def q_events_markov_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: P(next | prev) in integer ppm — the behavioral model
    behind next-action prediction and anomaly scoring on session data.

    Scale shape: ONE shuffle on user_id for the lag window (sequence
    order is (ts, event_id), tie-free), then a bounded aggregation —
    the transition matrix is |event_types|^2 rows, so the per-prev
    normalizing window runs over a provably tiny table.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    trans = seq.groupBy("prev", F.col("event_type").alias("next")).agg(
        F.count("*").alias("n_trans")
    )
    w_prev = Window.partitionBy("prev")
    return (
        trans.withColumn("_tot", F.sum("n_trans").over(w_prev))
        .select(
            "prev",
            "next",
            "n_trans",
            F.expr("n_trans * 1000000 div _tot").alias("prob_ppm"),
        )
        .orderBy("prev", "next")
    )


# --------------------------------------------------------------------------
# Lag-1 autocorrelation of the hourly value series per event type.
# --------------------------------------------------------------------------
_ACF_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(FLOOR(SUM(CAST(value AS DECIMAL(18,2)))) AS BIGINT) AS x
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
m AS (
  SELECT event_type, CAST(SUM(x) // COUNT(*) AS BIGINT) AS mean_x, COUNT(*) AS n_buckets
  FROM hourly GROUP BY event_type
),
dev AS (
  SELECT h.event_type, h.h, h.x - m.mean_x AS d,
         lag(h.x - m.mean_x) OVER (PARTITION BY h.event_type ORDER BY h.h) AS dprev,
         m.n_buckets
  FROM hourly h JOIN m ON m.event_type = h.event_type
),
s AS (
  SELECT event_type, MAX(n_buckets) AS n_buckets,
         SUM(CASE WHEN dprev IS NOT NULL THEN d * dprev ELSE 0 END) AS num,
         SUM(d * d) AS den
  FROM dev GROUP BY event_type
)
SELECT event_type,
       CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(CASE WHEN num >= 0 THEN (num * 1000000) // den
                 ELSE -(((-num) * 1000000) // den) END AS BIGINT) AS acf1_ppm
FROM s ORDER BY event_type
"""


@query("q_events_acf_hourly", oracle=_ACF_ORACLE, tags=("events", "timeseries", "stats"))
def q_events_acf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's hourly value series —
    the stationarity probe run before any forecasting model:
    r1 = sum((x_t - mean)(x_{t-1} - mean)) / sum((x_t - mean)^2).
    No square root needed (the classic ACF denominator is the plain
    variance sum), so the whole statistic stays in int64: whole-unit
    bucket sums (floor of an exact decimal sum), integer mean, and a
    sign-split ppm division — Spark's ``div`` truncates toward zero
    while DuckDB's ``//`` floors, so negative numerators divide on
    their absolute value with the sign re-applied, identically on both
    engines.

    Scale shape: one hash aggregate to (type, hour) buckets, a 1-row-
    per-type mean join, one lag window partitioned by type over the
    bucket table (bounded: hours x types, not raw events)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.floor(F.sum(F.col("value").cast("decimal(18,2)"))).cast("long").alias("x")
    )
    m = hourly.groupBy("event_type").agg(
        F.expr("sum(x) div count(*)").alias("mean_x"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    dev = (
        hourly.join(m, "event_type")
        .withColumn("d", F.col("x") - F.col("mean_x"))
        .withColumn("dprev", F.lag("d").over(w))
    )
    s = dev.groupBy("event_type").agg(
        F.max("n_buckets").alias("n_buckets"),
        F.sum(
            F.when(F.col("dprev").isNotNull(), F.col("d") * F.col("dprev")).otherwise(0)
        ).alias("num"),
        F.sum(F.col("d") * F.col("d")).alias("den"),
    )
    return s.select(
        "event_type",
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.when(
            F.col("num") >= 0, F.expr("num * 1000000 div den")
        )
        .otherwise(-F.expr("(-num) * 1000000 div den"))
        .cast("long")
        .alias("acf1_ppm"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Activity heatmap: ISO day-of-week x hour matrix.
# --------------------------------------------------------------------------
_HEATMAP_ORACLE = """
SELECT CAST(isodow(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hod,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q_events_heatmap", oracle=_HEATMAP_ORACLE, tags=("events", "window"))
def q_events_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity matrix (the BI heatmap).
    ISO day numbering (1=Monday) on both engines — Spark's default
    ``dayofweek`` is 1=Sunday while DuckDB's ``dow`` is 0=Sunday, the
    classic cross-engine off-by-one; ``weekday``+1 == ``isodow``
    sidesteps it.

    Scale shape: one hash aggregate to a bounded 7x24 grid; the
    distinct-user count shuffles (dow, hod, user) tuples with map-side
    partial dedup."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.weekday("ts") + 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .orderBy("dow", "hod")
    )


# --------------------------------------------------------------------------
# Session-level conversion: share of sessions containing a purchase.
# --------------------------------------------------------------------------
_SESSION_CONV_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
), sessions AS (
  SELECT user_id, sess_id,
         COUNT(*) AS n_events,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM numbered GROUP BY user_id, sess_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST((SUM(converted) * 1000000) // COUNT(*) AS BIGINT) AS session_conv_ppm,
       CAST(SUM(CASE WHEN converted = 1 THEN n_events ELSE 0 END) AS BIGINT) AS converted_events
FROM sessions
"""


@query("q_events_session_conversion", oracle=_SESSION_CONV_ORACLE, tags=("events", "session", "funnel"))
def q_events_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level conversion rate: the share of 30-minute-gap
    sessions that contain a purchase — the funnel denominator product
    teams actually use (user-level conversion hides how many visits it
    takes). Native ``session_window`` sessions, integer ppm.

    Scale shape: identical to q_events_sessionize (one user-keyed
    shuffle into session_window state) plus a scalar rollup."""
    ev = load_table(spark, sf_dir, "events")
    sessions = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sess"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "converted"
            ),
        )
    )
    return sessions.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.expr("sum(converted) * 1000000 div count(*)").cast("long").alias("session_conv_ppm"),
        F.sum(F.when(F.col("converted") == 1, F.col("n_events")).otherwise(0))
        .cast("long")
        .alias("converted_events"),
    )


# --------------------------------------------------------------------------
# VariantType semi-structured path (Spark 4): parse once, extract many.
# --------------------------------------------------------------------------
_VARIANT_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type ORDER BY event_type
"""


@query("q_events_variant_extract", oracle=_VARIANT_ORACLE, tags=("events", "json", "variant"))
def q_events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get`` paths — the columnar-shredding path that beats
    re-parsing JSON text per extraction (q_events_json_extract is the
    legacy ``get_json_object`` formulation of the same answer). The
    oracle replays with DuckDB's JSON extraction; values must agree
    exactly.

    Scale shape: parse + extract are row-local inside codegen's
    variant kernels; one aggregate after."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# DAU/MAU stickiness ratio per day.
# --------------------------------------------------------------------------
_STICKINESS_ORACLE = """
WITH dau AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY 1
),
contrib AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) + CAST(s.off AS INTEGER) AS day, user_id
  FROM events, UNNEST(range(0, 30)) AS s(off)
),
mau AS (SELECT day, COUNT(DISTINCT user_id) AS mau FROM contrib GROUP BY day)
SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(m.mau AS BIGINT) AS mau,
       CAST((d.dau * 1000000) // m.mau AS BIGINT) AS stickiness_ppm
FROM dau d JOIN mau m ON m.day = d.day
ORDER BY d.day
"""


@query("q_events_stickiness", oracle=_STICKINESS_ORACLE, tags=("events", "window", "distinct"))
def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day — the product-health KPI. The
    trailing-30-day distinct-user count (MAU) uses the contribution
    explode (each (day, user) observation votes into the next 30
    daily buckets), the same trick as q_events_wau_rolling: turns a
    30-day sliding DISTINCT into two plain groupBys — no self-join,
    no window over exploded state. Days with DAU but an observation
    window shorter than 30d report the partial MAU (as products do).

    Scale shape: the explode is map-side (30 small ints per distinct
    (day, user)); both distinct aggregates shuffle (day, user) pairs
    with partial dedup."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dau = ev.select(day.alias("day"), "user_id").distinct().groupBy("day").agg(
        F.count(F.lit(1)).alias("dau")
    )
    contrib = (
        ev.select(day.alias("d0"), "user_id")
        .distinct()
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(29))).alias("off"), "d0", "user_id"
        )
        .select(F.date_add(F.col("d0"), F.col("off")).alias("day"), "user_id")
        .distinct()
    )
    mau = contrib.groupBy("day").agg(F.count(F.lit(1)).alias("mau"))
    return (
        dau.join(mau, "day")
        .select(
            "day",
            F.col("dau").cast("long"),
            F.col("mau").cast("long"),
            F.expr("dau * 1000000 div mau").cast("long").alias("stickiness_ppm"),
        )
        .orderBy("day")
    )
