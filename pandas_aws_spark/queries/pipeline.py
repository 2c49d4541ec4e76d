"""Production-pipeline operators: drift detection, feature encoding,
CDC compaction, time-hierarchy rollups, per-source caps.

These are the ops a training-data / feature pipeline runs *around* the
core relational engine — monitoring (drift), feature engineering
(target encoding), ingestion maintenance (changelog compaction,
continuous-aggregate rollups) and corpus curation (per-domain caps).
All arithmetic that feeds the oracle hash is integer-ppm or
fixed-point decimal, so every query replays bit-for-bit in DuckDB.

Reference parity note: the reference (pandas_aws) has no analytics
operators at all — these extend SURVEY.md §2.9's north-star families
(pipeline ops) with the monitoring/maintenance layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.stable import dsum, sql_dsum
from ..registry import load_table, query

# --------------------------------------------------------------------------
# Distribution drift: total-variation distance (ppm) between the early
# and late halves of the event stream, per event type.
# --------------------------------------------------------------------------
_BIN_W = 50.0  # value in [0.01, ~490] -> 10 fixed-width bins
_DRIFT_ORACLE = f"""
WITH bounds AS (
  SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid_us FROM events
),
binned AS (
  SELECT e.event_type,
         LEAST(9, CAST(floor(e.value / {_BIN_W}) AS INT)) AS bin,
         CASE WHEN epoch_us(e.ts) < b.mid_us THEN 1 ELSE 0 END AS early
  FROM events e CROSS JOIN bounds b
),
cells AS (
  SELECT event_type, bin,
         SUM(early) AS ne, SUM(1 - early) AS nl
  FROM binned GROUP BY event_type, bin
),
props AS (
  SELECT event_type, bin, ne, nl,
         (1000000 * ne) // SUM(ne) OVER (PARTITION BY event_type) AS pe_ppm,
         (1000000 * nl) // SUM(nl) OVER (PARTITION BY event_type) AS pl_ppm
  FROM cells
)
SELECT event_type,
       CAST(SUM(ne) AS BIGINT) AS n_early,
       CAST(SUM(nl) AS BIGINT) AS n_late,
       CAST(SUM(abs(pe_ppm - pl_ppm)) // 2 AS BIGINT) AS tvd_ppm,
       CAST(MAX(abs(pe_ppm - pl_ppm)) AS BIGINT) AS max_bin_shift_ppm
FROM props GROUP BY event_type ORDER BY event_type
"""


@query("q_drift_tvd", oracle=_DRIFT_ORACLE, tags=("monitoring", "drift", "stats"))
def q_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-drift monitor: per-event-type total-variation distance
    between the value distributions of the early and late halves of
    the stream (midpoint of the observed time range), over 10 fixed-
    width bins. TVD = 1/2 * sum|p_i - q_i| is the drift metric that
    needs NO logarithm (PSI/KL need libm, whose last-ulp behavior is
    not engine-portable) — kept in integer ppm end to end.

    Scale shape: one scalar min/max aggregate broadcast back onto the
    scan (1-row nested-loop join, allowlisted), one hash aggregate to
    10 bins x types, then a window over <=10-row groups. The wide
    input crosses the shuffle only as (type, bin) partial counts —
    map-side combinable, no global sort anywhere."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / F.lit(2))
        .cast("long")
        .alias("mid_us")
    )
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.least(F.lit(9), F.floor(F.col("value") / F.lit(_BIN_W)).cast("int")).alias("bin"),
        F.when(F.unix_micros("ts") < F.col("mid_us"), 1).otherwise(0).alias("early"),
    )
    cells = binned.groupBy("event_type", "bin").agg(
        F.sum("early").alias("ne"), F.sum(F.lit(1) - F.col("early")).alias("nl")
    )
    w = Window.partitionBy("event_type")
    props = cells.select(
        "event_type",
        "ne",
        "nl",
        F.expr("1000000 * ne").alias("sne"),
        F.expr("1000000 * nl").alias("snl"),
        F.sum("ne").over(w).alias("te"),
        F.sum("nl").over(w).alias("tl"),
    ).select(
        "event_type",
        "ne",
        "nl",
        F.expr("sne div te").alias("pe_ppm"),
        F.expr("snl div tl").alias("pl_ppm"),
    )
    return (
        props.groupBy("event_type")
        .agg(
            F.sum("ne").cast("long").alias("n_early"),
            F.sum("nl").cast("long").alias("n_late"),
            F.expr("sum(abs(pe_ppm - pl_ppm)) div 2").cast("long").alias("tvd_ppm"),
            F.max(F.abs(F.col("pe_ppm") - F.col("pl_ppm"))).cast("long").alias("max_bin_shift_ppm"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Smoothed target encoding — the leakage-safe categorical encoder.
# --------------------------------------------------------------------------
_TE_THRESHOLD = 150000.0
_TE_M = 20  # smoothing pseudo-count
_TE_ORACLE = f"""
WITH g AS (
  SELECT (1000000 * SUM(CASE WHEN o_totalprice > {_TE_THRESHOLD} THEN 1 ELSE 0 END))
         // COUNT(*) AS g_ppm
  FROM orders
),
cat AS (
  SELECT o_orderpriority,
         COUNT(*) AS n,
         SUM(CASE WHEN o_totalprice > {_TE_THRESHOLD} THEN 1 ELSE 0 END) AS pos
  FROM orders GROUP BY o_orderpriority
)
SELECT c.o_orderpriority, CAST(c.n AS BIGINT) AS n, CAST(c.pos AS BIGINT) AS pos,
       CAST((1000000 * c.pos + {_TE_M} * g.g_ppm) // (c.n + {_TE_M}) AS BIGINT) AS enc_ppm
FROM cat c CROSS JOIN g
ORDER BY c.o_orderpriority
"""


@query("q_feature_target_encode", oracle=_TE_ORACLE, tags=("features", "encoding"))
def q_feature_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding: each category's positive rate shrunk
    toward the global rate by a pseudo-count prior,
    ``(pos + m * g) / (n + m)`` — the standard high-cardinality
    categorical encoder. Integer-ppm arithmetic (no float division)
    so the encoding is bit-identical across engines.

    Scale shape: two hash aggregates over the same scan (category
    one map-side-combinable, global one row) joined by a 1-row
    broadcast — no window, no sort; category cardinality bounds the
    shuffle, not row count."""
    orders = load_table(spark, sf_dir, "orders")
    is_pos = F.when(F.col("o_totalprice") > _TE_THRESHOLD, 1).otherwise(0)
    g = orders.agg(
        F.expr(
            f"1000000 * sum(case when o_totalprice > {_TE_THRESHOLD} then 1 else 0 end)"
            " div count(*)"
        ).alias("g_ppm")
    )
    cat = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum(is_pos).alias("pos")
    )
    return (
        cat.crossJoin(F.broadcast(g))
        .select(
            "o_orderpriority",
            F.col("n").cast("long").alias("n"),
            F.col("pos").cast("long").alias("pos"),
            F.expr(f"(1000000 * pos + {_TE_M} * g_ppm) div (n + {_TE_M})")
            .cast("long")
            .alias("enc_ppm"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# CDC changelog compaction — latest-per-key with delete tombstones.
# --------------------------------------------------------------------------
_CDC_ORACLE = f"""
WITH log AS (
  SELECT l_orderkey AS key, l_linenumber AS seq,
         CASE WHEN (l_orderkey + l_linenumber) % 7 = 0 THEN 'D' ELSE 'U' END AS op,
         l_extendedprice AS val
  FROM lineitem
),
latest AS (
  SELECT key, seq, op, val,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC, val DESC) AS rn
  FROM log
)
SELECT op,
       COUNT(*) AS n_keys,
       {sql_dsum("val")} AS total_value,
       CAST(MAX(seq) AS BIGINT) AS max_versions
FROM latest WHERE rn = 1 GROUP BY op ORDER BY op
"""


@query("q_cdc_compact", oracle=_CDC_ORACLE, tags=("cdc", "merge", "window"))
def q_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction, the maintenance step behind every CDC
    sink (Debezium->lake, Kafka compacted topics): keep only the
    highest-sequence row per key; a 'D' tombstone as the latest row
    means the key is dead. Here lineitem plays the changelog (key =
    orderkey, seq = linenumber, deterministic synthetic op), and the
    result summarizes surviving vs tombstoned keys. The synthetic log
    has duplicate (key, seq) pairs, so ordering tie-breaks on val —
    rows tying on all three are interchangeable, keeping the output
    deterministic (a real changelog has a unique LSN).

    Scale shape: ROW_NUMBER over (key, seq desc) — one shuffle on
    the natural key, per-key groups are version counts (small by
    construction in any real changelog); rn=1 filter plans as
    WindowGroupLimit (top-1 heap per key), so no full per-key sort
    materializes. The companion API op is ``warehouse.merge_frames``
    (q_upsert_merge) which applies such a compacted batch."""
    li = load_table(spark, sf_dir, "lineitem")
    log = li.select(
        F.col("l_orderkey").alias("key"),
        F.col("l_linenumber").alias("seq"),
        F.when((F.col("l_orderkey") + F.col("l_linenumber")) % 7 == 0, "D")
        .otherwise("U")
        .alias("op"),
        F.col("l_extendedprice").alias("val"),
    )
    w = Window.partitionBy("key").orderBy(F.desc("seq"), F.desc("val"))
    latest = log.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        latest.groupBy("op")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            dsum("val").alias("total_value"),
            F.max("seq").cast("long").alias("max_versions"),
        )
        .orderBy("op")
    )


# --------------------------------------------------------------------------
# Time-hierarchy rollup (continuous-aggregate style): one pass, all
# granularities.
# --------------------------------------------------------------------------
_ROLLUP_ORACLE = f"""
SELECT COALESCE(year(ts), -1) AS y,
       COALESCE(month(ts), -1) AS m,
       COALESCE(day(ts), -1) AS d,
       COUNT(*) AS n_events,
       {sql_dsum("value")} AS total_value
FROM events
GROUP BY ROLLUP (year(ts), month(ts), day(ts))
ORDER BY y, m, d
"""


@query("q_time_rollup", oracle=_ROLLUP_ORACLE, tags=("agg", "rollup", "timeseries"))
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: day, month, year and
    grand-total rollups of the event stream in ONE pass — Spark's
    Expand operator replicates rows per grouping level ahead of a
    single partial+final hash aggregate, vs 4 scans written naively.
    Missing levels surface as -1 (hash-stable, no NULL ordering
    ambiguity). This is the batch half of the streaming tumbling
    aggregate (q_stream_tumbling_hourly) — together they form the
    classic lambda rollup a 100 TB telemetry store maintains."""
    ev = load_table(spark, sf_dir, "events")
    rolled = (
        ev.select(
            F.year("ts").alias("yy"), F.month("ts").alias("mm"), F.dayofmonth("ts").alias("dd"),
            "value",
        )
        .rollup("yy", "mm", "dd")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
    )
    return rolled.select(
        F.coalesce("yy", F.lit(-1)).alias("y"),
        F.coalesce("mm", F.lit(-1)).alias("m"),
        F.coalesce("dd", F.lit(-1)).alias("d"),
        "n_events",
        "total_value",
    ).orderBy("y", "m", "d")


# --------------------------------------------------------------------------
# Per-source document caps — the anti-domination curation step.
# --------------------------------------------------------------------------
_CAP_K = 15
_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rk <= {_CAP_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rk <= {_CAP_K} THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total
FROM ranked GROUP BY source ORDER BY source
"""


@query("q_text_domain_caps", oracle=_CAP_ORACLE, tags=("text", "curation", "sampling"))
def q_text_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution caps: rank each source's documents by
    length (tie-broken on doc_id — deterministic) and keep at most K,
    reporting kept/total volume per source. Web-scale corpora are
    power-law dominated by a few hosts; capping per-domain is the
    standard counter (C4/RefinedWeb pipelines cap per-URL-host).

    Scale shape: one shuffle on source; the rank is per-source
    (bounded groups after upstream sharding — a production run caps
    per (source, shard) first when single hosts exceed executor
    memory); aggregation rides the same partitioning, so the whole
    query is one exchange."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    ranked = docs.select("source", "n_chars", "doc_id").withColumn("rk", F.row_number().over(w))
    kept = F.when(F.col("rk") <= _CAP_K, 1).otherwise(0)
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).alias("n_kept"),
            F.sum(F.when(F.col("rk") <= _CAP_K, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("chars_kept"),
            F.sum("n_chars").cast("long").alias("chars_total"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Negative sampling — contrastive training pairs without a cross join.
# --------------------------------------------------------------------------
_NEG_BUYERS = 20
_NEG_PER_USER = 10
_NEG_ORACLE = f"""
WITH buyers AS (
  SELECT o_custkey AS custkey, COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
  ORDER BY n_orders DESC, custkey LIMIT {_NEG_BUYERS}
),
np AS (SELECT COUNT(*) AS n_parts FROM part),
cand AS (
  SELECT DISTINCT b.custkey,
         CAST(concat('0x', substring(md5(
           CAST(b.custkey AS VARCHAR) || '|' || CAST(i.i AS VARCHAR)),1,7)) AS BIGINT)
           % np.n_parts AS partkey
  FROM buyers b CROSS JOIN np CROSS JOIN (SELECT UNNEST(range({_NEG_PER_USER})) AS i) i
),
purchased AS (
  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
  FROM orders o
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN buyers b ON b.custkey = o.o_custkey
),
neg AS (
  SELECT c.custkey, c.partkey FROM cand c
  LEFT JOIN purchased p ON p.custkey = c.custkey AND p.partkey = c.partkey
  WHERE p.custkey IS NULL
),
valid AS (SELECT n.custkey, n.partkey FROM neg n JOIN part pt ON pt.p_partkey = n.partkey),
cagg AS (SELECT custkey, COUNT(*) AS n_candidates FROM cand GROUP BY custkey),
nagg AS (SELECT custkey, COUNT(*) AS n_negatives FROM valid GROUP BY custkey)
SELECT b.custkey, CAST(b.n_orders AS BIGINT) AS n_orders,
       CAST(c.n_candidates AS BIGINT) AS n_candidates,
       CAST(COALESCE(n.n_negatives, 0) AS BIGINT) AS n_negatives
FROM buyers b JOIN cagg c ON c.custkey = b.custkey
LEFT JOIN nagg n ON n.custkey = b.custkey
ORDER BY b.custkey
"""


@query("q_sample_negative", oracle=_NEG_ORACLE, tags=("sampling", "features"))
def q_sample_negative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative sampling for contrastive / recommender training: for
    each heavy buyer, GENERATE candidate item ids by hashing
    (user, i) into the item-key domain, then anti-join away true
    positives and validate existence against the item dimension —
    the hash-generate-then-filter pattern that replaces the naive
    "sample from the user x item cross product" (which at 100 TB is
    a non-starter). Deterministic md5 candidates, so exact replay.

    Scale shape: candidates are |users| x n_neg rows generated by
    expression (no join); the positives side is semi-reduced to the
    sampled users BEFORE the anti-join (broadcast both tiny sides);
    item validation streams the part table against broadcast
    candidates — no shuffle of any big table anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    buyers = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "custkey")
        .limit(_NEG_BUYERS)
    )
    np_df = part.agg(F.count(F.lit(1)).alias("n_parts"))
    cand = (
        buyers.crossJoin(F.broadcast(np_df))
        .select(
            "custkey",
            F.explode(F.sequence(F.lit(0), F.lit(_NEG_PER_USER - 1))).alias("i"),
            "n_parts",
        )
        .select(
            "custkey",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("custkey").cast("string"), F.lit("|"), F.col("i").cast("string")
                            )
                        ),
                        1,
                        7,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n_parts")
            ).alias("partkey"),
        )
        .distinct()
    )
    purchased = (
        orders.join(F.broadcast(buyers), orders.o_custkey == buyers.custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("partkey"))
        .distinct()
    )
    neg = cand.join(F.broadcast(purchased), ["custkey", "partkey"], "left_anti")
    valid = part.join(F.broadcast(neg), part.p_partkey == neg.partkey).select(
        neg.custkey, neg.partkey
    )
    cagg = cand.groupBy("custkey").agg(F.count(F.lit(1)).alias("n_candidates"))
    nagg = valid.groupBy("custkey").agg(F.count(F.lit(1)).alias("n_negatives"))
    return (
        buyers.join(cagg, "custkey")
        .join(nagg, "custkey", "left")
        .select(
            "custkey",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.coalesce("n_negatives", F.lit(0)).cast("long").alias("n_negatives"),
        )
        .orderBy("custkey")
    )


# --------------------------------------------------------------------------
# Seasonality-aware anomaly detection: per (type, hour-of-day) baseline.
# --------------------------------------------------------------------------
_SEASONAL_ORACLE = """
WITH m AS (
  SELECT event_type, hour(ts) AS hod,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v_micro
  FROM events
),
base AS (
  SELECT event_type, hod,
         SUM(v_micro) // COUNT(*) AS mean_micro, COUNT(*) AS n
  FROM m GROUP BY event_type, hod
)
SELECT m.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN m.v_micro > 2 * b.mean_micro THEN 1 ELSE 0 END) AS BIGINT) AS n_above_2x,
       CAST(MAX((1000000 * m.v_micro) // b.mean_micro) AS BIGINT) AS max_ratio_ppm
FROM m JOIN base b ON b.event_type = m.event_type AND b.hod = m.hod
GROUP BY m.event_type ORDER BY m.event_type
"""


@query("q_events_seasonal_anomaly", oracle=_SEASONAL_ORACLE, tags=("events", "monitoring", "stats"))
def q_events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection: the baseline is the mean
    PER (event type, hour-of-day) — so a 2x spike is judged against
    what is normal for 3am, not the day's blended mean (which the
    plain z-score entry q_events_zscore_outliers uses). Values ride
    as exact decimal micros, so the 2x predicate and ratio are pure
    int64 — no float division anywhere.

    Scale shape: the baseline table is (types x 24) rows — broadcast
    back onto the scan; two map-side-combinable hash aggregates, no
    window, no sort."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_type",
        F.hour("ts").alias("hod"),
        (F.col("value").cast("decimal(18,6)") * 1000000).cast("long").alias("v_micro"),
    )
    base = m.groupBy("event_type", "hod").agg(
        F.expr("sum(v_micro) div count(*)").alias("mean_micro")
    )
    joined = m.join(F.broadcast(base), ["event_type", "hod"])
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("v_micro") > 2 * F.col("mean_micro"), 1).otherwise(0))
            .cast("long")
            .alias("n_above_2x"),
            F.max(F.expr("(1000000 * v_micro) div mean_micro")).cast("long").alias("max_ratio_ppm"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Market concentration: Herfindahl-Hirschman index of supplier revenue
# share per nation.
# --------------------------------------------------------------------------
_HHI_ORACLE = """
WITH rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(25,6))
              * CAST(1000000 AS DECIMAL(7,0)) AS BIGINT) AS rev_micro
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey
),
tot AS (SELECT s_nationkey, SUM(rev_micro) AS t FROM rev GROUP BY s_nationkey),
shares AS (
  SELECT r.s_nationkey, r.rev_micro // (t.t // 1000000) AS share_ppm
  FROM rev r JOIN tot t ON t.s_nationkey = r.s_nationkey
)
SELECT n.n_name AS nation,
       COUNT(*) AS n_suppliers,
       CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm
FROM shares sh JOIN nation n ON n.n_nationkey = sh.s_nationkey
GROUP BY n.n_name ORDER BY nation
"""


@query("q_supplier_hhi", oracle=_HHI_ORACLE, tags=("stats", "agg"))
def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within
    each nation: sum of squared revenue shares, in ppm (1e6 = pure
    monopoly). The concentration sibling of q_supplier_pareto (which
    ranks the cumulative curve): HHI needs no ordering at all, so it
    scales as two hash aggregates + a per-nation total join — shares
    in integer ppm via exact decimal micro revenue.

    Scale shape: group by (nation, supplier) is the only big shuffle;
    the totals table is 25 rows broadcast; no window, no sort."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    from ..functions.stable import dsum_micro

    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(dsum_micro("l_extendedprice").alias("rev_micro"))
    )
    tot = rev.groupBy("s_nationkey").agg(F.sum("rev_micro").alias("t"))
    # share in ppm without overflow: divide the total down first
    # (rev_micro * 1e6 would exceed int64 at real revenue volumes)
    shares = rev.join(F.broadcast(tot), "s_nationkey").select(
        "s_nationkey", F.expr("rev_micro div (t div 1000000)").alias("share_ppm")
    )
    return (
        shares.join(F.broadcast(nat), shares.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.expr("sum(share_ppm * share_ppm) div 1000000").cast("long").alias("hhi_ppm"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# Deterministic per-group reservoir sample: k docs per source.
# --------------------------------------------------------------------------
_RESERVOIR_K = 7
_RESERVOIR_ORACLE = f"""
WITH pri AS (
  SELECT source, doc_id, n_chars,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),1,14)) AS BIGINT) AS p
  FROM documents
),
ranked AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY p, doc_id) AS rn
  FROM pri
)
SELECT source,
       COUNT(*) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS sample_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM ranked WHERE rn <= {_RESERVOIR_K}
GROUP BY source ORDER BY source
"""


@query("q_sample_reservoir_group", oracle=_RESERVOIR_ORACLE, tags=("sampling", "topk"))
def q_sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-per-group sampling (k docs per source) via
    content-hash priorities — the reproducible replacement for
    per-group reservoir sampling, whose picks depend on encounter
    order. A pure function of the data: identical across reruns,
    repartitions, and engines (the DuckDB oracle replays the exact
    md5-priority arithmetic).

    Scale shape: one shuffle on source + a WindowGroupLimit top-k
    heap per partition — skewed groups stream through a k-row heap,
    nothing materializes a whole group. See
    operators/sampling.py:reservoir_per_group."""
    from ..operators.sampling import reservoir_per_group

    docs = load_table(spark, sf_dir, "documents")
    picked = reservoir_per_group(docs, "doc_id", "source", _RESERVOIR_K)
    return (
        picked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sample_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Hashing-trick featurization: tokens -> fixed 512-bucket space.
# --------------------------------------------------------------------------
_FH_BUCKETS = 512
_FH_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
),
bucketed AS (
  SELECT source,
         (CAST(concat('0x', substring(md5(CAST(tok AS VARCHAR)),1,7)) AS BIGINT) % {_FH_BUCKETS}) AS bucket
  FROM toks WHERE tok <> ''
),
loads AS (
  SELECT source, bucket, COUNT(*) AS cnt FROM bucketed GROUP BY 1, 2
)
SELECT source,
       COUNT(*) AS nnz_buckets,
       CAST(MAX(cnt) AS BIGINT) AS max_bucket_load,
       CAST(SUM(cnt) AS BIGINT) AS total_tokens
FROM loads GROUP BY source ORDER BY source
"""


@query("q_feature_hashing_trick", oracle=_FH_ORACLE, tags=("features", "encoding", "text"))
def q_feature_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al.): project an
    unbounded token vocabulary onto a fixed 512-bucket feature space
    with a stable hash — no vocabulary build, no dictionary shuffle,
    the standard trick for streaming feature extraction at corpus
    scale. Reports per-source sparsity (nonzero buckets), hottest
    bucket load (collision pressure), and token mass.

    Scale shape: explode -> hash -> two hash aggregates; the token
    explosion never leaves the map side before the (source, bucket)
    partial aggregation, so the shuffle carries at most
    sources x 512 rows per task — constant in corpus size."""
    from ..operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    loads = (
        toks.select("source", hash_bucket(F.col("tok"), _FH_BUCKETS).alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        loads.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("nnz_buckets"),
            F.max("cnt").cast("long").alias("max_bucket_load"),
            F.sum("cnt").cast("long").alias("total_tokens"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Importance (weighted Bernoulli) sampling — inclusion probability
# proportional to order value, hash-deterministic, no RNG state.
# --------------------------------------------------------------------------
_IMP_DOMAIN = 268435456  # 2^28: the 7-hex-digit md5 hash space
_IMP_ORACLE = f"""
WITH w AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,3)) * 1000 AS BIGINT) AS w_milli,
         CAST(concat('0x', substring(md5(CAST(o_orderkey AS VARCHAR)),1,7)) AS BIGINT) AS hv
  FROM orders
),
mx AS (SELECT MAX(w_milli) AS max_w FROM w),
kept AS (
  SELECT o_orderstatus, w_milli,
         CASE WHEN hv * max_w < w_milli * {_IMP_DOMAIN} THEN 1 ELSE 0 END AS keep
  FROM w, mx
)
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(SUM(w_milli) AS BIGINT) AS sum_w_milli,
       CAST(SUM(CASE WHEN keep = 1 THEN w_milli ELSE 0 END) AS BIGINT) AS kept_w_milli
FROM kept GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


@query("q_sample_importance", oracle=_IMP_ORACLE, tags=("sampling", "features"))
def q_sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling with inclusion probability proportional to
    order value: keep iff hash28(key) / 2^28 < w / w_max. The md5 hash
    replaces RNG state, so the sample is identical on every rerun,
    repartition, and engine — and the kept set can be reproduced (or
    audited) from keys alone. High-value rows are kept with certainty;
    the long tail is downsampled — the standard variance-reduction
    shape for training on monetary streams.

    Scale shape: the global max is a one-row broadcast; everything
    else is a row-local predicate inside codegen (the comparison is
    int64 cross-multiplication — no division, no floats). Weights are
    MILLI-units so both cross-products stay under 2^57 (hv < 2^28,
    w_milli < 2^29 for prices < ~5e5) — micro-units would overflow
    int64 in hv * max_w."""
    o = load_table(spark, sf_dir, "orders")
    w = o.select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,3)") * 1000).cast("long").alias("w_milli"),
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 7), 16, 10)
        .cast("long")
        .alias("hv"),
    )
    mx = w.agg(F.max("w_milli").alias("max_w"))
    kept = w.crossJoin(F.broadcast(mx)).select(
        "o_orderstatus",
        "w_milli",
        F.when(F.col("hv") * F.col("max_w") < F.col("w_milli") * _IMP_DOMAIN, 1)
        .otherwise(0)
        .alias("keep"),
    )
    return (
        kept.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("keep").cast("long").alias("n_kept"),
            F.sum("w_milli").cast("long").alias("sum_w_milli"),
            F.sum(F.when(F.col("keep") == 1, F.col("w_milli")).otherwise(0))
            .cast("long")
            .alias("kept_w_milli"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# A/B experiment readout — hash-assigned arms, conversion lift in ppm.
# --------------------------------------------------------------------------
_AB_ORACLE = """
WITH arms AS (
  SELECT DISTINCT user_id,
         CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)),1,1)) AS BIGINT) % 2 AS arm
  FROM events
),
conv AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
),
per_arm AS (
  SELECT a.arm, COUNT(*) AS n_users,
         SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS n_converted
  FROM arms a LEFT JOIN conv c ON c.user_id = a.user_id
  GROUP BY a.arm
)
SELECT CAST(a.n_users AS BIGINT) AS users_a,
       CAST(b.n_users AS BIGINT) AS users_b,
       CAST((a.n_converted * 1000000) // a.n_users AS BIGINT) AS conv_a_ppm,
       CAST((b.n_converted * 1000000) // b.n_users AS BIGINT) AS conv_b_ppm,
       CAST((b.n_converted * 1000000) // b.n_users
          - (a.n_converted * 1000000) // a.n_users AS BIGINT) AS lift_ppm
FROM (SELECT * FROM per_arm WHERE arm = 0) a, (SELECT * FROM per_arm WHERE arm = 1) b
"""


@query("q_events_ab_lift", oracle=_AB_ORACLE, tags=("events", "experiment"))
def q_events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with hash-based arm assignment (first md5
    hex digit parity — the deterministic splitter every experiment
    platform uses so a user re-entering the pipeline always lands in
    the same arm): per-arm user counts, conversion to 'purchase' in
    integer ppm, and the B-vs-A lift.

    Scale shape: arm assignment is row-local; the conversion check is
    one distinct + one left join on user_id; the final join is two
    one-row aggregates (broadcast). No window, no skew."""
    ev = load_table(spark, sf_dir, "events")
    arms = ev.select(
        "user_id",
        (F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10).cast("long") % 2).alias("arm"),
    ).distinct()
    conv = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    per_arm = (
        arms.join(conv.withColumn("_c", F.lit(1)), "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce(F.col("_c"), F.lit(0))).alias("n_converted"),
        )
    )
    a = per_arm.filter(F.col("arm") == 0).select(
        F.col("n_users").alias("na"), F.col("n_converted").alias("ca")
    )
    b = per_arm.filter(F.col("arm") == 1).select(
        F.col("n_users").alias("nb"), F.col("n_converted").alias("cb")
    )
    return a.crossJoin(F.broadcast(b)).select(
        F.col("na").cast("long").alias("users_a"),
        F.col("nb").cast("long").alias("users_b"),
        F.expr("ca * 1000000 div na").alias("conv_a_ppm"),
        F.expr("cb * 1000000 div nb").alias("conv_b_ppm"),
        F.expr("cb * 1000000 div nb - ca * 1000000 div na").alias("lift_ppm"),
    )


# --------------------------------------------------------------------------
# Deterministic epoch shuffling: reproducible per-epoch permutations +
# shard assignment for training-data loaders. Every epoch must see the
# data in a different order, every rerun of the same epoch must see the
# SAME order, and no coordinator may hold the permutation — all three
# fall out of hashing (epoch, doc_id) into a 60-bit md5 key.
# --------------------------------------------------------------------------
_EPOCH_ORACLE = """
WITH k AS (
  SELECT e.epoch, d.doc_id,
         CAST(concat('0x', substring(md5(concat(CAST(e.epoch AS VARCHAR), ':',
                                                CAST(d.doc_id AS VARCHAR))), 1, 15))
              AS BIGINT) AS key
  FROM documents d, (SELECT UNNEST(range(0, 3)) AS epoch) e
),
sh AS (SELECT epoch, doc_id, key, key % 8 AS shard FROM k),
per_shard AS (
  SELECT epoch, shard, COUNT(*) AS n_docs, SUM(key % 1000000007) AS chk
  FROM sh GROUP BY epoch, shard
),
stability AS (
  SELECT a.epoch, COUNT(*) AS n_same_as_epoch0
  FROM sh a JOIN sh b ON b.epoch = 0 AND b.doc_id = a.doc_id AND b.shard = a.shard
  GROUP BY a.epoch
)
SELECT p.epoch,
       CAST(SUM(p.n_docs) AS BIGINT) AS n_docs,
       COUNT(*) AS n_shards,
       CAST(MAX(p.n_docs) AS BIGINT) AS max_shard,
       CAST(MIN(p.n_docs) AS BIGINT) AS min_shard,
       CAST(SUM(p.chk) % 1000000007 AS BIGINT) AS order_checksum,
       CAST(MIN(s.n_same_as_epoch0) AS BIGINT) AS n_same_as_epoch0
FROM per_shard p JOIN stability s USING (epoch)
GROUP BY p.epoch ORDER BY p.epoch
"""


@query("q_sample_epoch_shuffle", oracle=_EPOCH_ORACLE, tags=("sampling", "training"))
def q_sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coordinator-free epoch shuffling: shard and order each training
    epoch by the 60-bit md5 of (epoch, doc_id). Reruns of an epoch are
    bit-reproducible (pure function of the key), different epochs are
    decorrelated (n_same_as_epoch0 ~ n_docs/8 for epochs > 0 — the
    independence check this query reports), and shards stay balanced
    (max_shard/min_shard). order_checksum pins the within-shard
    ordering so two engines — or two reruns — can prove they fed the
    model identical streams without comparing the streams.

    Scale shape: the 3x epoch fan-out is a map-side explode; everything
    aggregates by (epoch, shard) — one narrow shuffle on a 2-int key
    plus one doc_id-keyed self-join for the stability check (at real
    scale: run per epoch, join only the audited epoch pair)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    k = docs.select(
        "doc_id", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("epoch")
    ).select(
        "epoch",
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("key"),
    )
    sh = k.withColumn("shard", F.col("key") % 8)
    per_shard = sh.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("key") % 1000000007).alias("chk"),
    )
    b = sh.filter(F.col("epoch") == 0).select(
        F.col("doc_id").alias("b_doc"), F.col("shard").alias("b_shard")
    )
    stability = (
        sh.join(b, (F.col("doc_id") == F.col("b_doc")) & (F.col("shard") == F.col("b_shard")))
        .groupBy("epoch")
        .agg(F.count(F.lit(1)).alias("n_same_as_epoch0"))
    )
    return (
        per_shard.join(stability, "epoch")
        .groupBy("epoch")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_shards"),
            F.max("n_docs").cast("long").alias("max_shard"),
            F.min("n_docs").cast("long").alias("min_shard"),
            (F.sum("chk") % 1000000007).cast("long").alias("order_checksum"),
            F.min("n_same_as_epoch0").cast("long").alias("n_same_as_epoch0"),
        )
        .orderBy("epoch")
    )
