"""Structured Streaming queries, oracle-checked via batch equivalence.

Each query drains the events file-stream with ``Trigger.AvailableNow``
(real streaming execution: incremental source offsets, state store,
commit log) and returns the final sink contents — which, by Spark's
batch/stream symmetry, must equal the batch answer the DuckDB oracle
computes. The reference has no streaming at all (SURVEY.md §2.8);
these cover the extension surface: watermarked tumbling windows,
session windows, and a custom ``applyInPandasWithState`` operator.

Paced replay (``max_files_per_trigger``) is exercised in
``tests/test_streaming.py``; here the whole table arrives in one
trigger so the run stays fast under the driver's per-query budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import dsum, sql_dsum
from . import scratch_dir
from ..registry import query
from ..streaming.pipeline import (
    events_stream,
    record_drain,
    run_to_completion,
    stream_sessionize,
    stream_tumbling_hourly,
    user_running_totals,
)

# Same shape as the batch q_events_tumbling_hourly oracle — streaming
# must reproduce it exactly.
_TUMBLING_ORACLE = f"""
SELECT date_trunc('hour', ts) AS win_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q_stream_tumbling_hourly", oracle=_TUMBLING_ORACLE, tags=("streaming", "window"))
def q_stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling windows over the event stream; complete
    output mode so every window (including ones the watermark has not
    closed) is present for the batch-equality check."""
    ev = events_stream(spark, sf_dir)
    res = run_to_completion(
        stream_tumbling_hourly(ev), "stream_tumbling_hourly_sink", output_mode="complete"
    )
    return res.orderBy("win_start", "event_type")


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


@query("q_stream_sessionize", oracle=_SESSION_ORACLE, tags=("streaming", "session"))
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30-min gap) — merges sessions in the
    state store as events arrive; equals the batch gaps-and-islands
    oracle once the stream is drained."""
    ev = events_stream(spark, sf_dir)
    res = run_to_completion(
        stream_sessionize(ev), "stream_sessionize_sink", output_mode="complete"
    )
    return res.orderBy("user_id", "session_start")


_RUNNING_ORACLE = f"""
SELECT user_id,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@query("q_stream_user_running_totals", oracle=_RUNNING_ORACLE, tags=("streaming", "stateful"))
def q_stream_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-user
    cumulative (count, fixed-point sum). The update-mode sink holds one
    snapshot per user per trigger; the final snapshot (max n_events)
    is the grand total and must equal the batch GROUP BY."""
    ev = events_stream(spark, sf_dir)
    snaps = run_to_completion(
        user_running_totals(ev), "stream_running_totals_sink", output_mode="update"
    )
    final = snaps.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_micros", "n_events").alias("total_micros"),
    )
    return final.select(
        "user_id",
        "n_events",
        (F.col("total_micros").cast("double") / F.lit(1_000_000.0)).alias("total_value"),
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# Stream-static enrichment join: the streaming side joins a static
# dimension (broadcast per micro-batch) — the standard "enrich events
# with reference data" topology; no state store involved.
# --------------------------------------------------------------------------
_ENRICH_ORACLE = """
WITH dim AS (
  SELECT user_id, MIN(ts) AS first_seen
  FROM events GROUP BY user_id
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN e.ts = d.first_seen THEN 1 ELSE 0 END) AS BIGINT) AS n_first_events
FROM events e JOIN dim d ON d.user_id = e.user_id
GROUP BY e.event_type
ORDER BY e.event_type
"""


@query("q_stream_static_enrich", oracle=_ENRICH_ORACLE, tags=("streaming", "join"))
def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events stream joined to a static per-user dimension (first-seen
    timestamps, computed batch-side). The dim broadcasts into every
    micro-batch — at production scale it is the curated reference table
    the stream enriches against; integer flag aggregation keeps the
    oracle float-free."""
    from ..registry import load_table

    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_seen"))
    )
    ev = events_stream(spark, sf_dir)
    enriched = ev.join(F.broadcast(dim), "user_id").select(
        "event_type",
        F.when(F.col("ts") == F.col("first_seen"), F.lit(1)).otherwise(F.lit(0)).alias("is_first"),
    )
    agg = enriched.groupBy("event_type").agg(
        F.count("*").alias("n_events"), F.sum("is_first").alias("n_first_events")
    )
    res = run_to_completion(agg, "stream_enrich_sink", output_mode="complete")
    return res.orderBy("event_type")


# --------------------------------------------------------------------------
# Streaming incremental dedup — content-hash keyed state over a
# document stream; final snapshots equal the batch exact-dedup answer.
# --------------------------------------------------------------------------
_STREAM_DEDUP_ORACLE = """
WITH g AS (
  SELECT md5(text) AS h, MIN(doc_id) AS kept_id, COUNT(*) AS n_copies
  FROM documents GROUP BY md5(text)
)
SELECT d.source, COUNT(*) AS n_kept, CAST(SUM(g.n_copies) AS BIGINT) AS n_rows
FROM g JOIN documents d ON d.doc_id = g.kept_id
GROUP BY d.source
ORDER BY d.source
"""


@query("q_stream_dedup_incremental", oracle=_STREAM_DEDUP_ORACLE, tags=("streaming", "dedup"))
def q_stream_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup over the documents STREAM: per-hash
    state tracks (survivor id, copies); state size is the distinct
    corpus, so a month-long ingest stream dedups in O(corpus), not
    O(stream). Final snapshots must equal the batch GROUP BY answer."""
    from ..registry import load_table
    from ..streaming.pipeline import documents_stream, stream_exact_dedup

    snaps = run_to_completion(
        stream_exact_dedup(documents_stream(spark, sf_dir)),
        "stream_dedup_sink",
        output_mode="update",
    )
    final = snaps.groupBy("content_hash").agg(
        F.max_by("kept_id", "n_copies").alias("kept_id"),
        F.max("n_copies").alias("n_copies"),
    )
    docs = load_table(spark, sf_dir, "documents")
    return (
        final.join(docs, final.kept_id == docs.doc_id)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_copies").alias("n_rows"))
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Streaming curation capstone: the full batch curation pass (lang gate,
# quality gate, length gate, exact dedup) applied to the documents
# STREAM — stateless scalar gates per micro-batch, content-hash state
# for dedup, final report equal to the batch pipeline's oracle.
# --------------------------------------------------------------------------
_STREAM_CURATE_ORACLE = r"""
WITH scored AS (
  SELECT doc_id, source, text,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         CASE
           WHEN len(list_filter(string_split_regex(trim(text), '\s+'),
                    t -> list_contains(['the','a','of','and','to','in','is'], t))) > 0
            AND len(list_filter(string_split_regex(trim(text), '\s+'),
                    t -> list_contains(['the','a','of','and','to','in','is'], t)))
                >= greatest(
                    len(list_filter(string_split_regex(trim(text), '\s+'),
                        t -> list_contains(['el','la','de','los','que','y'], t))),
                    len(list_filter(string_split_regex(trim(text), '\s+'),
                        t -> list_contains(['le','les','des','et','une','dans'], t))),
                    len(list_filter(string_split_regex(trim(text), '\s+'),
                        t -> list_contains(['der','die','das','und','ein','zu'], t))))
           THEN 'en' ELSE 'other' END AS pred_lang,
         0.4 * least(CAST(length(text) AS DOUBLE) / 400.0, 1.0)
       + 0.3 * (CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                    t -> list_contains(['the','a','of','and','to','in','is'], t))) AS DOUBLE)
                / len(string_split_regex(trim(text), '\s+')))
       + 0.3 * least((CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split_regex(trim(text), '\s+'),
                                s -> CAST(length(s) AS BIGINT))), (a, b) -> a + b) AS DOUBLE)
                 / len(string_split_regex(trim(text), '\s+'))) / 8.0, 1.0) AS quality
  FROM documents
),
gated AS (
  SELECT * FROM scored WHERE pred_lang = 'en' AND quality >= 0.5 AND n_tokens >= 5
),
deduped AS (
  SELECT md5(text) AS fp, MIN(doc_id) AS kept_id, COUNT(*) AS n_copies
  FROM gated GROUP BY 1
)
SELECT g.source,
       COUNT(*) AS n_kept,
       CAST(SUM(d.n_copies) - COUNT(*) AS BIGINT) AS n_dropped_dups
FROM deduped d JOIN gated g ON g.doc_id = d.kept_id
GROUP BY g.source
ORDER BY g.source
"""


@query("q_stream_curation", oracle=_STREAM_CURATE_ORACLE, tags=("streaming", "pipeline"))
def q_stream_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline as a STREAM: scalar gates (lang, quality,
    length) run stateless per micro-batch; only survivors reach the
    content-hash dedup state — the full ingest-time curation topology,
    equal to the batch answer by construction."""
    from ..operators.text import lang_id, quality_score, token_stats
    from ..registry import load_table
    from ..streaming.pipeline import documents_stream, stream_exact_dedup

    stream = documents_stream(spark, sf_dir)
    gated = token_stats(quality_score(lang_id(stream))).filter(
        (F.col("pred_lang") == "en") & (F.col("quality") >= 0.5) & (F.col("n_tokens") >= 5)
    )
    snaps = run_to_completion(
        stream_exact_dedup(gated), "stream_curation_sink", output_mode="update"
    )
    final = snaps.groupBy("content_hash").agg(
        F.max_by("kept_id", "n_copies").alias("kept_id"),
        F.max("n_copies").alias("n_copies"),
    )
    docs = load_table(spark, sf_dir, "documents")
    return (
        final.join(docs, final.kept_id == docs.doc_id)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            (F.sum("n_copies") - F.count("*")).alias("n_dropped_dups"),
        )
        .orderBy("source")
    )


_ATTRIB_ORACLE = f"""
SELECT c.user_id,
       COUNT(*) AS n_pairs,
       {sql_dsum('p.value')} AS attributed_value
FROM events c
JOIN events p ON p.user_id = c.user_id
            AND p.ts > c.ts
            AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
GROUP BY c.user_id
ORDER BY c.user_id
"""


@query("q_stream_stream_join", oracle=_ATTRIB_ORACLE, tags=("streaming", "join"))
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click->purchase attribution within
    1 hour, per user): two watermarked streams over the same source,
    time-range join condition bounding the state store. Drained with
    availableNow, then batch-aggregated per user — must equal the
    batch self-join oracle exactly (inner stream-stream joins emit
    every match regardless of watermark timing)."""
    from ..streaming.pipeline import stream_click_attribution

    ev = events_stream(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    pairs = stream_click_attribution(clicks, purchases)
    drained = run_to_completion(pairs, "stream_attrib_sink", output_mode="append")
    from ..functions.stable import dsum

    return (
        drained.groupBy(F.col("c_user").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"), dsum("p_value").alias("attributed_value"))
        .orderBy("user_id")
    )


_SDD_ORACLE = """
SELECT event_type, COUNT(*) AS n_pairs
FROM (SELECT DISTINCT user_id, event_type FROM events)
GROUP BY event_type
ORDER BY event_type
"""


@query("q_stream_dedup_within_watermark", oracle=_SDD_ORACLE, tags=("streaming", "dedup"))
def q_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in streaming dedup (``dropDuplicatesWithinWatermark``):
    keeps one event per (user_id, event_type) with state expiring once
    the watermark passes — the bounded-state complement to the custom
    content-hash dedup operator (whose state is O(distinct keys)
    forever). Which row survives is arrival-order dependent, so the
    query counts surviving PAIRS per type — deterministic — and the
    oracle is the batch DISTINCT."""
    ev = events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "48 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    drained = run_to_completion(deduped, "stream_ddw_sink", output_mode="append")
    return (
        drained.groupBy("event_type").agg(F.count("*").alias("n_pairs")).orderBy("event_type")
    )


def _pystream_oracle() -> str:
    from ..sources.pysource import sql_synthetic_events

    return f"""
WITH feed AS ({sql_synthetic_events(10_000, 100)})
SELECT event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM feed
GROUP BY event_type
ORDER BY event_type
"""


@query("q_source_python_stream", oracle=_pystream_oracle(), tags=("streaming", "source", "extensibility"))
def q_source_python_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING Python Data Source (Spark 4
    ``DataSourceStreamReader``): row-index offsets, 4 micro-batches of
    2500 rows under availableNow, per-partition executor-side
    generation — the full incremental-source lifecycle (offset log +
    commit) for a connector Spark doesn't ship. Drained rows are
    batch-aggregated through the decimal-stable sum and must equal the
    DuckDB generate_series replay of the same formulas."""
    from ..functions.stable import dsum
    from ..sources import pysource

    pysource.register(spark)
    feed = (
        spark.readStream.format("synthetic_events_stream")
        .option("n_rows", 10_000)
        .option("num_users", 100)
        .option("batch_rows", 2_500)
        .load()
    )
    drained = run_to_completion(feed, "pystream_sink", output_mode="append")
    return (
        drained.groupBy("event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .orderBy("event_type")
    )


_GAP_ALERT_ORACLE = """
WITH g AS (
  SELECT user_id,
         (epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
          - epoch_us(ts)) AS gap_us
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_gaps,
       CAST(SUM(gap_us // 1000000) AS BIGINT) AS total_gap_s
FROM g WHERE gap_us > 48::BIGINT * 3600 * 1000000
GROUP BY user_id ORDER BY user_id
"""


@query("q_stream_heartbeat_gaps", oracle=_GAP_ALERT_ORACLE, tags=("streaming", "stateful"))
def q_stream_heartbeat_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-man's-switch monitoring as a custom stateful operator:
    per-user last-seen timestamp in the state store, an alert row per
    silence > 48 h. Drained with AvailableNow the alerts equal the
    batch lead()-window oracle; integer micro arithmetic keeps gap
    seconds bit-identical."""
    from ..streaming.pipeline import events_stream, heartbeat_gap_alerts, run_to_completion

    ev = events_stream(spark, sf_dir)
    alerts = run_to_completion(
        heartbeat_gap_alerts(ev, threshold_hours=48),
        "stream_gap_alerts_sink",
        output_mode="append",
    )
    return (
        alerts.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_gaps"), F.sum("gap_s").cast("long").alias("total_gap_s"))
        .orderBy("user_id")
    )


_SINK_ORACLE = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events GROUP BY event_type ORDER BY event_type
"""


@query("q_stream_sink_parquet", oracle=_SINK_ORACLE, tags=("streaming", "sink"))
def q_stream_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION sink path: stream -> parquet files + checkpoint
    (exactly-once via the file-sink commit log), where the other
    stream queries use the memory sink. The stream is drained with
    availableNow, then started a SECOND time on the same checkpoint —
    the restart must be a no-op (offsets already committed), so any
    reprocessing would double the counts and fail the oracle hash.
    Reading the sink back goes through the commit log too (only
    committed files count), closing the exactly-once loop."""

    base = scratch_dir(prefix="pas_stream_sink_")
    out, ckpt = f"{base}/out", f"{base}/ckpt"
    for _restart in range(2):
        q = (
            events_stream(spark, sf_dir)
            .select("event_type", "value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        record_drain(q)
    from ..functions.stable import dsum

    back = spark.read.parquet(out)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Streaming windowed top-k: aggregate in the stream, rank on the
# drained sink — the standard "trending items per window" topology.
# --------------------------------------------------------------------------
_STREAM_TOPK_ORACLE = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS win_start, event_type,
         COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY win_start
                               ORDER BY n_events DESC, event_type) AS rk
  FROM hourly
)
SELECT win_start, event_type, n_events, total_value, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 3 ORDER BY win_start, rk
"""


@query("q_stream_topk_per_window", oracle=_STREAM_TOPK_ORACLE, tags=("streaming", "topk"))
def q_stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-items: watermarked tumbling counts maintained BY the
    stream (state = open windows x types, watermark-bounded), top-3
    ranking applied to the drained sink — ranking is not an
    incremental operator (a rank can demote on any late arrival), so
    the correct streaming topology is aggregate-in-stream +
    rank-at-read, exactly what a serving layer does per refresh. The
    post-drain rank is per-window (bounded groups: #event_types)."""
    from pyspark.sql.window import Window

    ev = events_stream(spark, sf_dir)
    res = run_to_completion(
        stream_tumbling_hourly(ev), "stream_topk_sink", output_mode="complete"
    )
    w = Window.partitionBy("win_start").orderBy(F.desc("n_events"), "event_type")
    return (
        res.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("win_start", "rk")
    )


# --------------------------------------------------------------------------
# Streaming CDC apply: foreachBatch keyed upsert into a parquet target.
# --------------------------------------------------------------------------
_UPSERT_STREAM_ORACLE = f"""
WITH last AS (
  SELECT user_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_users,
       {sql_dsum('value')} AS total_value
FROM last WHERE rn = 1
GROUP BY event_type ORDER BY event_type
"""


@query(
    "q_stream_upsert_foreachbatch",
    oracle=_UPSERT_STREAM_ORACLE,
    tags=("streaming", "upsert", "cdc"),
)
def q_stream_upsert_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply — the reference's ``upsert_rows`` merge
    (``redshift.py:386-416``) lifted into Structured Streaming: the
    event stream arrives in paced micro-batches (8 landing files, 2
    per trigger -> 4 real triggers) and ``foreachBatch`` merges each
    batch into a parquet target keyed on user_id, keeping the row
    with the greatest (ts, event_id) — last-write-wins by EVENT time,
    not arrival order, so out-of-order batches converge to the same
    state. foreachBatch is at-least-once; this merge is idempotent
    (max-struct of a set is replay-invariant), which is the standard
    exactly-once-effect recipe for non-transactional sinks.

    Scale shape: each merge is one hash aggregate per batch plus a
    target re-aggregate keyed on user_id — no sort, no window over
    the data path; the target stays one row per user. In production
    the read-merge-rewrite becomes Delta/Iceberg MERGE; the
    batch-local max-struct pre-reduce stays exactly as written."""
    import os
    import shutil

    from ..registry import load_table

    base = scratch_dir(prefix="pas_stream_upsert_")
    landing, target, ckpt = f"{base}/landing", f"{base}/target", f"{base}/ckpt"
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value", "event_type"
    )
    ev.repartition(8).write.mode("overwrite").parquet(landing)

    def _lww(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.max(F.struct("ts", "event_id", "value", "event_type")).alias("s")
        ).select(
            "user_id",
            F.col("s.ts").alias("ts"),
            F.col("s.event_id").alias("event_id"),
            F.col("s.value").alias("value"),
            F.col("s.event_type").alias("event_type"),
        )

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        sp = batch_df.sparkSession
        merged = _lww(batch_df)
        if os.path.isdir(target):
            merged = _lww(sp.read.parquet(target).unionByName(merged))
        # materialize before overwriting the path being read
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(target)

    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    try:
        q = (
            events_stream(spark, sf_dir, max_files_per_trigger=2, path=landing)
            .writeStream.foreachBatch(_apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        record_drain(q)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    final = spark.read.parquet(target)
    out = (
        final.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            dsum("value").alias("total_value"),
        )
        .orderBy("event_type")
        .localCheckpoint(eager=True)  # detach from the temp dir before cleanup
    )
    shutil.rmtree(base, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# Stream-stream LEFT OUTER join: unmatched clicks emit nulls after the
# watermark proves no purchase can arrive.
# --------------------------------------------------------------------------
_OUTER_ORACLE = """
WITH horizon AS (SELECT MAX(ts) AS tmax FROM events),
c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
j AS (
  SELECT c.user_id, c.ts AS c_ts, c.event_id,
         COUNT(p.ts) AS n_purch
  FROM c LEFT JOIN p ON p.user_id = c.user_id
   AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
  GROUP BY c.user_id, c.ts, c.event_id
)
SELECT CAST(SUM(CASE WHEN n_purch > 0 THEN n_purch ELSE 0 END) AS BIGINT) AS n_matched_pairs,
       CAST(SUM(CASE WHEN n_purch = 0
                  AND j.c_ts < h.tmax - INTERVAL 24 HOUR
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_expired_unmatched
FROM j CROSS JOIN horizon h
"""


@query("q_stream_outer_join", oracle=_OUTER_ORACLE, tags=("streaming", "join"))
def q_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the watermark-expiry
    semantics inner joins never exercise: an unmatched click emits a
    null-purchase row only once the watermark passes
    ``click.ts + window`` (proof no match can arrive). Under the
    availableNow drain, unmatched clicks near the end of the feed are
    still awaiting proof and stay in state (the exact eviction point
    is internal to the join's state-watermark analysis — measured
    between 4h and 8h before max(ts) on this feed, not a public
    contract), so BOTH sides count unmatched clicks only when older
    than a 24h safety margin — every such row is provably evicted,
    making the hash comparison robust to the internal boundary.
    Matched pairs emit regardless of watermark timing and are counted
    in full."""
    from ..streaming.pipeline import stream_click_attribution_outer

    ev = events_stream(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    pairs = stream_click_attribution_outer(clicks, purchases)
    drained = run_to_completion(pairs, "stream_outer_sink", output_mode="append")
    from ..registry import load_table

    tmax = load_table(spark, sf_dir, "events").agg(F.max("ts").alias("tmax"))
    return (
        drained.crossJoin(F.broadcast(tmax))
        .agg(
            F.sum(F.when(F.col("purchase_id").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_matched_pairs"),
            F.sum(
                F.when(
                    F.col("purchase_id").isNull()
                    & (F.col("c_ts") < F.col("tmax") - F.expr("INTERVAL 24 HOURS")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_expired_unmatched"),
        )
    )
