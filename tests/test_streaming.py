"""Structured Streaming: batch/stream equivalence + multi-trigger state.

The key property: chopping the same events into N triggers must yield
the same final answer as one trigger (and as the batch query) — that's
what proves the state handling is correct, not just that one big batch
happens to work.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_aws_spark.functions.stable import dsum
from pandas_aws_spark.registry import load_table
from pandas_aws_spark.streaming.pipeline import (
    events_stream,
    run_to_completion,
    stream_tumbling_hourly,
    user_running_totals,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory) -> str:
    """Events table re-written as 4 parquet files, so maxFilesPerTrigger=1
    forces a 4-trigger replay through the state store."""
    out = str(tmp_path_factory.mktemp("events_stream") / "events")
    ev = load_table(spark, SF_SMOKE, "events")
    # keep the raw ns-long ts shape the stream source expects
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    raw.repartition(4).write.mode("overwrite").parquet(out)
    assert ev.count() == spark.read.parquet(out).count()
    return out


def test_tumbling_stream_equals_batch(spark, sf_dir):
    ev = events_stream(spark, sf_dir)
    got = (
        run_to_completion(stream_tumbling_hourly(ev), "t_tumble_sink", "complete")
        .orderBy("win_start", "event_type")
        .toPandas()
    )
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events", "total_value")
        .orderBy("win_start", "event_type")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, want)


def test_running_totals_fold_across_triggers(spark, split_events_dir, sf_dir):
    """4 files, one per trigger: cumulative state must end at the batch
    GROUP BY totals regardless of how the stream was paced."""
    ev = events_stream(spark, sf_dir, max_files_per_trigger=1, path=split_events_dir)
    snaps = run_to_completion(user_running_totals(ev), "t_running_sink", "update")
    final = (
        snaps.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_micros", "n_events").alias("total_micros"),
        )
        .orderBy("user_id")
        .toPandas()
    )
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("total_micros"),
        )
        .orderBy("user_id")
        .toPandas()
    )
    # snapshots-per-trigger: at least one user must have emitted >1 snapshot
    n_snapshots = snaps.count()
    assert n_snapshots > len(want), "expected multiple snapshots across 4 triggers"
    pd.testing.assert_frame_equal(final, want)


def test_watermark_drops_late_events(spark, tmp_path):
    """Append mode + 10-min watermark: an event arriving a full
    watermark behind the stream's max event time must be dropped, and
    only watermark-closed windows emit. This is the state-bounding
    behavior that keeps the store finite at production volume."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tmp_path / "late_events"
    base.mkdir()
    hour = 3_600_000_000_000  # ns
    t0 = 1_600_000_000 * 1_000_000_000  # fixed epoch base

    def write(name, rows, mtime):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["e"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        p = str(base / name)
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    now = _time.time()
    # trigger 1: on-time events in the 10h and 11h windows
    write("f1.parquet", [(1, t0 + 10 * hour), (2, t0 + 11 * hour)], now - 90)
    # trigger 2: fresh event advances the watermark past the 10h/11h
    # windows (data-late filtering applies the watermark one trigger
    # after it advances, so the late arrival goes in a third trigger)
    write("f2.parquet", [(3, t0 + 13 * hour)], now - 60)
    # trigger 3: a 4h-late event aimed at the long-closed 9h window
    write("f3.parquet", [(4, t0 + 9 * hour)], now - 30)

    ev = events_stream(spark, str(base), max_files_per_trigger=1, path=str(base))
    res = run_to_completion(
        stream_tumbling_hourly(ev, watermark="10 minutes"), "t_late_sink", "append"
    ).toPandas()

    # hourly windows are epoch-aligned; map each event to its window start
    def win_start(ts_ns):
        return ts_ns - (ts_ns % hour)

    starts = {int(t.timestamp() * 1e9) for t in res["win_start"]}
    assert win_start(t0 + 10 * hour) in starts, "on-time window must emit"
    assert win_start(t0 + 11 * hour) in starts, "on-time window must emit"
    assert win_start(t0 + 9 * hour) not in starts, "late event must be dropped by the watermark"
    assert win_start(t0 + 13 * hour) not in starts, "window past the final watermark stays open"
    assert len(res) == 2


def test_checkpoint_resume_exactly_once(spark, tmp_path):
    """File sink + checkpoint: a second availableNow run after new data
    arrives must process ONLY the new files (no reprocessing, no loss)
    — the exactly-once contract that makes the pipeline restartable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write(name, ids):
        tbl = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array([1_600_000_000_000_000_000 + i for i in ids], pa.int64()),
                "user_id": pa.array([1] * len(ids), pa.int64()),
                "event_type": pa.array(["e"] * len(ids)),
                "value": pa.array([1.0] * len(ids)),
                "props": pa.array(["{}"] * len(ids)),
            }
        )
        pq.write_table(tbl, str(src / name))

    def run_once():
        ev = events_stream(spark, str(src), path=str(src))
        q = (
            ev.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write("a.parquet", [1, 2, 3])
    run_once()
    assert spark.read.parquet(sink).count() == 3
    write("b.parquet", [4, 5])
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == 5, "restart must add only the new file's rows"
    assert {r["event_id"] for r in out.collect()} == {1, 2, 3, 4, 5}


def test_stream_dedup_folds_across_triggers(spark, tmp_path):
    """Documents split into 4 files, one per trigger: per-hash state
    must keep the GLOBAL min doc_id and total copies regardless of
    which trigger each copy arrived in."""
    from pandas_aws_spark.streaming.pipeline import documents_stream, stream_exact_dedup

    out = str(tmp_path / "docs4")
    raw = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    raw.repartition(4).write.mode("overwrite").parquet(out)

    snaps = run_to_completion(
        stream_exact_dedup(documents_stream(spark, SF_SMOKE, max_files_per_trigger=1, path=out)),
        "t_sdedup_sink",
        "update",
    )
    final = (
        snaps.groupBy("content_hash")
        .agg(
            F.max_by("kept_id", "n_copies").alias("kept_id"),
            F.max("n_copies").alias("n_copies"),
        )
        .orderBy("content_hash")
        .toPandas()
    )
    want = (
        raw.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("kept_id"), F.count("*").alias("n_copies"))
        .orderBy("content_hash")
        .toPandas()
    )
    pd.testing.assert_frame_equal(final, want)


def test_stream_upsert_foreachbatch(spark, tmp_path):
    """Micro-batch keyed upsert into a catalog table: after draining a
    2-trigger stream where trigger 2 overwrites one key, the table
    holds last-write-wins rows — the CDC-apply topology end-to-end."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pandas_aws_spark.streaming.pipeline import stream_upsert_to_table
    from pandas_aws_spark.warehouse import WarehouseClient

    src = tmp_path / "cdc"
    src.mkdir()

    def write(name, rows, mtime_off):
        import os
        import time as _t

        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array(["s"] * len(rows)),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        )
        p = str(src / name)
        pq.write_table(tbl, p)
        os.utime(p, (_t.time() + mtime_off,) * 2)

    write("b1.parquet", [(1, "one"), (2, "two")], -60)
    write("b2.parquet", [(2, "two-updated"), (3, "three")], 0)

    from pandas_aws_spark.streaming.pipeline import documents_stream

    wh = WarehouseClient(spark, warehouse_dir=str(tmp_path / "wh"))
    seed = spark.createDataFrame([(0, "zero", "en", "s", 4)], "doc_id long, text string, lang string, source string, n_chars long")
    wh.upload(seed, "cdc_target", mode="overwrite", include_date_insert=False)

    stream = documents_stream(spark, str(src), max_files_per_trigger=1, path=str(src))
    stream_upsert_to_table(stream, wh, "cdc_target", ["doc_id"], str(tmp_path / "ck"))

    got = {r["doc_id"]: r["text"] for r in spark.table("cdc_target").collect()}
    assert got == {0: "zero", 1: "one", 2: "two-updated", 3: "three"}


def test_stream_stream_join_across_triggers(spark, split_events_dir, sf_dir):
    """Stream-stream interval join under a 4-trigger paced replay:
    click and purchase sides arrive interleaved across triggers, so
    matches require the join state store to buffer one side until the
    other arrives in a LATER trigger — then the drained total must
    still equal the batch self-join."""
    from pandas_aws_spark.streaming.pipeline import stream_click_attribution

    ev = events_stream(spark, sf_dir, max_files_per_trigger=1, path=split_events_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    # the 4 replay files each span the whole month (round-robin
    # split), so a short watermark would late-drop most of triggers
    # 2-4; a 40-day delay keeps every row live while still forcing
    # cross-trigger buffering in the join state store
    pairs = stream_click_attribution(clicks, purchases, watermark="960 hours")
    drained = run_to_completion(pairs, "t_attrib_paced_sink", output_mode="append")

    e = load_table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("ts").alias("cts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("ts").alias("pts")
    )
    want = c.join(
        p,
        (c.u == p.u)
        & (F.col("cts") < F.col("pts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
    ).count()
    assert drained.count() == want


def test_events_stream_starts_on_empty_landing_dir(spark, tmp_path):
    """A stream must be constructible before any data lands (the reason
    file sources take explicit schemas): an empty landing directory
    falls back to the nanos-as-long raw schema instead of letting the
    footer probe's batch read raise."""
    from pyspark.sql import types as T

    landing = tmp_path / "landing"
    landing.mkdir()
    ev = events_stream(spark, sf_dir=str(tmp_path), path=str(landing))
    assert ev.isStreaming
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)


def test_micros_events_read_is_timezone_independent(spark, tmp_path):
    """NTZ-micros and adjusted-to-UTC-micros events files must yield
    the same instants as the nanos source under ANY session timezone
    (a bare NTZ->timestamp cast would shift instants off-UTC)."""
    src = load_table(spark, SF_SMOKE, "events")
    base = [
        r.us
        for r in src.selectExpr("unix_micros(ts) AS us").orderBy("event_id").limit(50).collect()
    ]
    ntz_dir = tmp_path / "ntz"
    ntz_dir.mkdir()
    src.withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.parquet(
        str(ntz_dir / "events.parquet")
    )
    utc_dir = tmp_path / "utc"
    utc_dir.mkdir()
    src.write.parquet(str(utc_dir / "events.parquet"))

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        for d in (ntz_dir, utc_dir):
            got = [
                r.us
                for r in load_table(spark, str(d), "events")
                .selectExpr("unix_micros(ts) AS us")
                .orderBy("event_id")
                .limit(50)
                .collect()
            ]
            assert got == base, f"instant shift reading {d.name} under non-UTC session"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
