#!/usr/bin/env python
"""Measure every q_stream_* query at two scale points and report
runtime ratio + peak state-store size (rows / bytes), for SCALE.md.

Streaming is where 10x data bites differently from batch: state grows
with keys in flight (sessions, dedup hashes, running totals), and a
state blowup shows up here long before a cluster OOMs. A Python
StreamingQueryListener records per-query stateOperators totals.

Usage: python tools/measure_stream_scale.py [base_dir] [big_dir]
Defaults: /root/testdata/sf0.1 vs /tmp/scale_sf1 (make_scale_data.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.registry import load_registry
from pandas_aws_spark.session import get_spark
from pandas_aws_spark.streaming import pipeline as stream_pipeline


def _drain_peaks() -> tuple[int, int]:
    """Peak state rows/bytes across every batch of the drains recorded
    since the last clear — read from the terminated queries' own
    recentProgress (authoritative, synchronous), NOT from an async
    StreamingQueryListener whose events can arrive after a fast drain
    finishes and silently report 0 (the SCALE.md 'listener sampled no
    peak' footnotes this tool used to produce)."""
    peak_rows = peak_bytes = 0
    for _name, p in stream_pipeline.RECENT_DRAIN_PROGRESS:
        ops = p.get("stateOperators") or []
        peak_rows = max(peak_rows, sum(o.get("numRowsTotal", 0) for o in ops))
        peak_bytes = max(peak_bytes, sum(o.get("memoryUsedBytes", 0) for o in ops))
    return peak_rows, peak_bytes


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="stream-scale", master=f"local[{cpus}]")
    # recentProgress is truncated to the last N updates (default 100);
    # a drain with more micro-batches would silently drop the earliest
    # batches' state peaks — the same underreport the listener-based
    # tool had. Raise retention far above any drain's batch count.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")

    reg = load_registry()
    stream_qs = sorted(n for n in reg if n.startswith("q_stream_"))
    # warm the JVM/codegen once on the smallest stream
    reg[stream_qs[0]].fn(spark, base).collect()

    results = {}
    for name in stream_qs:
        row = {}
        for label, sf_dir in (("base", base), ("big", big)):
            stream_pipeline.RECENT_DRAIN_PROGRESS.clear()
            t0 = time.time()
            n = reg[name].fn(spark, sf_dir).count()
            peak_rows, peak_bytes = _drain_peaks()
            row[label] = {
                "sec": round(time.time() - t0, 2),
                "rows": n,
                "state_rows": peak_rows,
                "state_mb": round(peak_bytes / 1e6, 1),
            }
        row["ratio"] = round(row["big"]["sec"] / row["base"]["sec"], 2)
        results[name] = row
        print(name, json.dumps(row), flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
