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

from pyspark.sql.streaming import StreamingQueryListener

from pandas_aws_spark.registry import load_registry
from pandas_aws_spark.session import get_spark


class StateListener(StreamingQueryListener):
    """Track the peak state rows/bytes any progress event reports."""

    def __init__(self) -> None:
        self.peak_rows = 0
        self.peak_bytes = 0

    def reset(self) -> None:
        self.peak_rows = 0
        self.peak_bytes = 0

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        ops = event.progress.stateOperators
        self.peak_rows = max(self.peak_rows, sum(o.numRowsTotal for o in ops))
        self.peak_bytes = max(self.peak_bytes, sum(o.memoryUsedBytes for o in ops))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="stream-scale", master=f"local[{cpus}]")
    listener = StateListener()
    spark.streams.addListener(listener)

    reg = load_registry()
    stream_qs = sorted(n for n in reg if n.startswith("q_stream_"))
    # warm the JVM/codegen once on the smallest stream
    reg[stream_qs[0]].fn(spark, base).collect()

    results = {}
    for name in stream_qs:
        row = {}
        for label, sf_dir in (("base", base), ("big", big)):
            listener.reset()
            t0 = time.time()
            n = reg[name].fn(spark, sf_dir).count()
            row[label] = {
                "sec": round(time.time() - t0, 2),
                "rows": n,
                "state_rows": listener.peak_rows,
                "state_mb": round(listener.peak_bytes / 1e6, 1),
            }
        row["ratio"] = round(row["big"]["sec"] / row["base"]["sec"], 2)
        results[name] = row
        print(name, json.dumps(row), flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
