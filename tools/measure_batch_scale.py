#!/usr/bin/env python
"""Measure registry queries at two scale points (bench.py protocol:
warm JVM, noop materialization, min of 2 passes).

Usage: python tools/measure_batch_scale.py q_name [q_name ...]
Env: SCALE_BASE (default /root/testdata/sf0.1),
     SCALE_BIG (default /tmp/scale_sf1 — build with make_scale_data.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.registry import load_registry
from pandas_aws_spark.session import get_spark


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: measure_batch_scale.py q_name [q_name ...]")
        return 2
    base = os.environ.get("SCALE_BASE", "/root/testdata/sf0.1")
    big = os.environ.get("SCALE_BIG", "/tmp/scale_sf1")
    reg = load_registry()
    spark = get_spark(app_name="scale")
    # warm-up
    reg[names[0]].fn(spark, base).write.format("noop").mode("overwrite").save()
    for name in names:
        row = {"query": name}
        for label, d in (("base", base), ("big", big)):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                reg[name].fn(spark, d).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            row[label] = round(best, 2)
        row["ratio"] = round(row["big"] / row["base"], 1)
        print(f"{row['query']:34s} base={row['base']:7.2f}s big={row['big']:7.2f}s ratio={row['ratio']:.1f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
