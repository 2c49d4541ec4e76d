#!/usr/bin/env python
"""Run the full oracle-parity check at a chosen scale factor.

Usage: python tools/check_parity.py [sf_dir] [query_name ...]
Defaults to /root/testdata/sf0.01 (the driver's t2 scale) and all queries.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.oracle import check_query, duckdb_connection
from pandas_aws_spark.registry import load_registry
from pandas_aws_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    reg = load_registry()
    selected = {n: reg[n] for n in (names or sorted(reg))}

    spark = get_spark(app_name="parity", master="local[16]", shuffle_partitions=16)
    con = duckdb_connection(sf_dir)
    failures = 0
    for name, spec in selected.items():
        t0 = time.time()
        try:
            res = check_query(spark, con, name, spec.fn, spec.oracle, sf_dir)
        except Exception as exc:  # surface, keep going
            print(f"FAIL  {name}: EXCEPTION {exc}")
            failures += 1
            continue
        dt = time.time() - t0
        status = "ok  " if res.ok else "FAIL"
        if not res.ok:
            failures += 1
        print(f"{status}  {name:40s} {dt:6.2f}s rows={res.spark_rows} {res.detail}")
    print(f"\n{len(selected) - failures}/{len(selected)} queries match at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
