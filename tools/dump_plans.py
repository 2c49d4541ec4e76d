#!/usr/bin/env python
"""Dump every registry entry's optimized logical + physical plan string
to a JSON file — used to enumerate exactly which entries a cross-cutting
operator change rewrites (the mechanical source for _REWRITTEN_THIS_ROUND).

Usage: python tools/dump_plans.py out.json [sf_dir]
Side-effecting entries (io/warehouse/stream writers) still only BUILD
plans here; nothing is executed.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.registry import load_registry
from pandas_aws_spark.session import get_spark


def main() -> int:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="dump-plans")
    plans: dict[str, str] = {}
    for name, spec in sorted(load_registry().items()):
        try:
            df = spec.fn(spark, sf_dir)
            plans[name] = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            plans[name] = f"ERROR: {exc}"
    with open(out_path, "w") as fh:
        json.dump(plans, fh)
    print(f"{len(plans)} plans -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
