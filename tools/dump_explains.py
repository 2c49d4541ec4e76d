#!/usr/bin/env python
"""Write ``.explain('formatted')`` of selected registry entries to
``plans/<tag>/<query>_<suffix>.txt`` — the committed evidence for the
r15 optimization round's plan claims (judge-checkable without Spark).

Usage::

    python tools/dump_explains.py <tag> <suffix> [sf_dir] [query ...]

Defaults: sf_dir=/root/testdata/sf0.001, queries = the 12 headline
entries plus every entry in the registry's _REWRITTEN_THIS_ROUND map.
Lifecycle entries execute their side effects while the plan is built
(same as the bench); the captured plan is the entry's RETURNED frame —
the one the driver hashes.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.registry import load_registry
from pandas_aws_spark.session import get_spark


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.001"
    names = rest[1:] if rest and os.path.isdir(rest[0]) else rest
    reg = load_registry()
    if not names:
        from pandas_aws_spark.registry import _REWRITTEN_THIS_ROUND

        names = sorted(
            {n for n, s in reg.items() if s.headline} | set(_REWRITTEN_THIS_ROUND)
        )
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"explains_{tag}_{suffix}")
    for name in names:
        try:
            df = reg[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"ERROR building plan: {exc}\n"
        with io.open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
