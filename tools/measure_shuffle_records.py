#!/usr/bin/env python
"""Executed shuffle-exchange metrics of a registry entry — the r15
evidence tool for "shuffle fewer bytes" claims (guide §2.3): walks the
EXECUTED plan after a collect() and prints every shuffle Exchange's
records/bytes written, so a rewrite's shuffled-volume delta can be
stated from metrics instead of node counts (an added WindowGroupLimit
pre-shuffle exchange can RAISE the Exchange count while cutting the
shuffled rows by orders of magnitude).

Usage::

    python tools/measure_shuffle_records.py <entry> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.plans.inspect import _children, _unwrap
from pandas_aws_spark.registry import load_registry
from pandas_aws_spark.session import get_spark


def shuffle_metrics(df) -> list[dict[str, int]]:
    """One ``{metric: value}`` dict per shuffle Exchange in the
    executed plan (ReusedExchange nodes are skipped — their metrics
    live on the original)."""
    out: list[dict[str, int]] = []

    def walk(node) -> None:
        node = _unwrap(node)
        if node.nodeName() == "Exchange":
            mets: dict[str, int] = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                mets[kv._1()] = int(kv._2().value())
            out.append(mets)
        for c in _children(node):
            walk(c)

    walk(df._jdf.queryExecution().executedPlan())
    return out


def main() -> int:
    entry = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    reg = load_registry()
    spark = get_spark(app_name=f"shuffle_metrics_{entry}")
    df = reg[entry].fn(spark, sf_dir)
    df.collect()
    total_rec = total_bytes = 0
    for mets in shuffle_metrics(df):
        rec = mets.get("shuffleRecordsWritten", 0)
        byt = mets.get("shuffleBytesWritten", mets.get("dataSize", 0))
        total_rec += rec
        total_bytes += byt
        print(f"Exchange: records={rec} bytes={byt}")
    print(f"TOTAL shuffle records={total_rec} bytes={total_bytes}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
