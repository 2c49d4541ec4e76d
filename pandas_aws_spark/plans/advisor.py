"""Plan-shape scale audit — the gate logic from ``tests/test_plans.py``
packaged as a user-facing API.

``scale_audit(df)`` inspects a DataFrame's physical plan and returns
the list of findings a 100 TB reviewer would flag: accidental
cartesians, nested-loop joins, windows funneling unbounded input
through one task, scans that read every column, and shuffle-count
hotspots. Each finding carries a severity so callers can gate CI on
``error`` while logging ``warn``.

This is advisory tooling over ``plans.inspect`` — it never mutates the
plan. The same checks run as hard test gates over every registry query
(tests/test_plans.py); this API brings them to ad-hoc user queries:

    from pandas_aws_spark.plans.advisor import scale_audit
    for f in scale_audit(df):
        print(f.severity, f.rule, f.detail)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from .inspect import join_strategies, num_shuffles, scans, unpartitioned_windows

__all__ = ["Finding", "scale_audit"]


@dataclass
class Finding:
    severity: str  # "error" | "warn" | "info"
    rule: str
    detail: str


def scale_audit(
    df: DataFrame,
    *,
    max_scan_columns: int = 16,
    max_shuffles: int = 8,
    allow_nested_loop: bool = False,
) -> list[Finding]:
    """Audit a DataFrame's physical plan for scale anti-patterns.

    Rules (in severity order):

    * ``cartesian-product`` (error) — a CartesianProduct node multiplies
      its inputs; at cluster scale this is always a bug unless one side
      is a handful of rows, in which case broadcast it explicitly.
    * ``unpartitioned-window`` (error) — a Window with an empty
      partition spec moves ALL data to one task. Bounded inputs
      (scalar counts, limited top-k) are fine; pass the plan line to a
      human to decide, or restructure with the two-phase operators in
      ``operators/twophase``.
    * ``nested-loop-join`` (warn, or error when not allowed) — a
      BroadcastNestedLoopJoin is quadratic per partition; legitimate
      only for deliberate small-side fan-outs (scalar broadcasts, ANN
      scoring passes).
    * ``wide-scan`` (warn) — a file scan reading more than
      ``max_scan_columns`` columns usually means a missing projection
      (column pruning did not reach the source).
    * ``many-shuffles`` (warn) — more than ``max_shuffles`` exchanges;
      look for repartition/groupBy/join chains that could reuse one
      partitioning (bucketing, pre-partitioned joins).
    * ``no-pushed-filters`` (info) — a scan with no pushed filters and
      a wide read; harmless for full-table aggregates, a smell when a
      selective filter exists upstream.
    """
    findings: list[Finding] = []

    js = join_strategies(df)
    if js.get("CartesianProduct", 0):
        findings.append(
            Finding(
                "error",
                "cartesian-product",
                f"{js['CartesianProduct']} CartesianProduct node(s): every pair of "
                "input rows is materialized — broadcast the small side or add the "
                "missing join key",
            )
        )
    if js.get("BroadcastNestedLoopJoin", 0):
        findings.append(
            Finding(
                "warn" if allow_nested_loop else "error",
                "nested-loop-join",
                f"{js['BroadcastNestedLoopJoin']} BroadcastNestedLoopJoin node(s): "
                "quadratic per partition — fine for one-row scalar broadcasts and "
                "deliberate ANN fan-outs, a bug otherwise",
            )
        )

    for line in unpartitioned_windows(df):
        findings.append(
            Finding(
                "error",
                "unpartitioned-window",
                "window with empty partition spec funnels its whole input through "
                f"ONE task: {line[:160]}",
            )
        )

    for s in scans(df):
        if len(s.columns) > max_scan_columns:
            findings.append(
                Finding(
                    "warn",
                    "wide-scan",
                    f"scan {s.location[:80]} reads {len(s.columns)} columns — "
                    "add a projection so pruning reaches the source",
                )
            )
        elif not s.pushed_filters or s.pushed_filters == "[]":
            findings.append(
                Finding(
                    "info",
                    "no-pushed-filters",
                    f"scan {s.location[:80]} pushes no filters (fine for full scans)",
                )
            )

    n = num_shuffles(df)
    if n > max_shuffles:
        findings.append(
            Finding(
                "warn",
                "many-shuffles",
                f"{n} shuffle exchanges (> {max_shuffles}) — consider bucketing or "
                "reusing one partitioning across stages",
            )
        )

    order = {"error": 0, "warn": 1, "info": 2}
    findings.sort(key=lambda f: order[f.severity])
    return findings
