"""Physical-plan inspection — make scale properties testable.

The 100 TB design rules (SURVEY.md §4, BASELINE.md north star) are
plan-shape properties: small dims must broadcast, filters must reach
the parquet scan, projections must prune columns, hot paths must stay
inside whole-stage codegen, and nothing may cartesian-join by
accident. This module extracts those facts from a DataFrame's executed
plan so ``tests/test_plans.py`` can regression-gate them — a plan that
silently degrades to a sort-merge join or a full-column scan fails CI
before it fails a cluster.

Built on the public ``df.explain`` machinery (``queryExecution`` via
the py4j bridge, same strings ``EXPLAIN FORMATTED`` prints).
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "formatted_plan",
    "join_strategies",
    "num_shuffles",
    "scans",
    "ScanInfo",
    "codegen_ids",
    "unpartitioned_windows",
    "bnlj_build_side_rows",
    "assert_broadcast_only",
    "assert_pushed_filter",
    "assert_max_scan_columns",
]


def physical_plan(df: DataFrame) -> str:
    """Executed (post-AQE-planning) physical plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """The ``EXPLAIN FORMATTED`` text (scan details incl. PushedFilters)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def join_strategies(df: DataFrame) -> Counter:
    """Count physical join nodes by strategy name."""
    plan = physical_plan(df)
    return Counter(
        {
            k: plan.count(k)
            for k in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if plan.count(k)
        }
    )


def num_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (each is a full
    repartition of its input — the unit of cost to minimize). Counts
    hash, range, AND round-robin (``repartition(n)``) exchanges —
    round-robin moves every row just like the others."""
    plan = physical_plan(df)
    return (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange RoundRobinPartitioning")
    )


@dataclass
class ScanInfo:
    location: str = ""
    pushed_filters: str = ""
    read_schema: str = ""
    columns: list[str] = field(default_factory=list)


def scans(df: DataFrame) -> list[ScanInfo]:
    """One entry per file scan: its path, pushed filters, read schema."""
    out: list[ScanInfo] = []
    cur: ScanInfo | None = None
    for raw in formatted_plan(df).splitlines():
        line = raw.strip()
        if line.startswith("(") and "Scan " in line:
            cur = ScanInfo()
            out.append(cur)
        elif cur is not None:
            if line.startswith("Location:"):
                cur.location = line.split(":", 1)[1].strip()
            elif line.startswith("PushedFilters:"):
                cur.pushed_filters = line.split(":", 1)[1].strip()
            elif line.startswith("ReadSchema:"):
                cur.read_schema = line.split(":", 1)[1].strip()
                cur.columns = re.findall(r"(\w+):", cur.read_schema)
    return out


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partition spec — each one funnels its
    whole input through a single task (``WindowExec: No Partition
    Defined`` at runtime). Returns the offending plan lines so tests
    can gate them: safe only over provably bounded inputs.

    Parse rule (see the node's ``toString``): a Window line prints
    ``Window [exprs], [partitionSpec], [orderSpec]`` — three top-level
    bracket groups when partitioned. Two groups is either global-
    ordered (second group carries ASC/DESC sort markers -> flag) or
    partition-only (no markers -> fine); one group is a global
    unordered frame (flag).
    """
    out = []
    for line in physical_plan(df).splitlines():
        m = re.match(r"^[\s:+\-*()\d]*Window (\[.*)$", line)
        if not m or "WindowGroupLimit" in line:
            continue
        # split the tail into top-level [...] groups
        groups, depth, start = [], 0, None
        for i, ch in enumerate(m.group(1)):
            if ch == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(m.group(1)[start : i + 1])
        if len(groups) >= 3:
            continue  # partitioned
        if len(groups) == 2 and not re.search(r" (ASC|DESC) ", groups[1]):
            continue  # partition spec without order — still partitioned
        out.append(line.strip())
    return out


def codegen_ids(df: DataFrame) -> set[int]:
    """Distinct WholeStageCodegen span ids — wider spans = fewer
    interpreted boundaries in the hot path.

    Under AQE the pre-execution plan is an unfinalized
    ``AdaptiveSparkPlan`` with no codegen annotation, so materialize
    once (executor-side noop sink) to get the final plan.
    """
    plan = physical_plan(df)
    if "isFinalPlan=false" in plan:
        # must execute *this* DataFrame's queryExecution (a write sink
        # would plan a fresh one and leave this plan unfinalized)
        df.collect()
        plan = physical_plan(df)
    # spans print as "WholeStageCodegen (N)" in formatted mode and as
    # the "*(N)" operator prefix in simple/executed plan strings
    return {int(m) for m in re.findall(r"WholeStageCodegen \((\d+)\)", plan)} | {
        int(m) for m in re.findall(r"\*\((\d+)\)", plan)
    }


# --- assertion helpers (used by tests) -------------------------------------


def assert_broadcast_only(df: DataFrame) -> None:
    """Every join in the plan must be a broadcast hash join (no big-big
    shuffle joins snuck in)."""
    js = join_strategies(df)
    bad = {k: v for k, v in js.items() if k != "BroadcastHashJoin"}
    assert not bad, f"non-broadcast joins in plan: {bad}"


def assert_pushed_filter(df: DataFrame, table_substr: str, filter_substr: str) -> None:
    """The scan whose location contains ``table_substr`` must push a
    filter containing ``filter_substr`` down to parquet."""
    for s in scans(df):
        if table_substr in s.location:
            assert filter_substr in s.pushed_filters, (
                f"scan {s.location}: expected pushed filter {filter_substr!r}, "
                f"got {s.pushed_filters!r}"
            )
            return
    raise AssertionError(f"no scan matching {table_substr!r} in plan")


def assert_max_scan_columns(df: DataFrame, table_substr: str, max_cols: int) -> None:
    """Column pruning: the scan must read at most ``max_cols`` columns."""
    for s in scans(df):
        if table_substr in s.location:
            assert len(s.columns) <= max_cols, (
                f"scan {s.location} reads {len(s.columns)} cols "
                f"({s.columns}), expected <= {max_cols}"
            )
            return
    raise AssertionError(f"no scan matching {table_substr!r} in plan")


def _children(node):
    """py4j Seq -> list of child SparkPlan nodes."""
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


def _unwrap(node):
    """Strip AQE wrappers (AdaptiveSparkPlan, *QueryStage) so walkers
    see the finalized physical nodes. ReusedExchange is deliberately
    NOT unwrapped here — whether to follow it differs per walker
    (bnlj_build_side_rows reads the original exchange's metric through
    it; scan_output_rows must not re-count a shared scan)."""
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        return _unwrap(node.executedPlan())
    if "QueryStage" in name:
        return _unwrap(node.plan())
    return node


def bnlj_build_side_rows(df: DataFrame) -> list[int]:
    """Executed row count of the BROADCAST (build) side of every
    BroadcastNestedLoopJoin in the plan — executable proof that an
    allowlisted NLJ really broadcasts the tiny side it claims to
    (a 1-row scalar aggregate, a dims-squared pair table), not a
    corpus-sized input.

    Executes the DataFrame via ``collect()`` (a write sink would plan
    a FRESH QueryExecution and leave this one's metrics at zero), then
    walks the finalized adaptive plan over py4j, unwrapping
    ``AdaptiveSparkPlan``/``QueryStage`` wrappers, and reads the
    ``numOutputRows`` metric of the ``BroadcastExchange`` at the root
    of each BNLJ's build side. Returns one count per BNLJ node.
    """
    df.collect()
    root = df._jdf.queryExecution().executedPlan()

    def exchange_rows(node) -> int | None:
        node = _unwrap(node)
        if node.nodeName() == "BroadcastExchange":
            return int(node.metrics().apply("numOutputRows").value())
        if node.nodeName() == "ReusedExchange":
            # reuses another stage's BroadcastExchange — the original
            # (with the real metrics) is its child
            return exchange_rows(node.child())
        for c in _children(node):
            r = exchange_rows(c)
            if r is not None:
                return r
        return None

    out: list[int] = []

    def walk(node) -> None:
        node = _unwrap(node)
        if "BroadcastNestedLoopJoin" in node.nodeName():
            side = node.buildSide().toString()
            cs = _children(node)
            build = cs[0] if "Left" in side else cs[1]
            rows = exchange_rows(build)
            assert rows is not None, "BNLJ build side has no BroadcastExchange"
            out.append(rows)
        for c in _children(node):
            walk(c)

    walk(root)
    return out


def scan_output_rows(df: DataFrame, path_substr: str = "") -> list[tuple[str, int]]:
    """Executed ``(scan description, numOutputRows)`` of every file scan
    whose node string contains ``path_substr`` — the rows a scan
    ACTUALLY produced after parquet row-group skipping, which is what
    the cell-clustered layout + literal ``cell IN (...)`` pushdown
    claims to shrink. Plan-string tests cannot see this: a pushed
    ``In(cell, ...)`` prints identically whether the reader keeps the
    literal set or (past ``spark.sql.parquet.pushdown.
    inFilterThreshold``) silently degrades it to the [min,max] envelope
    and reads everything — the r14 judge's measured cliff. Executes via
    ``collect()`` (same caveat as :func:`bnlj_build_side_rows`: a write
    sink would plan a fresh QueryExecution and leave these metrics at
    zero), then walks the finalized adaptive plan reading each matching
    leaf scan's metric. SQL metrics are accumulators shared across
    re-executions of the same DataFrame, so call this ONCE per frame
    and filter the returned descriptions — a second call re-runs the
    job and double-counts."""
    df.collect()
    root = df._jdf.queryExecution().executedPlan()
    out: list[tuple[str, int]] = []
    seen: set[int] = set()

    def describe(node) -> str:
        # the rendered plan string truncates each metadata value to
        # spark.sql.maxMetadataStringLength (default 100) — long temp
        # paths cut the trailing ".../vectors" off the Location — so
        # read the file index's root paths directly when available
        try:
            paths = node.relation().location().rootPaths()
            locs = " ".join(
                paths.apply(i).toString() for i in range(paths.size())
            )
        except Exception:
            locs = ""
        return f"{node.nodeName()} {locs}".strip()

    def walk(node) -> None:
        node = _unwrap(node)
        if node.nodeName() == "ReusedExchange":
            # a reused exchange points back at a stage already visited
            # elsewhere in the tree; its scan's metric is a SHARED
            # accumulator, so following it would double-count the same
            # scan (r15 review finding) — the dedupe below keeps the
            # traversal safe either way
            node = _unwrap(node.child())
        nid = int(node.id())
        if nid in seen:
            return
        seen.add(nid)
        if node.nodeName().startswith("Scan "):
            desc = describe(node)
            if path_substr in desc:
                out.append(
                    (desc, int(node.metrics().apply("numOutputRows").value()))
                )
            return
        for c in _children(node):
            walk(c)

    walk(root)
    return out
