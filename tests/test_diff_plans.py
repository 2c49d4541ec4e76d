"""Plan-diff normalization semantics (tools/diff_plans.py) — the
mechanical source for _REWRITTEN_THIS_ROUND. r9 ADVICE (medium): the
old normalization was aggressive enough to MASK real rewrites; these
pin that rendering noise still cancels while genuine plan changes
still diff. Pure string tests — no Spark session."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "diff_plans",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools", "diff_plans.py"),
)
diff_plans = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and diff_plans)
normalize = diff_plans.normalize


def test_expression_ids_and_lambda_counters_cancel():
    a = "Project [transform(v#288, lambdafunction((x_12#301 * 2), x_12#301, false))]"
    b = "Project [transform(v#955, lambdafunction((x_47#990 * 2), x_47#990, false))]"
    assert normalize(a) == normalize(b)


def test_distinct_real_columns_do_not_collapse():
    """The old blanket `name_\\d+` -> `name_N` rule rendered a rewrite
    that swapped col_1 for col_2 as 'unchanged'. Long names never
    collapse; short ones still diff via their distinct counters when
    they are genuinely different columns in the SAME plan position."""
    a = "Project [metric_1#12, metric_2#13]"
    b = "Project [metric_2#12, metric_1#13]"
    assert normalize(a) != normalize(b)


def test_numeric_literal_change_on_aggregate_line_is_a_rewrite():
    """Old code blanked EVERY integer on Aggregate lines, so a literal
    threshold change diffed as unchanged."""
    a = "Aggregate [k#1], [sum(x#2) FILTER (WHERE (y#3 > 5)) AS s#4]"
    b = "Aggregate [k#1], [sum(x#2) FILTER (WHERE (y#3 > 7)) AS s#4]"
    assert normalize(a) != normalize(b)


def test_expand_gid_permutation_cancels():
    """Grouping-set runs permute BOTH the projection order and the gid
    tag values between processes (same-commit double-dump control);
    neither is a plan property."""
    a = "Expand [[a#1, null, 0], [null, b#2, 1]], [a#3, b#4, gid#5]"
    b = "Expand [[null, b#9, 0], [a#8, null, 1]], [a#6, b#7, gid#5]"
    assert normalize(a) == normalize(b)


def test_expand_non_gid_literal_still_diffs():
    """Only the TRAILING gid slot is blanked — a literal elsewhere in
    the projection keeps counting."""
    a = "Expand [[(a#1 + 5), null, 0]], [a#3, gid#5]"
    b = "Expand [[(a#1 + 9), null, 0]], [a#3, gid#5]"
    assert normalize(a) != normalize(b)


def test_scratch_paths_cancel():
    a = "FileScan parquet [id#1] ... Location: /tmp/pandas_aws_spark_ann_index_abc123/gen-000001/codes"
    b = "FileScan parquet [id#1] ... Location: /tmp/pandas_aws_spark_ann_index_zzz999/gen-000002/codes"
    assert normalize(a) == normalize(b)


def test_audit_trail_records_canonicalized_lines():
    audit: list[str] = []
    normalize("Expand [[a#1, 0]], [a#2, gid#3]", audit)
    assert audit and "Expand" in audit[0]
    # untouched lines leave no trail
    audit2: list[str] = []
    normalize("Project [a#1]", audit2)
    assert audit2 == []


def test_expand_leading_tag_permutation_cancels():
    """Pivot/multi-agg Expand shapes LEAD with the tag integer (the
    same-HEAD double-dump control caught q_profile_orders pairing tags
    to different columns across processes)."""
    a = "Expand [[0, null, a#1], [1, null, b#2], [2, null, c#3]], [t#4, x#5]"
    b = "Expand [[0, null, a#1], [1, null, c#3], [2, null, b#2]], [t#4, x#5]"
    assert normalize(a) == normalize(b)
