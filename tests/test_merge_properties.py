"""Property-based check of the upsert merge semantics (SURVEY §3.4):
for ANY target and update set,

* result keys = (target keys - update keys) + all update rows,
* every update row lands (duplicate keys in the update set included —
  the reference's INSERT-all-staged-rows behavior),
* untouched target rows survive byte-identically.

Hypothesis drives the row sets; examples are kept small because each
example is a real Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pandas_aws_spark.warehouse import WarehouseClient

_row = st.tuples(st.integers(min_value=0, max_value=9), st.text("abc", min_size=1, max_size=3))
_rows = st.lists(_row, min_size=0, max_size=8)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(target_rows=_rows, update_rows=_rows)
def test_merge_semantics_hold_for_any_sets(spark, target_rows, update_rows):
    target = spark.createDataFrame(target_rows or [(99, "zz")], "pk long, payload string")
    if not target_rows:
        target = target.filter("pk < 0")  # truly empty, schema kept
    updates = spark.createDataFrame(update_rows or [(99, "zz")], "pk long, payload string")
    if not update_rows:
        updates = updates.filter("pk < 0")

    merged = sorted(
        tuple(r) for r in WarehouseClient.merge_frames(target, updates, ["pk"]).collect()
    )

    upd_keys = {r[0] for r in update_rows}
    expected = sorted([r for r in target_rows if r[0] not in upd_keys] + update_rows)
    assert merged == expected




# --------------------------------------------------------------------------
# SCD2 invariants: for ANY change log, exactly one current version per
# key, ranges chain without overlap, and every change appears once.
# --------------------------------------------------------------------------
_ts = st.integers(min_value=0, max_value=20)
_change = st.tuples(st.integers(min_value=0, max_value=3), _ts)
_changes = st.lists(_change, min_size=1, max_size=10, unique=True)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(changes=_changes)
def test_scd2_build_invariants(spark, changes):
    import datetime

    from pandas_aws_spark.operators.scd import scd2_build

    rows = [
        (k, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=t), i)
        for i, (k, t) in enumerate(changes)
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, seq int")
    hist = scd2_build(df, ["k"], "ts", ["seq"]).collect()
    assert len(hist) == len(rows)  # every change becomes one version
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r.k, []).append(r)
    for k, vs in by_key.items():
        assert sum(1 for v in vs if v.is_current) == 1  # exactly one open version
        vs.sort(key=lambda v: (v.valid_from, v.seq))
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from  # ranges chain, no gaps/overlap
        assert vs[-1].valid_to is None


# --------------------------------------------------------------------------
# diff_tables partitions the key universe: every key lands in exactly
# one class, and the class is the correct one.
# --------------------------------------------------------------------------
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(left_rows=_rows, right_rows=_rows)
def test_diff_tables_partitions_key_universe(spark, left_rows, right_rows):
    from pandas_aws_spark.operators.reconcile import diff_tables

    left_rows = list({r[0]: r for r in left_rows}.values())  # unique keys
    right_rows = list({r[0]: r for r in right_rows}.values())
    left = spark.createDataFrame(left_rows or [(99, "zz")], "k long, v string")
    if not left_rows:
        left = left.filter("k < 0")
    right = spark.createDataFrame(right_rows or [(99, "zz")], "k long, v string")
    if not right_rows:
        right = right.filter("k < 0")

    out = {r.k: r.diff_class for r in diff_tables(left, right, ["k"], ["v"]).collect()}
    lmap, rmap = dict(left_rows), dict(right_rows)
    assert set(out) == set(lmap) | set(rmap)
    for k, cls in out.items():
        if k in lmap and k not in rmap:
            assert cls == "removed"
        elif k not in lmap and k in rmap:
            assert cls == "added"
        elif lmap[k] == rmap[k]:
            assert cls == "unchanged"
        else:
            assert cls == "changed"
