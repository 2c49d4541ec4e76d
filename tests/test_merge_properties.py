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


