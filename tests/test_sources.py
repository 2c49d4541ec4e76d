"""JDBC partition planning (sources/jdbc.py) — pure-logic tests.

No warehouse exists in the container; what matters is the partition
plan (the slice SQL each executor would run), which is deterministic
and testable offline.
"""

from __future__ import annotations

import pytest

from pandas_aws_spark.sources.jdbc import JdbcPartitionPlan, plan_partitions


def test_plan_sizing_matches_fetch_size_role():
    p = plan_partitions(0, 10_000_000, target_rows_per_partition=1_000_000,
                        total_rows=10_000_000, column="id")
    assert p.num_partitions == 10
    assert p.as_options() == {
        "partitionColumn": "id",
        "lowerBound": "0",
        "upperBound": "10000000",
        "numPartitions": "10",
    }


def test_predicates_cover_all_rows():
    p = JdbcPartitionPlan("id", 0, 100, 4)
    preds = p.predicates()
    assert len(preds) == 4
    # first stratum is open below (catches id<0 and NULL), last open above
    assert preds[0] == "id < 25 OR id IS NULL"
    assert preds[-1] == "id >= 75"
    assert preds[1] == "id >= 25 AND id < 50"


def test_single_partition_and_degenerate_ranges():
    assert JdbcPartitionPlan("id", 0, 100, 1).predicates() == [""]
    # range narrower than partition count -> one task, no bad strides
    assert JdbcPartitionPlan("id", 5, 7, 16).predicates() == [""]


def test_bad_bounds_rejected():
    with pytest.raises(ValueError):
        plan_partitions(10, 0, target_rows_per_partition=1, total_rows=1, column="id")


def test_partition_count_clamped():
    p = plan_partitions(0, 10**12, target_rows_per_partition=1,
                        total_rows=10**12, column="id")
    assert p.num_partitions == 10_000


# --------------------------------------------------------------------------
# JDBC write adapter (r12, SURVEY §2.2 K9/K10 remote leg): pure
# planning + statement generation, writer assembly via injection.
# --------------------------------------------------------------------------
from pandas_aws_spark.sources.jdbc import (  # noqa: E402
    JdbcWritePlan,
    plan_write,
    stage_table_statements,
    upsert_jdbc,
    upsert_statements,
)


def test_write_plan_sizing_clamped_to_connection_budget():
    # one task per target_rows_per_task ...
    assert plan_write(3_000_000).num_partitions == 3
    # ... clamped by the warehouse connection budget, not the 10k read cap
    assert plan_write(10**12, target_rows_per_task=1).num_partitions == 64
    assert plan_write(10**12, target_rows_per_task=1,
                      max_connections=8).num_partitions == 8
    # empty/small frames still get one connection
    assert plan_write(0).num_partitions == 1
    with pytest.raises(ValueError):
        plan_write(10, max_connections=0)


def test_write_plan_options_map_to_spark_writer_knobs():
    p = JdbcWritePlan(4, batch_size=5_000, isolation_level="NONE")
    assert p.as_options() == {
        "numPartitions": "4",
        "batchsize": "5000",
        "isolationLevel": "NONE",
    }


def test_stage_table_statements_mirror_reference():
    stage, stmts = stage_table_statements("sales")
    assert stage == "stage_sales"
    assert stmts == [
        "DROP TABLE IF EXISTS stage_sales",
        "CREATE TABLE stage_sales (LIKE sales)",
        "ALTER TABLE stage_sales DROP COLUMN date_insert",
    ]
    # schema-qualified targets get a legal stage name; audit col opt-out
    stage2, stmts2 = stage_table_statements("analytics.sales", audit_col=None)
    assert stage2 == "stage_analytics_sales" and len(stmts2) == 2


def test_upsert_statements_single_transaction_delete_insert_drop():
    (txn,) = upsert_statements("sales", "stage_sales", ["order_id", "region"])
    assert txn.startswith("BEGIN TRANSACTION;")
    assert txn.rstrip().endswith("END TRANSACTION;")
    assert ("DELETE FROM sales USING stage_sales WHERE "
            "sales.order_id = stage_sales.order_id "
            "AND sales.region = stage_sales.region;") in txn
    assert "INSERT INTO sales SELECT * FROM stage_sales;" in txn
    assert "DROP TABLE stage_sales;" in txn
    # delete precedes insert (last-write-wins), both inside the txn
    assert txn.index("DELETE") < txn.index("INSERT") < txn.index("DROP TABLE")
    with pytest.raises(ValueError):
        upsert_statements("sales", "stage_sales", [])


def test_upsert_statements_named_insert_columns():
    """insert_cols emits a BY-NAME column list (r12 review fix): the
    positional SELECT * is only correct when the target's audit column
    is last; named columns are immune to its position."""
    (txn,) = upsert_statements(
        "sales", "stage_sales", ["order_id"], insert_cols=["order_id", "val"]
    )
    assert (
        "INSERT INTO sales (order_id, val) SELECT order_id, val FROM stage_sales;"
        in txn
    )
    with pytest.raises(ValueError):
        upsert_statements(
            "sales", "stage_sales", ["order_id"], insert_cols=["x; DROP TABLE y"]
        )


def test_identifiers_validated_before_statement_generation():
    for bad in ("sales; DROP TABLE x", "a b", "", "x'y"):
        with pytest.raises(ValueError, match="identifier"):
            stage_table_statements(bad)
        with pytest.raises(ValueError, match="identifier"):
            upsert_statements("sales", "stage_sales", [bad])


def test_upsert_jdbc_composes_prepare_load_merge(spark):
    calls = []
    writes = []

    def runner(stmt):
        calls.append(stmt)

    def fake_writer(df, url, table, *, mode, plan):
        writes.append((url, table, mode, plan))

    df = spark.range(5).withColumnRenamed("id", "order_id")
    p = plan_write(5, target_rows_per_task=2, max_connections=4)
    upsert_jdbc(
        df, "jdbc:postgresql://wh/db", "sales", ["order_id"],
        run_statement=runner, plan=p, _writer=fake_writer,
    )
    # prepare (3 stmts) ran BEFORE the load, merge txn after
    assert [s.split()[0] for s in calls[:3]] == ["DROP", "CREATE", "ALTER"]
    assert writes == [("jdbc:postgresql://wh/db", "stage_sales", "append", p)]
    assert calls[3].startswith("BEGIN TRANSACTION;")
    # the merge INSERT names the staged columns explicitly
    assert "INSERT INTO sales (order_id) SELECT order_id FROM stage_sales;" in calls[3]
    assert len(calls) == 4
