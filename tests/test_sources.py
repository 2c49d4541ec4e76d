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
