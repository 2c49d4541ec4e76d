"""Unit tests for SCD2, interval join, profiling, fuzzy matching."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pandas_aws_spark.operators.fuzzy import blocked_levenshtein_join
from pandas_aws_spark.operators.intervaljoin import interval_join
from pandas_aws_spark.operators.profile import profile_columns
from pandas_aws_spark.operators.scd import scd2_build, scd2_merge


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_scd2_build_versions(spark):
    changes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01"), "a"),
            (1, _ts("2024-01-05"), "b"),
            (2, _ts("2024-01-03"), "x"),
        ],
        "k int, ts timestamp, v string",
    )
    hist = scd2_build(changes, ["k"], "ts").orderBy("k", "valid_from").collect()
    assert [r.v for r in hist] == ["a", "b", "x"]
    assert hist[0].valid_to == _ts("2024-01-05") and not hist[0].is_current
    assert hist[1].valid_to is None and hist[1].is_current
    assert hist[2].is_current


def test_scd2_merge_closes_current_and_appends(spark):
    dim_changes = spark.createDataFrame(
        [(1, _ts("2024-01-01"), "a"), (2, _ts("2024-01-01"), "x")],
        "k int, ts timestamp, v string",
    )
    dim = scd2_build(dim_changes, ["k"], "ts")
    updates = spark.createDataFrame([(1, _ts("2024-02-01"), "a2")], "k int, ts timestamp, v string")
    out = scd2_merge(dim, updates, ["k"], "ts")
    rows = {(r.k, r.v): r for r in out.collect()}
    assert len(rows) == 3
    # old version of k=1 closed out at the update's timestamp
    assert rows[(1, "a")].valid_to == _ts("2024-02-01") and not rows[(1, "a")].is_current
    assert rows[(1, "a2")].is_current
    # untouched key stays current
    assert rows[(2, "x")].is_current


def test_interval_join_matches_naive(spark):
    ev = spark.createDataFrame(
        [(i, _ts("2024-01-01") + datetime.timedelta(minutes=17 * i)) for i in range(200)],
        "pid long, ts timestamp",
    )
    wins = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 05:30:00"), _ts("2024-01-01 08:15:00")),
            (200, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 01:00:00")),  # boundary-aligned
            (300, _ts("2024-01-01 05:45:00"), _ts("2024-01-01 05:46:00")),  # sub-bucket
        ],
        "win_id long, s timestamp, e timestamp",
    )
    fast = interval_join(ev, wins, "ts", "s", "e").select("pid", "win_id")
    naive = ev.join(wins, (ev.ts >= wins.s) & (ev.ts < wins.e)).select("pid", "win_id")
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))
    assert fast.count() > 0


def test_interval_join_no_duplicate_pairs(spark):
    ev = spark.createDataFrame([(1, _ts("2024-01-01 03:30:00"))], "pid long, ts timestamp")
    # window spans 4 hour-buckets; the single matching point must appear once
    wins = spark.createDataFrame(
        [(9, _ts("2024-01-01 00:30:00"), _ts("2024-01-01 03:45:00"))],
        "win_id long, s timestamp, e timestamp",
    )
    assert interval_join(ev, wins, "ts", "s", "e").count() == 1


def test_profile_columns_metrics(spark):
    df = spark.createDataFrame(
        [(1, None, "a"), (2, 5.0, "b"), (2, 7.5, None)], "k int, x double, s string"
    )
    prof = {r.col_name: r for r in profile_columns(df, ["k", "x", "s"]).collect()}
    assert prof["k"].n_nulls == 0 and prof["k"].n_distinct == 2
    assert prof["x"].n_nulls == 1 and prof["x"].min_num == 5.0 and prof["x"].max_num == 7.5
    assert prof["s"].n_nulls == 1 and prof["s"].min_num == -1.0


def test_blocked_levenshtein_join_blocks_and_filters(spark):
    left = spark.createDataFrame([("kitten", "k"), ("zzzzzz", "k")], "name string, blk string")
    right = spark.createDataFrame([("sitten", "k"), ("kitten", "x")], "cname string, blk2 string")
    out = blocked_levenshtein_join(
        left, right, "name", "cname", F.col("blk"), F.col("blk2"), max_distance=2
    ).collect()
    # same block + distance 1 matches; cross-block exact match is invisible
    assert len(out) == 1 and out[0].edit_distance == 1


def test_diff_tables_classes(spark):
    from pandas_aws_spark.operators.reconcile import diff_tables

    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    right = spark.createDataFrame([(1, "a"), (2, "B"), (4, "d")], "k int, v string")
    out = {r.k: r.diff_class for r in diff_tables(left, right, ["k"], ["v"]).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_diff_tables_null_safe_compare(spark):
    from pandas_aws_spark.operators.reconcile import diff_tables

    left = spark.createDataFrame([(1, None), (2, None)], "k int, v string")
    right = spark.createDataFrame([(1, None), (2, "x")], "k int, v string")
    out = {r.k: r.diff_class for r in diff_tables(left, right, ["k"], ["v"]).collect()}
    assert out == {1: "unchanged", 2: "changed"}


def test_expectations_report(spark):
    from pandas_aws_spark.operators.expectations import (
        expect_condition,
        expect_ref_integrity,
        expect_unique,
        run_expectations,
    )

    child = spark.createDataFrame([(1,), (2,), (9,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    dup = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    rules = {
        "orphans": expect_ref_integrity(child, "fk", parent, "pk"),
        "unique_k": expect_unique(dup, ["k"]),
        "no_negatives": expect_condition(dup, dup.k < 0),
    }
    out = {r.rule: (r.n_violations, r.passed) for r in run_expectations(rules).collect()}
    assert out["orphans"] == (1, False)
    assert out["unique_k"] == (1, False)
    assert out["no_negatives"] == (0, True)


def test_dsum_micro_partitioning_invariance(spark):
    from pandas_aws_spark.functions.stable import dsum_micro

    import random

    rnd = random.Random(7)
    rows = [(i, rnd.uniform(0, 500000)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k int, v double")
    vals = set()
    for n in (1, 7, 32):
        vals.add(df.repartition(n).agg(dsum_micro("v").alias("s")).collect()[0].s)
    assert len(vals) == 1  # exact integer micro-units, any partitioning


def test_recursive_paths_probabilities(spark, sf_dir):
    """15 depth-3 paths, ppm products within bounds, descending order."""
    from pandas_aws_spark.registry import load_registry

    rows = load_registry()["q_sql_recursive_paths"].fn(spark, sf_dir).collect()
    assert len(rows) == 15
    ppms = [r.p_ppm for r in rows]
    assert ppms == sorted(ppms, reverse=True)
    for r in rows:
        assert 0 <= r.p_ppm <= 1_000_000
        assert r.path.count(">") == 2  # depth 3 = two transitions


def test_cohort_ltv_triangle(spark, sf_dir):
    """Cohort triangle invariants: age 0 exists for every cohort (the
    acquisition order itself), ages are non-negative, customer counts
    never exceed order counts."""
    from pandas_aws_spark.registry import load_registry

    rows = load_registry()["q_orders_cohort_ltv"].fn(spark, sf_dir).collect()
    assert rows
    cohorts = {r.cohort_year for r in rows}
    age0 = {r.cohort_year for r in rows if r.order_age == 0}
    assert age0 == cohorts
    for r in rows:
        assert r.order_age >= 0
        assert 1 <= r.n_customers <= r.n_orders
