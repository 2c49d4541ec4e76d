"""As-of join unit tests — hand-built fixtures pinning the boundary
semantics (inclusive equal-timestamp match, no-predecessor NULL,
latest-of-many selection, key isolation)."""

from __future__ import annotations

import datetime as dt

from pandas_aws_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100),  # after both rights -> picks 10:00 right? no: rights at 09:00, 09:30 -> 09:30
            (1, _ts("2024-01-01 09:30:00"), 101),  # equal ts -> inclusive match
            (1, _ts("2024-01-01 08:00:00"), 102),  # before all rights -> NULL
            (2, _ts("2024-01-01 10:00:00"), 103),  # other key: only its own rights
        ],
        "user_id long, ts timestamp, order_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 7),
            (1, _ts("2024-01-01 09:30:00"), 8),
            (2, _ts("2024-01-01 09:59:00"), 9),
        ],
        "user_id long, ts timestamp, quote long",
    )
    out = {
        r["order_id"]: (r["asof_quote"], r["asof_ts"])
        for r in asof_join(left, right, ["user_id"], right_cols=["quote"]).collect()
    }
    assert out[100] == (8, _ts("2024-01-01 09:30:00"))  # latest at-or-before
    assert out[101] == (8, _ts("2024-01-01 09:30:00"))  # equal ts inclusive
    assert out[102] == (None, None)  # no predecessor
    assert out[103] == (9, _ts("2024-01-01 09:59:00"))  # per-key isolation


def test_asof_join_keeps_left_cardinality(spark, sf_dir):
    from pyspark.sql import functions as F

    from pandas_aws_spark.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    joined = asof_join(purchases, clicks, ["user_id"], right_cols=["click_id"])
    assert joined.count() == purchases.count()
