"""Cost-based planning: Catalyst must pick a broadcast join from TABLE
STATISTICS alone (no explicit broadcast() hint) once ANALYZE TABLE has
run — the mechanism that replaces hand-placed hints at fleet scale,
where queries are generated and nobody hand-tunes join sides."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_aws_spark.plans.inspect import join_strategies
from pandas_aws_spark.registry import load_table


def test_analyzed_small_table_broadcasts_without_hint(spark, sf_dir, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_t")
    try:
        load_table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
            "cbo_t.nation_s"
        )
        load_table(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable(
            "cbo_t.orders_b"
        )
        spark.sql("ANALYZE TABLE cbo_t.nation_s COMPUTE STATISTICS")
        spark.sql("ANALYZE TABLE cbo_t.orders_b COMPUTE STATISTICS")
        df = spark.table("cbo_t.orders_b").join(
            spark.table("cbo_t.nation_s"),
            F.col("o_custkey") % 25 == F.col("n_nationkey"),
        )
        js = join_strategies(df)
        assert js.get("BroadcastHashJoin", 0) == 1, js
        assert js.get("SortMergeJoin", 0) == 0, js
    finally:
        spark.sql("DROP DATABASE IF EXISTS cbo_t CASCADE")


def test_stats_visible_in_catalog(spark, sf_dir):
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_t2")
    try:
        load_table(spark, sf_dir, "region").write.mode("overwrite").saveAsTable(
            "cbo_t2.region_s"
        )
        spark.sql("ANALYZE TABLE cbo_t2.region_s COMPUTE STATISTICS")
        row = spark.sql("DESCRIBE TABLE EXTENDED cbo_t2.region_s").filter(
            F.col("col_name") == "Statistics"
        ).collect()
        assert row and "rows" in row[0].data_type
    finally:
        spark.sql("DROP DATABASE IF EXISTS cbo_t2 CASCADE")
