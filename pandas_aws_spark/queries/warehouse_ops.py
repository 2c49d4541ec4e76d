"""Warehouse merge/upsert queries — oracle-checked proofs of the
reference's DML surface (SURVEY.md §2.3 M1-M4, ``redshift.py:386-416``).

The merge semantics under test: delete target rows whose key appears in
the update set, insert ALL staged rows (including duplicate keys inside
the update set — reference §3.4, last-write-wins at the batch level).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import dsum, sql_dsum
from ..registry import load_table, query
from ..warehouse import WarehouseClient

# --------------------------------------------------------------------------
# Keyed upsert: modified rows replace, new keys append.
# --------------------------------------------------------------------------
_UPSERT_ORACLE = f"""
WITH upd AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey, 'N' AS o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 50 = 0
),
merged AS (
  SELECT o.* FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey)
  UNION ALL
  SELECT * FROM upd
)
SELECT o_orderstatus, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS total_price
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("q_upsert_merge", oracle=_UPSERT_ORACLE, tags=("merge", "upsert"))
def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins keyed merge: anti-join survivors + all updates
    (the distributed form of DELETE USING + INSERT SELECT,
    redshift.py:348-384). The anti-join shuffles both sides on the key
    once; at scale the update set is typically small enough that AQE
    converts it to a broadcast anti-join automatically."""
    orders = load_table(spark, sf_dir, "orders")
    changed = (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
    )
    new_rows = (
        orders.filter(F.col("o_orderkey") % 50 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 100000000)
        .withColumn("o_orderstatus", F.lit("N"))
    )
    updates = changed.unionByName(new_rows)
    merged = WarehouseClient.merge_frames(orders, updates, ["o_orderkey"])
    return (
        merged.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price"))
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Duplicate keys inside the update batch: ALL staged rows must land.
# --------------------------------------------------------------------------
_DUP_ORACLE = f"""
WITH upd AS (
  SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice + 2.0 AS o_totalprice FROM orders WHERE o_orderkey % 7 = 0
),
tgt AS (SELECT o_orderkey, o_totalprice FROM orders),
merged AS (
  SELECT t.* FROM tgt t
  WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = t.o_orderkey)
  UNION ALL
  SELECT * FROM upd
)
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT o_orderkey) AS n_keys,
       {sql_dsum('o_totalprice')} AS total_price
FROM merged
"""


@query("q_upsert_duplicate_keys", oracle=_DUP_ORACLE, tags=("merge", "upsert"))
def q_upsert_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference quirk preserved (§3.4): if the update batch contains a
    key twice, BOTH rows are inserted — n_rows > n_keys in the output
    proves the semantics (Delta MERGE would have errored instead)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    sample = orders.filter(F.col("o_orderkey") % 7 == 0)
    updates = sample.withColumn("o_totalprice", F.col("o_totalprice") + 1.0).unionByName(
        sample.withColumn("o_totalprice", F.col("o_totalprice") + 2.0)
    )
    merged = WarehouseClient.merge_frames(orders, updates, ["o_orderkey"])
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        dsum("o_totalprice").alias("total_price"),
    )


# --------------------------------------------------------------------------
# Catalog round-trip: upload -> SQL query through the catalog -> drop.
# --------------------------------------------------------------------------
_CATALOG_ORACLE = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       {sql_dsum('c_acctbal')} AS total_balance
FROM customer
WHERE c_acctbal > 0
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("q_warehouse_catalog_roundtrip", oracle=_CATALOG_ORACLE, tags=("warehouse",))
def q_warehouse_catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upload (K10: normalize + audit col + saveAsTable) then query via
    arbitrary SQL (S7) — the reference's full load+read pipeline with
    the S3-staging hop collapsed away."""
    wc = WarehouseClient(spark)
    name = f"cust_{uuid.uuid4().hex[:8]}"
    cust = load_table(spark, sf_dir, "customer")
    wc.upload(cust, name, mode="overwrite")
    out = wc.query_df(
        f"""
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_balance
        FROM {name}
        WHERE c_acctbal > 0
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )
    out = out.localCheckpoint(eager=True)  # materialize before dropping the table
    wc.drop_table(name)
    return out


# --------------------------------------------------------------------------
# Custom Python Data Source (Spark 4 API) — source extensibility.
# --------------------------------------------------------------------------
def _pysource_oracle() -> str:
    from ..functions.stable import sql_dsum
    from ..sources.pysource import sql_synthetic_events

    return f"""
WITH feed AS ({sql_synthetic_events(10_000, 100)})
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sql_dsum('value')} AS total_value,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM feed
GROUP BY event_type
ORDER BY event_type
"""


@query("q_source_python_datasource", oracle=_pysource_oracle(), tags=("source", "extensibility"))
def q_source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reads a custom Python Data Source (Spark 4 ``DataSource`` API):
    a deterministic synthetic event feed generated per-partition on
    executors (8 independent row ranges — no driver data path), then
    a normal Catalyst aggregate on top. The source's integer formulas
    are replayed exactly by DuckDB generate_series, so even a custom
    connector stays inside the oracle gate."""
    from ..functions.stable import dsum
    from ..sources import pysource

    pysource.register(spark)
    feed = (
        spark.read.format("synthetic_events")
        .option("n_rows", 10_000)
        .option("num_users", 100)
        .option("num_partitions", 8)
        .load()
    )
    return (
        feed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("event_type")
    )
