"""I/O round-trip queries — prove the object-store write/read surface
(reference ``put_df``/``get_df_from_keys``, SURVEY.md §2.1-§2.2) with
oracle-checked content: write a table out through ``write_df``, read it
back through ``read_df``, aggregate, and match the aggregate DuckDB
computes on the ORIGINAL parquet. If serialization dropped or mangled
anything, the hashes diverge.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import dsum, sql_dsum
from ..objectstore import read_df, write_df
from . import scratch_dir
from ..registry import load_table, query

_LINEITEM_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp"
)

_CSV_ORACLE = f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_price,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
WHERE l_orderkey % 10 = 0
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q_io_roundtrip_csv_gzip", oracle=_CSV_ORACLE, tags=("io",))
def q_io_roundtrip_csv_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem subset -> gzip csv in 4 range-sorted parts -> read back
    with explicit schema -> aggregate. Covers K1/K5/K6 + S2 round-trip
    including timestamp and full-precision double serialization."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    tmp = scratch_dir(prefix="roundtrip_csv_")
    path = f"file://{tmp}/lineitem_csv"
    write_df(li, path, format="csv", compression="gzip", parts=4, sort_keys=["l_orderkey"])
    back = read_df(spark, path, format="csv", schema=_LINEITEM_SCHEMA)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_price"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("l_returnflag")
    )


_PARQUET_ORACLE = f"""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("q_io_roundtrip_parquet_partitioned", oracle=_PARQUET_ORACLE, tags=("io",))
def q_io_roundtrip_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> hive-partitioned parquet (partitionBy status) -> read
    back -> aggregate. The read-back scan prunes partitions by the
    directory key — the Spark analogue of the reference's prefix
    pushdown (s3.py:33-35) at the storage layout level."""
    orders = load_table(spark, sf_dir, "orders")
    tmp = scratch_dir(prefix="roundtrip_parquet_")
    path = f"file://{tmp}/orders_parquet"
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price"))
        .orderBy("o_orderstatus")
    )


_UNION_ORACLE = f"""
SELECT COUNT(*) AS n_rows,
       {sql_dsum('s_acctbal')} AS total_balance,
       COUNT(DISTINCT s_suppkey) AS n_suppliers
FROM (SELECT * FROM supplier UNION ALL SELECT * FROM supplier UNION ALL SELECT * FROM supplier)
"""


@query("q_io_multifile_union", oracle=_UNION_ORACLE, tags=("io", "union"))
def q_io_multifile_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three copies of supplier written as separate objects under one
    prefix, union-read back in a single multi-path scan (reference
    ``get_df_from_keys``, s3.py:243-294; union-all semantics R3)."""
    from ..objectstore import read_df_from_prefix

    supp = load_table(spark, sf_dir, "supplier")
    tmp = scratch_dir(prefix="roundtrip_union_")
    base = f"file://{tmp}/suppliers"
    for i in range(3):
        write_df(supp, f"{base}/copy_{i}.parquet", format="parquet")
    back = read_df_from_prefix(spark, base, suffix=".parquet", format="suffix")
    return back.agg(
        F.count("*").alias("n_rows"),
        dsum("s_acctbal").alias("total_balance"),
        F.countDistinct("s_suppkey").alias("n_suppliers"),
    )


_ORC_ORACLE = f"""
SELECT n_regionkey,
       COUNT(*) AS n_nations,
       {sql_dsum('n_nationkey')} AS key_sum
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""


@query("q_io_roundtrip_orc", oracle=_ORC_ORACLE, tags=("io",))
def q_io_roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation -> ORC -> read back -> aggregate: proves the third
    columnar format in SUPPORTED_FORMATS end-to-end (same vectorized
    reader path as parquet; zstd codec exercised on the write)."""
    nat = load_table(spark, sf_dir, "nation")
    tmp = scratch_dir(prefix="roundtrip_orc_")
    path = f"file://{tmp}/nation_orc"
    write_df(nat, path, format="orc", compression="zstd", parts=2)
    back = read_df(spark, path, format="orc")
    return (
        back.groupBy("n_regionkey")
        .agg(F.count("*").alias("n_nations"), dsum("n_nationkey").alias("key_sum"))
        .orderBy("n_regionkey")
    )


# --------------------------------------------------------------------------
# Schema evolution — mergeSchema multi-file read (files written at
# different pipeline versions carry different column sets).
# --------------------------------------------------------------------------
_EVOLVE_ORACLE = f"""
WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0),
     v2 AS (SELECT o_orderkey, o_custkey    FROM orders WHERE o_orderkey % 2 = 1)
SELECT COUNT(*)                    AS n_rows,
       COUNT(o_totalprice)         AS n_with_price,
       COUNT(o_custkey)            AS n_with_cust,
       {sql_dsum('o_totalprice')}  AS total_price
FROM (SELECT o_orderkey, o_totalprice, NULL::BIGINT AS o_custkey FROM v1
      UNION ALL
      SELECT o_orderkey, NULL::DOUBLE, o_custkey FROM v2)
"""


@query("q_io_schema_evolution", oracle=_EVOLVE_ORACLE, tags=("io", "schema"))
def q_io_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two parquet 'versions' of the orders feed — one with price, a
    later one with custkey — land under the same prefix; a single
    ``mergeSchema`` scan reconciles them (absent columns surface as
    NULLs), the schema-on-read behavior the reference gets implicitly
    from pandas concat (``s3.py:290-292``) but Spark does without
    materializing anything driver-side."""
    orders = load_table(spark, sf_dir, "orders")
    tmp = scratch_dir(prefix="schema_evolution_")
    base = f"file://{tmp}/orders_feed"
    orders.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice").write.parquet(
        f"{base}/v1"
    )
    orders.filter(F.col("o_orderkey") % 2 == 1).select("o_orderkey", "o_custkey").write.parquet(
        f"{base}/v2"
    )
    back = spark.read.option("mergeSchema", True).option("recursiveFileLookup", True).parquet(base)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.count("o_totalprice").alias("n_with_price"),
        F.count("o_custkey").alias("n_with_cust"),
        dsum("o_totalprice").alias("total_price"),
    )


_DPO_ORACLE = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice + 1000.0 ELSE o_totalprice END")} AS total_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_io_dynamic_partition_overwrite", oracle=_DPO_ORACLE, tags=("io", "partition"))
def q_io_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT OVERWRITE of ONE partition without touching the others —
    partitionOverwriteMode=dynamic replaces only partitions present in
    the incoming batch (the warehouse 'reload one day' operation; with
    static overwrite Spark would wipe the whole table). Oracle = the
    expected post-overwrite state computed from the original data."""

    orders = load_table(spark, sf_dir, "orders")
    tmp = scratch_dir(prefix="dpo_")
    path = f"file://{tmp}/orders_part"
    orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(path)
    urgent_fixed = orders.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000.0
    )
    (
        urgent_fixed.write.partitionBy("o_orderpriority")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price"))
        .orderBy("o_orderpriority")
    )


_COMPACT_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT md5(text)) AS n_distinct_texts
FROM documents
GROUP BY lang
ORDER BY lang
"""


@query("q_io_compact_small_files", oracle=_COMPACT_ORACLE, tags=("io", "maintenance"))
def q_io_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction end-to-end: write documents fragmented
    into 64 tiny files (the streaming-sink pathology), compact to a
    byte-targeted file count through ``objectstore.compact_prefix``
    (atomic temp-dir + swap), then prove BOTH properties — the file
    count actually dropped (asserted here; a no-op "compaction" would
    still pass a content check) and the content survived byte-exact
    (the oracle hash on the read-back aggregate)."""
    from ..objectstore import compact_prefix

    docs = load_table(spark, sf_dir, "documents")
    tmp = scratch_dir(prefix="compact_")
    path = f"file://{tmp}/docs_fragmented"
    docs.repartition(64).write.mode("overwrite").parquet(path)
    stats = compact_prefix(spark, path, target_bytes_per_file=64 * 1024 * 1024)
    if not (stats["files_after"] < stats["files_before"]):
        raise AssertionError(f"compaction did not reduce file count: {stats}")
    back = spark.read.parquet(path)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Bucketed co-located join: both fact tables pre-bucketed on the join
# key -> the join runs with ZERO shuffle exchanges (plan-asserted).
# --------------------------------------------------------------------------
_BUCKETED_ORACLE = f"""
SELECT o.o_orderpriority,
       COUNT(*) AS n_items,
       {sql_dsum('l.l_extendedprice')} AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("q_io_bucketed_join", oracle=_BUCKETED_ORACLE, tags=("io", "join", "layout", "scale"))
def q_io_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact-to-fact join via bucketed table layout — the
    Spark analogue of the reference's DISTKEY co-location
    (``redshift.py:229-237``, SURVEY.md K8): write lineitem and orders
    ``bucketBy(8, orderkey)`` + in-bucket sorted, then join on the
    bucket key. Both scans are already hash-co-partitioned, so the
    sort-merge join needs NO Exchange — asserted on the physical plan
    before the action runs (a layout regression fails loudly instead
    of silently re-shuffling 100 TB).

    At scale this is THE layout decision for recurring fact joins:
    pay one bucketed write, then every subsequent join on that key
    skips its shuffle entirely. The merge hint pins the strategy so
    the assertion is deterministic (AQE would otherwise broadcast at
    this sf and hide the layout property being proven)."""
    import uuid

    from ..plans.inspect import num_shuffles, physical_plan

    sfx = uuid.uuid4().hex[:8]
    li_name, od_name = f"li_bkt_{sfx}", f"od_bkt_{sfx}"
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    try:
        (
            li.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(li_name)
        )
        (
            od.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(od_name)
        )
        a, b = spark.table(li_name), spark.table(od_name)
        joined = a.join(b.hint("merge"), a.l_orderkey == b.o_orderkey)
        shuffles = num_shuffles(joined)
        if shuffles != 0:
            raise AssertionError(
                f"bucketed join planned {shuffles} shuffle(s) — layout not used:\n"
                + physical_plan(joined)
            )
        out = (
            joined.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                dsum("l_extendedprice").alias("revenue"),
            )
            .orderBy("o_orderpriority")
        )
        return out.localCheckpoint(eager=True)  # materialize before dropping tables
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {li_name}")
        spark.sql(f"DROP TABLE IF EXISTS {od_name}")


# --------------------------------------------------------------------------
# JSONL round-trip: the interchange format of LLM corpus tooling.
# --------------------------------------------------------------------------
_JSONL_ORACLE = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT md5(text)) AS n_distinct_texts
FROM documents
GROUP BY source
ORDER BY source
"""


@query("q_io_roundtrip_jsonl", oracle=_JSONL_ORACLE, tags=("io",))
def q_io_roundtrip_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> gzip JSON-lines -> read back with explicit schema
    -> aggregate. JSONL is the lingua franca of LLM corpus tooling
    (every open dataset ships as .jsonl.gz), one format past the
    reference's csv/parquet/pickle/xlsx set (``s3.py:211-240``) using
    the same write_df/read_df dispatch. Explicit read schema — JSON
    inference is a full extra pass over the data at scale, and
    silently widens absent fields to string."""
    docs = load_table(spark, sf_dir, "documents")
    tmp = scratch_dir(prefix="roundtrip_jsonl_")
    path = f"file://{tmp}/docs_jsonl"
    write_df(docs, path, format="json", compression="gzip", parts=4)
    back = read_df(
        spark,
        path,
        format="json",
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Malformed-CSV robustness: PERMISSIVE parse with corrupt-record
# accounting — bad rows must be quarantined, not dropped or fatal.
# --------------------------------------------------------------------------
_MALFORMED_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
       CAST(SUM(CASE WHEN o_orderkey % 13 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(CAST(SUM(CASE WHEN o_orderkey % 13 <> 0
                 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE 0 END) AS DECIMAL(25,6))
            * 1000000 AS BIGINT) AS valid_price_micro
FROM orders
"""


@query("q_io_csv_malformed", oracle=_MALFORMED_ORACLE, tags=("io", "robustness"))
def q_io_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-input robustness for the CSV scan: a CSV where every
    13th order carries a non-numeric price cell is read back in
    PERMISSIVE mode with an explicit ``_corrupt_record`` column — bad
    rows surface as quarantined records (raw line preserved for a
    dead-letter sink) instead of killing the job (FAILFAST) or
    silently vanishing (DROPMALFORMED). The oracle recomputes the
    corruption pattern and the exact micro-unit sum of the VALID rows,
    proving no valid row was lost and no corrupt row leaked into the
    aggregate.

    Scale shape: parse + quarantine is row-local inside the scan; the
    final accounting is one aggregate. The corrupt-record column is
    projected only here — production writes it to a dead-letter path
    and drops it from the main flow."""

    orders = load_table(spark, sf_dir, "orders")
    tmp = scratch_dir(prefix="malformed_csv_")
    path = f"file://{tmp}/orders_dirty"
    dirty = orders.select(
        F.col("o_orderkey").cast("string").alias("o_orderkey"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("N/A"))
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    write_df(dirty, path, format="csv")
    back = read_df(
        spark,
        path,
        format="csv",
        schema="o_orderkey long, o_totalprice double, o_orderstatus string, _corrupt_record string",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_valid"),
        (
            F.sum(
                F.when(
                    F.col("_corrupt_record").isNull(),
                    F.col("o_totalprice").cast("decimal(18,6)"),
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            ).cast("decimal(25,6)")
            * F.lit(1000000).cast("decimal(7,0)")
        )
        .cast("long")
        .alias("valid_price_micro"),
    )


# --------------------------------------------------------------------------
# Mixed-prefix lineage audit (r7 verdict ask #7): the reference's
# 'mixed' mode silently skips unparseable files with a log warning
# (s3.py:275-285); the engine returns the skip/contribution accounting
# AS DATA — per-object row counts via input_file_name(), quarantined
# objects pinned at 0 rows.
# --------------------------------------------------------------------------
_MIXED_LINEAGE_ORACLE = """
WITH lineage AS (
  SELECT 'notes.txt' AS file_name, 'txt' AS fmt, 'quarantined' AS status,
         0 AS n_rows
  UNION ALL
  SELECT 'part_a.csv', 'csv', 'contributed',
         (SELECT COUNT(*) FROM documents WHERE doc_id % 4 = 0)
  UNION ALL
  SELECT 'part_b.parquet', 'parquet', 'contributed',
         (SELECT COUNT(*) FROM documents WHERE doc_id % 4 = 1)
  UNION ALL
  SELECT 'part_c.json', 'json', 'contributed',
         (SELECT COUNT(*) FROM documents WHERE doc_id % 4 = 2)
)
SELECT file_name, fmt, status, CAST(n_rows AS BIGINT) AS n_rows
FROM lineage ORDER BY file_name
"""


@query("q_io_mixed_prefix_lineage", oracle=_MIXED_LINEAGE_ORACLE, tags=("io", "lineage", "robustness"))
def q_io_mixed_prefix_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-format prefix read with per-object lineage: three document
    slices land under one prefix as csv / parquet / json plus a text
    object no supported format matches; ``read_prefix_lineage`` must
    account for every object — contributed ones with their exact row
    counts (counted distributedly via ``input_file_name()``, one
    aggregation over the unioned scans), the text object quarantined
    at 0 rows rather than silently dropped (the reference's mixed mode
    logs a warning and moves on, ``/root/reference/pandas_aws/
    s3.py:283-285`` — unreconstructable after the fact at ingest
    scale). The oracle recomputes each slice's cardinality from the
    source table, proving no contributed file lost rows and no
    quarantined file leaked any."""
    from ..objectstore import read_prefix_lineage

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    tmp = scratch_dir(prefix="mixed_lineage_")
    base = f"file://{tmp}"
    write_df(docs.filter(F.col("doc_id") % 4 == 0), f"{base}/part_a.csv", format="csv")
    write_df(
        docs.filter(F.col("doc_id") % 4 == 1), f"{base}/part_b.parquet", format="parquet"
    )
    write_df(docs.filter(F.col("doc_id") % 4 == 2), f"{base}/part_c.json", format="json")
    docs.filter(F.col("doc_id") % 4 == 3).select(
        F.col("doc_id").cast("string")
    ).write.mode("overwrite").text(f"{tmp}/notes.txt")
    return read_prefix_lineage(
        spark, base, schema="doc_id long, source string, n_chars long"
    ).orderBy("file_name")
