"""Federated warehouse reads over JDBC — SURVEY.md §2.1 S7(a).

The reference streams arbitrary-SQL results through psycopg2
``cursor.fetchmany(fetch_size)`` on the driver
(``/root/reference/pandas_aws/redshift.py:417-448``) — bounded memory,
but single-connection and driver-resident. The Spark-native
replacement is the JDBC source with *partitioned* reads: N executors
each open a connection for one slice of ``partition_column``, so a
100 GB result lands as N parallel scans instead of one fetch loop.

No warehouse exists in the test container, so the partition-planning
logic (the part that decides what SQL each task runs) is a pure
function — unit-tested directly — and ``read_jdbc`` is a thin
``spark.read.format('jdbc')`` assembly over it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["JdbcPartitionPlan", "plan_partitions", "read_jdbc", "read_jdbc_query"]


@dataclass(frozen=True)
class JdbcPartitionPlan:
    partition_column: str
    lower_bound: int
    upper_bound: int
    num_partitions: int

    def as_options(self) -> dict[str, str]:
        return {
            "partitionColumn": self.partition_column,
            "lowerBound": str(self.lower_bound),
            "upperBound": str(self.upper_bound),
            "numPartitions": str(self.num_partitions),
        }

    def predicates(self) -> list[str]:
        """The per-task WHERE clauses Spark derives from the plan —
        mirrors JDBCRelation.columnPartition: ``num_partitions`` ranges
        with open first/last strata so out-of-bounds rows are kept."""
        n = self.num_partitions
        if n <= 1:
            return [""]
        stride = (self.upper_bound - self.lower_bound) // n
        if stride <= 0:
            return [""]
        col = self.partition_column
        preds, lo = [], self.lower_bound
        for i in range(n):
            hi = lo + stride
            if i == 0:
                preds.append(f"{col} < {hi} OR {col} IS NULL")
            elif i == n - 1:
                preds.append(f"{col} >= {lo}")
            else:
                preds.append(f"{col} >= {lo} AND {col} < {hi}")
            lo = hi
        return preds


def plan_partitions(
    lower: int, upper: int, *, target_rows_per_partition: int, total_rows: int, column: str
) -> JdbcPartitionPlan:
    """Size the read: one partition per ``target_rows_per_partition``
    (the role the reference's ``fetch_size=1e6`` played, redshift.py:421),
    clamped to [1, 10_000] tasks."""
    if upper < lower:
        raise ValueError(f"upper bound {upper} < lower bound {lower}")
    n = max(1, min(10_000, -(-max(total_rows, 1) // max(target_rows_per_partition, 1))))
    return JdbcPartitionPlan(column, lower, upper, n)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    plan: JdbcPartitionPlan | None = None,
    **options,
) -> DataFrame:
    """Partitioned table read. With a plan, every executor scans one
    key range; without, a single-task read (small dims only)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if plan is not None:
        reader = reader.options(**plan.as_options())
    return reader.options(**options).load()


def read_jdbc_query(spark: SparkSession, url: str, sql: str, **options) -> DataFrame:
    """Arbitrary-SQL federated read (the reference's ``get_df(query)``
    surface). The warehouse plans/executes ``sql``; Spark parallelizes
    the fetch when partition options are passed."""
    return spark.read.format("jdbc").option("url", url).option("query", sql).options(**options).load()
