"""Federated warehouse reads AND writes over JDBC — SURVEY.md §2.1
S7(a) and the remote leg of §2.2 K9/K10 + §2.3 M1–M4.

The reference streams arbitrary-SQL results through psycopg2
``cursor.fetchmany(fetch_size)`` on the driver
(``/root/reference/pandas_aws/redshift.py:417-448``) — bounded memory,
but single-connection and driver-resident. The Spark-native
replacement is the JDBC source with *partitioned* reads: N executors
each open a connection for one slice of ``partition_column``, so a
100 GB result lands as N parallel scans instead of one fetch loop.

The write side (r12, the r10/r11 verdicts' carried ask #5) mirrors
the reference's REMOTE load path: ``upload_to_redshift`` stages gzip
csv on S3 and COPYs it in (``redshift.py:124-189,309-334``), and
``upsert_rows`` loads a stage table then runs a
DELETE-USING/INSERT-SELECT transaction (``redshift.py:336-416``).
Here the S3+COPY hop collapses into Spark's JDBC batch writer — N
executors each hold one connection and stream ``batchsize``-row
executeBatch inserts — and the merge transaction is emitted as
statements for the warehouse to run, preserving the reference's exact
semantics (ALL duplicate-key update rows land; the engine-side twin
is ``WarehouseClient.upsert``).

No warehouse exists in the test container, so — exactly like the read
side — everything that DECIDES (connection sizing, option assembly,
the staged-merge statement sequence) is pure functions, unit-tested
directly; ``write_jdbc`` is a thin ``df.write.format('jdbc')``
assembly over them, and ``upsert_jdbc`` composes the three steps with
an injectable statement runner.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "JdbcPartitionPlan",
    "JdbcWritePlan",
    "plan_partitions",
    "plan_write",
    "read_jdbc",
    "read_jdbc_query",
    "write_jdbc",
    "stage_table_statements",
    "upsert_statements",
    "upsert_jdbc",
]


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


# ---------------------------------------------------------------------------
# Write side (r12). Everything below that decides is pure; only
# write_jdbc's final .save() and upsert_jdbc's runner calls touch a
# live warehouse.
# ---------------------------------------------------------------------------

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)?")


def _check_ident(name: str, what: str) -> str:
    """Reject identifiers that would escape the generated statements —
    the statements run verbatim on the warehouse, so table/column names
    are restricted to plain (optionally schema-qualified) identifiers;
    anything fancier belongs in a hand-written statement."""
    if not isinstance(name, str) or not _IDENT.fullmatch(name):
        raise ValueError(f"{what} {name!r} is not a plain SQL identifier")
    return name


@dataclass(frozen=True)
class JdbcWritePlan:
    """Executor-side write shape: ``num_partitions`` concurrent
    warehouse connections, each streaming ``batch_size``-row
    executeBatch inserts under ``isolation_level``. The knobs map 1:1
    onto the Spark JDBC writer options."""

    num_partitions: int
    batch_size: int = 10_000
    isolation_level: str = "READ_COMMITTED"

    def as_options(self) -> dict[str, str]:
        return {
            "numPartitions": str(self.num_partitions),
            "batchsize": str(self.batch_size),
            "isolationLevel": self.isolation_level,
        }


def plan_write(
    total_rows: int,
    *,
    target_rows_per_task: int = 1_000_000,
    max_connections: int = 64,
    batch_size: int = 10_000,
    isolation_level: str = "READ_COMMITTED",
) -> JdbcWritePlan:
    """Size the write the way :func:`plan_partitions` sizes reads —
    one task per ``target_rows_per_task`` — but clamped to
    ``max_connections``: a warehouse's concurrent-connection budget is
    the binding constraint on the write side (Redshift defaults to a
    ~500-connection cluster cap shared by every client; 10k write
    tasks would be a self-inflicted connection storm, unlike reads
    where tasks queue politely). ``isolation_level='NONE'`` is the
    fast bulk-append mode for staging tables nobody reads
    mid-load."""
    if max_connections < 1:
        raise ValueError(f"max_connections must be >= 1, got {max_connections}")
    n = max(
        1,
        min(max_connections, -(-max(total_rows, 1) // max(target_rows_per_task, 1))),
    )
    return JdbcWritePlan(n, batch_size=batch_size, isolation_level=isolation_level)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    plan: JdbcWritePlan | None = None,
    **options,
) -> None:
    """Partitioned federated write: N executors each open one
    connection and batch-insert their slice — the distributed
    replacement for the reference's S3-stage + COPY hop
    (``redshift.py:124-189``), whose whole purpose was to get
    parallelism Redshift-side that psycopg2 could not provide
    client-side. The plan's ``numPartitions`` option is enforced by
    the Spark JDBC writer itself — it coalesces (never a shuffle) when
    the frame has more partitions, and fewer partitions simply use
    fewer connections — so no driver-side ``df.rdd`` partition probe
    is needed (r12 review fix: the probe forced physical planning of
    every written frame just to learn a count Spark already acts
    on)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if plan is not None:
        writer = writer.options(**plan.as_options())
    writer.options(**options).mode(mode).save()


def stage_table_statements(
    target_table: str,
    *,
    stage_table: str | None = None,
    audit_col: str | None = "date_insert",
) -> tuple[str, list[str]]:
    """``(stage_name, statements)`` preparing a stage table shaped
    like the target — the reference's
    ``_create_temp_redshift_table_from_target``
    (``redshift.py:336-346``) verbatim: drop any leftover stage,
    CREATE ... (LIKE target), and drop the audit column so the insert
    leg re-defaults it (fresh timestamp per staged row, the same rule
    ``WarehouseClient.upsert`` applies engine-side)."""
    target = _check_ident(target_table, "target_table")
    stage = stage_table or f"stage_{target.replace('.', '_')}"
    _check_ident(stage, "stage_table")
    stmts = [
        f"DROP TABLE IF EXISTS {stage}",
        f"CREATE TABLE {stage} (LIKE {target})",
    ]
    if audit_col:
        _check_ident(audit_col, "audit_col")
        stmts.append(f"ALTER TABLE {stage} DROP COLUMN {audit_col}")
    return stage, stmts


def upsert_statements(
    target_table: str,
    stage_table: str,
    keys: list[str],
    *,
    insert_cols: list[str] | None = None,
) -> list[str]:
    """The merge transaction the reference runs after loading the
    stage (``redshift.py:348-384``): inside ONE transaction, delete
    target rows whose composite key appears in the stage, insert ALL
    staged rows (duplicate keys all land — reference §3.4 semantics,
    identical to ``WarehouseClient.merge_frames``), drop the stage.
    Emitted as a single multi-statement transaction string per the
    reference's own batching, so a warehouse crash mid-merge rolls
    back to the pre-upsert table.

    ``insert_cols`` (r12 review fix): the staged columns, emitted as an
    explicit BY-NAME column list on the INSERT. The reference's bare
    ``INSERT INTO target SELECT *`` is positional and only correct
    because its DDL always appends the audit column LAST; against a
    target whose audit column sits mid-schema it silently shifts every
    later column one slot left. :func:`upsert_jdbc` always passes the
    update frame's columns; None keeps the reference-verbatim
    positional form for callers that guarantee the audit-col-last
    layout."""
    target = _check_ident(target_table, "target_table")
    stage = _check_ident(stage_table, "stage_table")
    if not keys:
        raise ValueError("upsert needs at least one comparison key")
    comparison = " AND ".join(
        f"{target}.{_check_ident(k, 'key')} = {stage}.{k}" for k in keys
    )
    if insert_cols is not None:
        cols = ", ".join(_check_ident(c, "insert_col") for c in insert_cols)
        insert = f"INSERT INTO {target} ({cols}) SELECT {cols} FROM {stage}"
    else:
        insert = f"INSERT INTO {target} SELECT * FROM {stage}"
    return [
        "BEGIN TRANSACTION;\n"
        f"DELETE FROM {target} USING {stage} WHERE {comparison};\n"
        f"{insert};\n"
        f"DROP TABLE {stage};\n"
        "END TRANSACTION;"
    ]


def upsert_jdbc(
    updates: DataFrame,
    url: str,
    target_table: str,
    keys: list[str],
    *,
    run_statement,
    plan: JdbcWritePlan | None = None,
    stage_table: str | None = None,
    audit_col: str | None = "date_insert",
    _writer=None,
) -> None:
    """Remote upsert, composed exactly as the reference composes it
    (``upsert_rows``, ``redshift.py:386-416``): prepare the stage,
    bulk-load it (the :func:`write_jdbc` leg replacing S3+COPY), then
    run the merge transaction. ``run_statement`` is the caller's
    statement executor (psycopg2 cursor, JayDeBeApi, an ops runbook
    runner …) — statement execution is deliberately NOT smuggled
    through Spark's JDBC reader, which cannot run DDL/DML.
    ``_writer`` is test injection for the load leg."""
    stage, prep = stage_table_statements(
        target_table, stage_table=stage_table, audit_col=audit_col
    )
    for s in prep:
        run_statement(s)
    (_writer or write_jdbc)(updates, url, stage, mode="append", plan=plan)
    for s in upsert_statements(
        target_table, stage, keys, insert_cols=list(updates.columns)
    ):
        run_statement(s)
