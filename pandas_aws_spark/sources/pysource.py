"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API)
— the engine's source-extensibility proof.

The reference's closest analogue is its format-dispatch reader family
(``pandas_aws/s3.py:211-294``): a fixed menu of formats the library
author hard-coded. Spark 4's Python Data Source API is the open
version — a third format arrives as a class, not a fork — and plugs
into the planner like any built-in source (partitioned, lazy,
column-prunable downstream).

``SyntheticEventsSource`` generates a deterministic event feed from
pure integer formulas (no RNG), partitioned into ``num_partitions``
independent row ranges — so it scales like a real source (each task
generates its slice; nothing driver-side) and every value is exactly
reproducible by DuckDB's ``generate_series`` for the oracle gate.

Row formulas (i = 0 .. n_rows-1):
    event_id = i
    user_id  = i % num_users
    etype    = ['view','click','purchase','signup','error'][i % 5]
    value    = (i * 7 % 1000) / 10.0          -- one exact decimal digit
    ts       = TIMESTAMP '2024-01-01' + i seconds
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_ETYPES = ("view", "click", "purchase", "signup", "error")


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.num_users = int(options.get("num_users", 100))
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self):
        step = -(-self.n_rows // self.num_partitions)
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        for i in range(partition.start, partition.end):
            yield (
                i,
                i % self.num_users,
                _ETYPES[i % 5],
                (i * 7 % 1000) / 10.0,
                base + dt.timedelta(seconds=i),
            )


class SyntheticEventsSource(DataSource):
    """``spark.read.format("synthetic_events").option("n_rows", N)``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double, ts timestamp"

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)


class _SyntheticEventsStreamReader(DataSourceStreamReader):
    """Offset = row index. Each micro-batch advances by ``batch_rows``
    until ``n_rows`` — a real incremental source (offset log, commit
    calls, per-partition executor-side generation), deterministic
    end-to-end so the drained stream equals the batch formulas."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.num_users = int(options.get("num_users", 100))
        self.num_partitions = int(options.get("num_partitions", 4))
        self.batch_rows = int(options.get("batch_rows", self.n_rows))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # advance one batch per trigger; availableNow drains in
        # ceil(n_rows / batch_rows) micro-batches
        return {"row": self.n_rows}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["row"], end["row"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        step = -(-(hi - lo) // self.num_partitions)
        return [
            _RangePartition(p, min(p + step, hi)) for p in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        return _SyntheticEventsReader(
            {"n_rows": self.n_rows, "num_users": self.num_users}
        ).read(partition)

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsStreamSource(DataSource):
    """``spark.readStream.format("synthetic_events_stream")`` — the
    streaming twin of :class:`SyntheticEventsSource`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double, ts timestamp"

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    # Data-source classes are cloudpickled to separate Python planner/
    # reader processes, which resolve by-reference pickles through
    # their own sys.path — broken whenever the driver didn't start in
    # the repo. Registering this module for by-value pickling ships the
    # class code inside the pickle itself (this module only imports
    # pyspark, so the closure is self-contained); addPyFile covers the
    # task-side imports.
    import sys

    from pyspark import cloudpickle

    from ..registry import ship_package

    ship_package(spark)
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(SyntheticEventsSource)
    spark.dataSource.register(SyntheticEventsStreamSource)


def sql_synthetic_events(n_rows: int, num_users: int) -> str:
    """DuckDB replay of the source's formulas (oracle side)."""
    return f"""
SELECT i AS event_id,
       i % {num_users} AS user_id,
       ['view','click','purchase','signup','error'][(i % 5) + 1] AS event_type,
       CAST(i * 7 % 1000 AS DOUBLE) / 10.0 AS value,
       TIMESTAMP '2024-01-01' + i * INTERVAL 1 SECOND AS ts
FROM generate_series(0, {n_rows - 1}) AS t(i)
"""
