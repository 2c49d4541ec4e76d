"""pandas_aws_spark — a PySpark-native analytics engine with the
capability surface of ``FlorentPajot/pandas-aws`` (reference at
``/root/reference/``), redesigned Spark-first for 100 TB scale.

Public surface (mirrors the reference's capability, not its code):

* :func:`pandas_aws_spark.session.get_spark` — session/credential
  factory (reference ``pandas_aws/__init__.py:7-14``).
* :mod:`pandas_aws_spark.objectstore` — object-store DataFrame I/O:
  ``list_keys`` / ``read_df`` / ``read_df_from_prefix`` / ``write_df``
  (reference ``pandas_aws/s3.py``).
* :mod:`pandas_aws_spark.warehouse` — warehouse-table surface:
  DDL from schema, bulk upload, arbitrary-SQL query, keyed upsert
  (reference ``pandas_aws/redshift.py``).
* :mod:`pandas_aws_spark.operators` — north-star extension operators:
  dedup, similarity search, text analysis, multimodal columns.
* :mod:`pandas_aws_spark.streaming` — Structured-Streaming variants of
  the event-stream queries.
* :mod:`pandas_aws_spark.registry` — the named-query corpus consumed
  by ``__spark_entry__.py`` / the driver.
"""

from .session import get_spark  # noqa: F401

__version__ = "0.1.0"
