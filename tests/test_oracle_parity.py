"""The local mirror of the driver's correctness gate: every registered
query's PySpark result must match its DuckDB oracle bit-for-bit at
sf0.001 (fast); ``tools/check_parity.py`` runs the same at sf0.01."""

from __future__ import annotations

import pytest

from pandas_aws_spark.oracle import check_query, duckdb_connection
from pandas_aws_spark.registry import load_registry

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, sf_dir, name):
    spec = REGISTRY[name]
    res = check_query(spark, con, name, spec.fn, spec.oracle, sf_dir)
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows >= 0
