"""Shared fixtures: one SparkSession per test run, sf0.001 data dir."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="pandas_aws_spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def query_frames(spark, sf_dir):
    """Every registry entry's DataFrame, built ONCE per test session
    (r16, the r15 verdict's ask #1 — suite wall time): building a
    lifecycle entry EXECUTES its index writes/merges, and the repo-wide
    plan gates (cartesian, unpartitioned-window, NLJ audit) plus the
    entry smoke test each re-built — and therefore re-executed — all
    ~240 entries, four full sweeps per run. One shared build preserves
    every assertion (the gates inspect plans, the NLJ audit executes
    the SAME frames) at a quarter of the cost. Scratch dirs are
    per-entry mkdtemp, so frames stay valid for the whole session."""
    from pandas_aws_spark.registry import load_registry

    return {
        name: spec.fn(spark, sf_dir)
        for name, spec in sorted(load_registry().items())
    }
