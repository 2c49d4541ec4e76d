"""Skew-mitigation operators — the hand-tools for when AQE isn't enough.

At 100 TB the failure mode of a shuffle isn't volume, it's *imbalance*:
one hot key (the null user, the default partition, the viral document)
lands an entire join side or aggregation group on one task. The
session enables AQE skew-join splitting (``session.py``), which covers
sort-merge joins; these operators cover the cases AQE can't rewrite:

* :func:`salted_join` — equi-join where BOTH sides are too big to
  broadcast and the probe side is skewed: salt the probe side into
  ``n_salt`` sub-keys, replicate the build side once per salt value.
  The hot key's rows spread over ``n_salt`` tasks at the cost of
  duplicating the (smaller, but not broadcastable) build side.
* :func:`two_phase_count_distinct` — COUNT(DISTINCT x) per group with
  hot groups: phase 1 reduces to distinct (group, x) pairs (the pair
  shuffle spreads a hot group across all partitions because x varies),
  phase 2 counts per group. Exact, and the classic rewrite Spark's
  planner uses internally for single-distinct aggregates — exposed
  here for multi-step pipelines that need it explicitly.

Salting is deterministic (hash of a high-cardinality column, not
``rand()``) so task retries and the DuckDB oracle replay identically;
the join RESULT is salt-invariant either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "two_phase_count_distinct"]


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    *,
    n_salt: int = 8,
    salt_from: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with probe-side salting for skewed keys.

    ``salt_from`` names a probe column of reasonable cardinality (a
    line number, a timestamp, an id) whose hash spreads the hot join
    key's rows across ``n_salt`` sub-keys. The build side is exploded
    ``n_salt``-fold so every sub-key finds its match — the explicit
    trade: ``n_salt`` x build-side shuffle volume buys ``n_salt`` x
    parallelism on the hottest key.
    """
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    salted_probe = probe.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salt)))
    salted_build = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    out = salted_probe.join(salted_build, on=[*keys, "_salt"], how=how)
    return out.drop("_salt")


def two_phase_count_distinct(
    df: DataFrame, group_cols: list[str], distinct_col: str, alias: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) GROUP BY group_cols, as two
    shuffle-balanced phases.

    Phase 1 groups by (group, value): a group with a billion rows but a
    million distinct values shuffles a million pairs spread over every
    partition (the value term randomizes placement). Phase 2 counts
    rows per group — input already deduplicated, so the hot group costs
    its distinct count, not its row count.
    """
    pairs = df.select(*group_cols, distinct_col).groupBy(*group_cols, distinct_col).agg(
        F.lit(1).alias("_one")
    )
    return pairs.groupBy(*group_cols).agg(F.count("*").alias(alias))
