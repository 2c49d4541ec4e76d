"""Bloom-filter semi-join reduction — shuffle-avoidance hand-tool.

The 100 TB problem: a fact-dim join where the dim key set is too big
to broadcast as a hash relation (tens of millions of keys) still
shuffles the ENTIRE fact table, even though only a fraction of fact
rows survive the join. A Bloom filter of the dim keys is hundreds of
KB regardless of key count, broadcasts everywhere, and lets each fact
partition drop non-matching rows BEFORE the shuffle — the classic
semi-join reduction (what Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects for
shuffle joins; this operator makes the technique explicit, tunable,
and usable in front of any downstream op, not just joins).

Correctness: a Bloom filter has false positives but NO false
negatives, so ``prune -> exact join`` returns exactly the plain join's
rows — which is what the oracle checks.

Implementation is all JVM-side expressions:
* build: k bit positions per key via ``xxhash64(key, seed)``; the
  bitmap is assembled DISTRIBUTED (groupBy word index + bit_or), and
  only the finished ``m/64``-word array is collected — driver traffic
  is the filter size, never the key count;
* probe: the bitmap rides along as a one-row broadcast cross join;
  each fact row tests its k positions with shift/mask expressions
  inside whole-stage codegen — no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_prune"]


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions for a key: xxhash64 seeded by hash index.

    ``pmod`` keeps positions in [0, num_bits) for negative hashes.
    """
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """Build a Bloom bitmap of ``keys[key_col]`` as a ONE-ROW DataFrame
    ``(bloom: array<long>)`` of ``num_bits/64`` words, ready to
    broadcast-cross-join onto any fact table.

    Sizing: false-positive rate ~ (1 - e^(-k*n/m))^k; the default
    1 Mi bits / 3 hashes gives <2% at n=100k keys — at larger n, grow
    ``num_bits`` (the bitmap stays broadcast-cheap: 8 MiB at 2^26).
    """
    num_words = num_bits // 64
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, num_bits, num_hashes))).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.pmod("pos", F.lit(64)).cast("int").alias("b"),
        )
        .groupBy("w")
        # dynamic shift amounts need the SQL form (the PySpark
        # shiftleft wrapper only takes a literal shift)
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").alias("word"))
    )
    # densify to a fixed-length array: zeros everywhere, set words OR'd in
    dense = (
        words.groupBy()
        .agg(F.collect_list(F.struct("w", "word")).alias("ww"))
        .select(F.map_from_entries("ww").alias("wm"))
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_words - 1)),
                lambda i: F.coalesce(F.element_at("wm", i.cast("int")), F.lit(0).cast("long")),
            ).alias("bloom")
        )
    )
    return dense


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """Keep only fact rows whose key MIGHT be in the Bloom set (plus
    false positives; never drops a true match). Same columns as
    ``fact``. Follow with the exact join — this just shrinks what the
    shuffle has to move."""
    tests = [
        F.expr(
            f"(shiftright(element_at(bloom, CAST(pmod(xxhash64({key_col}, {i}), {num_bits}) / 64 AS INT) + 1), "
            f"CAST(pmod(pmod(xxhash64({key_col}, {i}), {num_bits}), 64) AS INT)) & CAST(1 AS BIGINT)) = 1"
        )
        for i in range(num_hashes)
    ]
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    return fact.crossJoin(F.broadcast(bloom)).filter(cond).drop("bloom")
