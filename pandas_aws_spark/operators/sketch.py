"""Count-min sketch over a token/key stream — distributed sketch
construction as pure DataFrame ops.

The north-star extension list (BASELINE.json) calls for sketch
operators Spark lacks natively. A count-min sketch is the canonical
one for heavy-hitter / frequency estimation over corpora too large to
count exactly per key: ``d`` hash rows x ``w`` buckets of counters;
estimate(key) = min over rows of its bucket counter — always an
OVERestimate (collisions only add), with error <= N * e/w at
confidence 1 - (1/e)^d.

Scale shape: building the sketch is one explode (d rows per item) +
one groupBy — the shuffle carries at most d*w counter rows regardless
of input size, and partial aggregation collapses each partition to
<= d*w rows before the exchange. The finished sketch (d*w rows) is
broadcastable state usable for filtering/estimation joins.

Determinism: buckets come from the same md5-derived affine family as
MinHash (``operators/dedup``), so the DuckDB oracle rebuilds the
IDENTICAL sketch — even the approximation error is replayed exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _MINHASH_A, _MINHASH_B, MINHASH_P

__all__ = ["cms_bucket", "sql_cms_bucket", "cms_build", "cms_estimate"]


def _base_hash(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def cms_bucket(c: Column, row: int, width: int) -> Column:
    """Bucket of ``c`` in sketch row ``row`` (affine family member)."""
    return (F.lit(_MINHASH_A[row]) * _base_hash(c) + F.lit(_MINHASH_B[row])) % MINHASH_P % width


def sql_cms_bucket(ref: str, row: int, width: int) -> str:
    """DuckDB mirror of :func:`cms_bucket`."""
    h = f"CAST(concat('0x', substring(md5({ref}),1,7)) AS BIGINT)"
    return f"(({_MINHASH_A[row]} * {h} + {_MINHASH_B[row]}) % {MINHASH_P} % {width})"


def cms_build(items: DataFrame, key_col: str, *, depth: int = 4, width: int = 256) -> DataFrame:
    """Build the sketch: (row, bucket, cnt) with depth*width rows max.

    Each input row contributes one counter increment per sketch row —
    expressed as an array explode so the whole build is scan +
    partially-aggregated groupBy."""
    assert depth <= len(_MINHASH_A)
    entries = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                cms_bucket(F.col(key_col), j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        items.select(F.explode(entries).alias("e"))
        .groupBy(F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """Estimate each probe key's frequency: min over rows of its bucket
    counter. The sketch side is tiny (<= depth*width rows) and
    broadcast; probes never shuffle."""
    entries = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                cms_bucket(F.col(key_col), j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    lookups = probes.select(F.col(key_col), F.explode(entries).alias("e")).select(
        key_col, F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket")
    )
    return (
        lookups.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
