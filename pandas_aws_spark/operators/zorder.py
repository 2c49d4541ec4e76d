"""Z-order (Morton) clustering — multi-dimensional data-skipping layout.

The 100 TB problem a linear sort can't solve: sorting files by column
A gives perfect min/max pruning on A and NONE on B — a filter on B
still reads every file. Interleaving the bits of both columns' ranks
(the Z-order curve) gives every file a narrow min/max range on BOTH
columns, so parquet row-group stats / file-level min-max indexes prune
scans for predicates on either dimension (the layout trick behind
Delta/Iceberg ``ZORDER BY`` / ``sort_order``; here as a first-class
operator over plain parquet).

Everything is integer arithmetic on JVM-side expressions — affine
rank normalization then bit interleave — and ``sql_zorder_key``
regenerates the identical value in DuckDB, so layout queries stay
oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sql_zorder_key", "zorder_write_layout"]


def _norm(col: str, lo: str, hi: str, bits: int, *, sql: bool) -> str:
    """Affine map of ``col`` from [lo, hi] onto [0, 2^bits) in pure
    integer math (identical in Spark and DuckDB)."""
    div = "//" if sql else "div"
    return f"((({col}) - ({lo})) * {1 << bits}) {div} (({hi}) - ({lo}) + 1)"


def _zkey_expr(na: str, nb: str, bits: int, *, sql: bool) -> str:
    if sql:
        # every term fully parenthesized: '+' binds tighter than '<<'
        terms = [f"(((({na}) >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
        terms += [f"(((({nb}) >> {i}) & 1) << {2 * i})" for i in range(bits)]
        return "(" + " + ".join(terms) + ")"
    terms = [f"shiftleft(shiftright({na}, {i}) & 1, {2 * i + 1})" for i in range(bits)]
    terms += [f"shiftleft(shiftright({nb}, {i}) & 1, {2 * i})" for i in range(bits)]
    return "(" + " + ".join(terms) + ")"


def sql_zorder_key(
    col_a: str,
    col_b: str,
    *,
    a_min: str,
    a_max: str,
    b_min: str,
    b_max: str,
    bits: int = 8,
) -> str:
    """DuckDB expression producing the identical Morton key (bounds may
    be scalar-subquery strings)."""
    na = _norm(col_a, a_min, a_max, bits, sql=True)
    nb = _norm(col_b, b_min, b_max, bits, sql=True)
    return _zkey_expr(na, nb, bits, sql=True)


def zorder_write_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    bits: int = 8,
    n_buckets: int = 8,
) -> DataFrame:
    """Adds ``zval`` (Morton key) and ``zbucket`` (top log2(n_buckets)
    bits — the deterministic file assignment) to ``df``.

    Write path: ``.repartition(n_buckets, 'zbucket').sortWithinPartitions
    ('zval').write.parquet(...)`` — every output file then spans a
    narrow range of BOTH columns (locality asserted in
    tests/test_zorder.py). Bounds come from one min/max scan here;
    at scale feed them from catalog/partition stats instead.
    """
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    na = _norm(col_a, str(lo_a), str(hi_a), bits, sql=False)
    nb = _norm(col_b, str(lo_b), str(hi_b), bits, sql=False)
    import math

    shift = 2 * bits - int(math.log2(n_buckets))
    return df.withColumn("zval", F.expr(_zkey_expr(na, nb, bits, sql=False))).withColumn(
        "zbucket", F.expr(f"shiftright(zval, {shift})")
    )
