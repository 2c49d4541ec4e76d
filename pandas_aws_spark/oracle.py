"""Local oracle-parity harness — mirrors the driver's correctness gate.

For each registered query this runs the PySpark implementation and the
DuckDB oracle SQL on the same parquet tables, then compares row count,
column names, and values (order-insensitive: columns sorted by name,
rows sorted by every column). Used by ``tests/test_oracle_parity.py``
and ``tools/check_parity.py`` so mismatches surface before the driver's
per-round CORRECTNESS check does.
"""

from __future__ import annotations

from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .registry import TABLES

__all__ = ["ParityResult", "duckdb_connection", "normalize", "compare_frames", "check_query"]


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = -1
    oracle_rows: int = -1


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """In-memory DuckDB with the driver's table views pre-registered."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all columns; unify dtypes enough
    that equal values compare equal (timestamps -> us, ints -> int64)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("int64")
        elif s.dtype == object:
            # REFUSE array/map cells instead of papering over them: the
            # driver's canonicalizer sorts rows via pandas sort_values,
            # which dies on list cells ('unhashable type: list' — the
            # exact r2 q_multimodal_frame_offsets failure; an earlier
            # list->tuple fallback here masked it, so local green did
            # not imply driver green). Queries must emit scalar columns
            # (explode / concat_ws the array).
            # Row (struct) cells are tuple subclasses and hit the same
            # unsortable failure mode — refuse them too.
            from pyspark.sql import Row

            if s.map(lambda v: isinstance(v, (list, np.ndarray, dict, Row, tuple))).any():
                raise TypeError(
                    f"column {c!r} contains array/map/struct cells — driver-"
                    "unsafe: the driver's row sort cannot canonicalize them; "
                    "reshape the query output to scalar columns"
                )
    if len(pdf) and len(pdf.columns):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, float_rtol: float = 0.0) -> str:
    """Return '' if equal, else a human-readable mismatch description."""
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return f"column mismatch: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"row-count mismatch: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        a_float = pd.api.types.is_float_dtype(av)
        b_float = pd.api.types.is_float_dtype(bv)
        if a_float != b_float:
            # Dtype-strict: the driver hashes values dtype-sensitively, so an
            # int64 column on one side and float64 on the other (the DuckDB
            # HUGEINT-promotion class: SUM(<int>) -> HUGEINT -> pandas float)
            # is a hard FAIL even when the values are numerically equal.
            # Coercing both to float here would mask exactly what the driver
            # catches — local green must imply driver green.
            return (
                f"dtype mismatch in {c!r}: spark={av.dtype} oracle={bv.dtype} "
                "(int-vs-float breaks the driver's dtype-sensitive hash; "
                "CAST the oracle aggregate, e.g. CAST(SUM(..) AS BIGINT))"
            )
        if a_float and b_float:
            av_f = av.astype("float64").to_numpy()
            bv_f = bv.astype("float64").to_numpy()
            exact = np.array_equal(av_f, bv_f, equal_nan=True)
            if not exact:
                with np.errstate(invalid="ignore"):
                    close = np.allclose(av_f, bv_f, rtol=1e-9, atol=1e-12, equal_nan=True)
                diff = np.nanmax(np.abs(av_f - bv_f)) if len(av_f) else 0.0
                return (
                    f"float column {c!r} not bit-identical "
                    f"(max abs diff {diff:.3e}, within 1e-9 rtol: {close})"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not bool(eq.all()):
                i = int(np.argmin(eq.to_numpy()))
                return f"value mismatch in {c!r} at sorted row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
    return ""


def check_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    fn,
    oracle: str | None,
    sf_dir: str,
) -> ParityResult:
    sdf: DataFrame = fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    # drop any intermediate caches the entry pinned while building its
    # plan (documented safe no-op for frames that cached nothing) — a
    # full-registry sweep would otherwise leak one CacheManager entry
    # per indexed-search invocation (r12 ADVICE).
    from .operators.dedup import release_cached_inputs

    release_cached_inputs(sdf)
    if oracle is None:
        # rows-only check, like the driver's weak path
        return ParityResult(name, True, "rows-only (no oracle)", len(spark_pdf), -1)
    oracle_pdf = con.sql(oracle).df()
    detail = compare_frames(spark_pdf, oracle_pdf)
    return ParityResult(name, detail == "", detail, len(spark_pdf), len(oracle_pdf))
