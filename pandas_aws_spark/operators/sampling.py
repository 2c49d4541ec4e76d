"""Deterministic sampling / splitting for training-data pipelines.

``df.sample()`` and ``sampleBy()`` draw from a seeded RNG whose stream
depends on partitioning — re-running after a repartition yields a
DIFFERENT sample, which poisons train/eval reproducibility. The
pipeline-grade alternative is content-hash bucketing: a row's split is
a pure function of its id, stable under any partitioning, any engine,
any rerun — and exactly replayable by the DuckDB oracle (same
md5-derived bucket arithmetic as the MinHash family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "sql_hash_bucket",
    "hash_split",
    "stratified_hash_sample",
    "temperature_rates",
    "hash_priority",
    "sql_hash_priority",
    "reservoir_per_group",
]

_BUCKETS = 10_000


def hash_bucket(c: Column, buckets: int = _BUCKETS) -> Column:
    """Stable bucket in [0, buckets) from a column's md5."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 7), 16, 10).cast("long") % buckets


def sql_hash_bucket(ref: str, buckets: int = _BUCKETS) -> str:
    """DuckDB mirror of :func:`hash_bucket`."""
    return (
        f"(CAST(concat('0x', substring(md5(CAST({ref} AS VARCHAR)),1,7)) AS BIGINT) % {buckets})"
    )


def hash_priority(c: Column) -> Column:
    """Uniform 56-bit integer priority from a column's md5 — a
    deterministic stand-in for the RNG draw of reservoir sampling.
    14 hex chars = 56 bits, comfortably inside BIGINT with no sign
    issues, and collision-free in practice (p < 1e-8 at 10^6 rows)."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 14), 16, 10).cast("long")


def sql_hash_priority(ref: str) -> str:
    """DuckDB mirror of :func:`hash_priority`."""
    return f"CAST(concat('0x', substring(md5(CAST({ref} AS VARCHAR)),1,14)) AS BIGINT)"


def reservoir_per_group(
    df: DataFrame, id_col: str, group_col: str, k: int
) -> DataFrame:
    """Deterministic k-per-group uniform sample — the reproducible
    equivalent of per-group reservoir sampling: every row draws a
    hash priority from its id and each group keeps its k smallest.
    Unlike a streaming reservoir (whose picks depend on encounter
    order) the result is a pure function of the data, identical
    across reruns, repartitions, and engines.

    Scale shape: one shuffle on ``group_col`` + a partitioned window
    top-k, which Spark 4 executes with per-partition k-row heaps
    (WindowGroupLimit pushdown) — no group is ever materialized in
    memory. Skewed groups stream through the heap; only k rows per
    group survive the window."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_priority(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("_rs_rn", F.row_number().over(w))
        .filter(F.col("_rs_rn") <= k)
        .drop("_rs_rn")
    )


def hash_split(df: DataFrame, id_col: str, fractions: dict[str, float]) -> dict[str, DataFrame]:
    """Disjoint, exhaustive named splits (e.g. train/val/test) by hash
    bucket range. Fractions must sum to <= 1; the remainder goes to no
    split. Stable across reruns, repartitions, and engines."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = hash_bucket(F.col(id_col))
    out: dict[str, DataFrame] = {}
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * _BUCKETS))
        out[name] = df.filter((b >= lo) & (b < hi))
        lo = hi
    return out


def stratified_hash_sample(
    df: DataFrame, id_col: str, stratum_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps rows whose
    bucket < fractions[s] * buckets (strata absent from ``fractions``
    are dropped). The hash-bucket analogue of ``sampleBy`` without its
    partitioning-dependent RNG."""
    b = hash_bucket(F.col(id_col))
    cond = F.lit(False)
    for stratum, frac in fractions.items():
        cond = cond | ((F.col(stratum_col) == stratum) & (b < int(round(frac * _BUCKETS))))
    return df.filter(cond)


def temperature_rates(
    per_source_tokens: DataFrame,
    *,
    source_col: str = "source",
    tokens_col: str = "src_tokens",
    alpha_sqrt: bool = True,
) -> DataFrame:
    """Per-source sampling rates (ppm) for temperature-flattened
    mixture sampling: rate_s ∝ sqrt(tokens_s) (alpha = 0.5), the
    standard multi-source rebalancing that upweights small sources.

    Stays in exact integer arithmetic: the weight is floor(sqrt(tokens))
    — floor of a correctly-rounded IEEE sqrt is engine-independent —
    and the normalization is integer division by the summed weights, so
    the rates are bit-identical on any engine and partitioning. The
    per-source table is tiny (one row per source) and meant to be
    broadcast back onto the corpus.
    """
    w = (
        F.expr(f"CAST(floor(sqrt(CAST({tokens_col} AS DOUBLE))) AS BIGINT)")
        if alpha_sqrt
        else F.col(tokens_col).cast("long")
    )
    weights = per_source_tokens.select(F.col(source_col), w.alias("wgt"))
    total = weights.agg(F.sum("wgt").alias("tw"))
    return (
        weights.crossJoin(F.broadcast(total))
        .select(source_col, F.expr("(1000000 * wgt) div tw").alias("rate_ppm"))
    )


def sample_to_token_budget(
    docs: DataFrame,
    rates: DataFrame,
    budget_tokens,
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    token_col: str = "n_tokens",
    rate_col: str = "rate_ppm",
) -> DataFrame:
    """Token-BUDGETED mixture selection — the materialization step after
    :func:`temperature_rates`: given per-source mixture rates (ppm) and
    a global token budget, pick the actual documents. Each source gets
    quota_s = budget * rate_s ppm; its docs are taken in hash-priority
    order (a deterministic uniform draw, same rationale as
    :func:`reservoir_per_group`) while the tokens BEFORE the doc are
    under the quota — the doc that crosses the boundary still lands, so
    every non-exhausted source fills its quota exactly, overshooting by
    at most one document (the same cut rule as
    ``text.pack_documents``). A pure function of (data, rates, budget):
    identical across reruns, repartitions, and engines.

    Scale shape: source is a LOW-cardinality group (handfuls of crawls
    / curated sets), exactly the case where ``Window.partitionBy(
    source)`` funnels each source through one task — so the running
    total comes from :func:`~pandas_aws_spark.operators.twophase.
    distributed_grouped_cumsum` (range-partitioned slices + broadcast
    per-group prefix offsets), and the kilobyte quota table broadcasts
    onto the result. No full-corpus single-task stage anywhere.

    ``budget_tokens`` may be an int or a one-row single-column
    DataFrame (e.g. ``total_tokens div 10`` computed upstream) — the
    latter joins in as a broadcast scalar so the budget can itself be
    data-derived without a driver round-trip."""
    from .twophase import distributed_grouped_cumsum

    quota_src = rates.select(F.col(source_col), F.col(rate_col).cast("long").alias("_rate"))
    if isinstance(budget_tokens, DataFrame):
        if len(budget_tokens.columns) != 1:
            raise ValueError(
                f"budget_tokens frame must carry exactly one column, got "
                f"{budget_tokens.columns}"
            )
        bcol = budget_tokens.columns[0]
        # in-plan exactly-one-row guard (no eager count job): a
        # multi-row budget frame would silently duplicate every quota
        # row (and every selected doc), and an EMPTY one would silently
        # select nothing. The aggregate always yields one row, so the
        # assert fires for both malformed shapes — a bare row-count
        # window could never flag the empty case (no row to carry the
        # assertion). The budget column is re-aliased into the _tb_
        # scratch namespace FIRST so a caller column literally named
        # like the count alias cannot collide (r12 review).
        b = (
            budget_tokens.select(F.col(bcol).alias("_tb_budget"))
            .agg(
                F.count(F.lit(1)).alias("_tb_n"),
                F.max("_tb_budget").alias("_tb_budget"),
            )
            .filter(
                F.assert_true(
                    F.col("_tb_n") == 1,
                    F.lit(
                        "sample_to_token_budget: budget_tokens must be exactly one row"
                    ),
                ).isNull()
            )
            .drop("_tb_n")
        )
        quota = quota_src.crossJoin(F.broadcast(b)).select(
            source_col,
            F.expr("(CAST(_tb_budget AS BIGINT) * _rate) div 1000000").alias("_quota"),
        )
    else:
        quota = quota_src.select(
            source_col,
            F.expr(f"(CAST({int(budget_tokens)} AS BIGINT) * _rate) div 1000000").alias(
                "_quota"
            ),
        )
    pri = docs.withColumn("_pri", hash_priority(F.col(id_col)))
    cum = distributed_grouped_cumsum(
        pri, source_col, ["_pri", id_col], token_col, out="_cum"
    )
    return (
        cum.join(F.broadcast(quota), source_col)
        .filter(F.col("_cum") - F.col(token_col) < F.col("_quota"))
        .drop("_pri", "_cum", "_quota")
    )
