#!/usr/bin/env python
"""Realistic-bench A/B of the probed-cell pruning past the parquet
In-filter threshold (r15, the r14 verdict's asks #1 and #4).

The r14 A/Bs proved row-group skipping with <=2-cell probe sets; the
judge measured that Spark's `spark.sql.parquet.pushdown.
inFilterThreshold` (default 10) silently degrades the pushed literal
set past 10 distinct values. A realistic decontamination bench
(hundreds of queries x nprobe>=2 against ncent>=64) probes far more
than 10 distinct cells, so r15 raises the threshold inside
`ann_index_topk` / `ann_index_radius`. This tool measures that regime
directly, on BOTH parquet encodings of the cell column:

* dictionary-encoded (what a toy-scale write produces): parquet-mr's
  dictionary filter prunes row groups even under the degraded set
  predicate — the cliff is MASKED;
* plain-encoded (what large row groups fall back to when the column
  chunk outgrows dictionary limits): only row-group stats remain, the
  degraded predicate's stats check is the set's [min,max] envelope,
  and the scan reads ~everything — the cliff the raise exists to
  close.

Per artifact and per search shape (radius, top-k) it reports the
executed vectors/codes scan `numOutputRows` and wall with the
operator's raised threshold vs the same plan executed with the
threshold forced back to the Spark default (the conf is read at
ACTION time, so setting it after the operator call replays the
pre-r15 behavior faithfully — bit-identical plan, different reader).

Usage: python tools/measure_in_threshold.py
Env: SYNTH="<rows>[,dim]" (default "900000,16"), NCENT (default 643 —
     the count the adaptive rebuild derives at 900k, SCALE.md r14),
     NQUERIES (comma list of bench sizes, default "200,20"),
     NPROBE (default 2). The SCALE.md r15 table is the default run.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pandas_aws_spark.operators.annindex import (
    _IN_FILTER_THRESHOLD_CONF,
    ann_index_radius,
    ann_index_topk,
    build_ann_index,
    read_ann_index,
    write_ann_index,
)
from pandas_aws_spark.plans.inspect import scan_output_rows
from pandas_aws_spark.session import get_spark

NCENT = int(os.environ.get("NCENT", "643"))
# comma list: one artifact serves several bench sizes (the pruning
# benefit scales as ncent / (queries x nprobe) — a per-run union)
NQUERIES_LIST = [int(x) for x in os.environ.get("NQUERIES", "200,20").split(",")]
NQUERIES = max(NQUERIES_LIST)
NPROBE = int(os.environ.get("NPROBE", "2"))
RADIUS_THR = 0.4


def _vec_expr(dim: int) -> str:
    cols = ", ".join(
        f"CAST(pmod(xxhash64(id * {d + 3}), 1000) AS DOUBLE) / 500.0 - 1.0"
        for d in range(dim)
    )
    return f"array({cols}) AS embedding"


def _build_artifact(spark, n_rows: int, dim: int, out: str, dictionary: bool) -> str:
    """One clustered index; the cell column's encoding is forced via
    the writer-side hadoop conf (the session-global switch is what
    write_ann_index's executors read). The write runs with AQE
    partition coalescing off and ~NCENT shuffle partitions so the
    synthetic corpus fans out to cell-narrow files — at 100 TB the data
    volume forces this fan-out by itself; a coalesced toy write would
    put many cells per row group and no predicate could skip anything,
    measuring the layout's granularity floor instead of the pushdown."""
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    coalesce_conf = "spark.sql.adaptive.coalescePartitions.enabled"
    old_coalesce = spark.conf.get(coalesce_conf)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    hc.setBoolean("parquet.enable.dictionary", dictionary)
    spark.conf.set(coalesce_conf, "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(max(64, NCENT)))
    try:
        corpus = spark.range(n_rows).selectExpr("id AS vec_id", _vec_expr(dim))
        path = f"{out}/idx_{'dict' if dictionary else 'plain'}"
        write_ann_index(
            build_ann_index(corpus, n_centroids=NCENT, m=8, k_codes=16, iters=1),
            path,
        )
        return path
    finally:
        hc.setBoolean("parquet.enable.dictionary", True)
        spark.conf.set(coalesce_conf, old_coalesce)
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _bench_queries(spark, n_rows: int, dim: int):
    """A held-out fixed bench: NQUERIES rows hashed from ids past the
    corpus range (never indexed)."""
    return (
        spark.range(n_rows, n_rows + NQUERIES)
        .selectExpr("id AS vec_id", _vec_expr(dim))
        .localCheckpoint()
    )


def _measure(spark, mk_frame, substr_rows: tuple[str, ...], default_thr: bool):
    """Fresh frame per rep (metrics are accumulators — never re-collect
    the same frame); wall = min of 2, rows from the first rep."""
    walls, reads = [], None
    for _ in range(2):
        frame = mk_frame()  # operator call raises the threshold
        if default_thr:
            spark.conf.set(_IN_FILTER_THRESHOLD_CONF, "10")
        t0 = time.perf_counter()
        rows = scan_output_rows(frame)
        walls.append(time.perf_counter() - t0)
        if reads is None:
            reads = {
                s: sum(r for d, r in rows if s in d) for s in substr_rows
            }
    return min(walls), reads


def main() -> int:
    parts = [int(x) for x in os.environ.get("SYNTH", "900000,16").split(",")]
    n_rows = parts[0]
    dim = parts[1] if len(parts) > 1 else 16
    spark = get_spark(app_name="measure-in-threshold")
    spark.range(10).count()
    work = tempfile.mkdtemp(prefix="inthr_")
    try:
        q = _bench_queries(spark, n_rows, dim)
        print(
            f"corpus={n_rows} dim={dim} ncent={NCENT} "
            f"bench={NQUERIES} nprobe={NPROBE} loadavg={os.getloadavg()[0]:.2f}"
        )
        from pandas_aws_spark.functions.vector import as_double
        from pandas_aws_spark.operators.pq import l2_normalize, probe_frame

        for dictionary in (True, False):
            path = _build_artifact(spark, n_rows, dim, work, dictionary)
            stored = read_ann_index(spark, path)
            enc = "dict " if dictionary else "plain"
            for nq in NQUERIES_LIST:
                qb = q.limit(nq).localCheckpoint()
                # probed-cell cardinality (the quantity that crosses
                # the default threshold at realistic bench sizes)
                qn = l2_normalize(
                    qb.select(
                        F.col("vec_id").alias("query_id"),
                        as_double("embedding").alias("qv"),
                    ),
                    vec_col="qv",
                )
                ncells = (
                    probe_frame(qn, stored.centroids, "embedding", NPROBE)
                    .select("cell")
                    .distinct()
                    .count()
                )
                print(
                    f"[{enc}] bench={nq}: distinct probed cells "
                    f"{ncells}/{NCENT} (default threshold: 10)"
                )
                for label, default_thr in (
                    ("raised(r15)", False),
                    ("default(10)", True),
                ):
                    w, reads = _measure(
                        spark,
                        lambda: ann_index_radius(
                            qb, stored, threshold=RADIUS_THR, nprobe=NPROBE
                        ),
                        ("vectors",),
                        default_thr,
                    )
                    print(
                        f"[{enc}] bench={nq} radius thr={label:12s} "
                        f"wall={w:6.2f}s "
                        f"vectors_read={reads['vectors']}/{n_rows} "
                        f"({100.0 * reads['vectors'] / n_rows:.1f}%)"
                    )
                for label, default_thr in (
                    ("raised(r15)", False),
                    ("default(10)", True),
                ):
                    w, reads = _measure(
                        spark,
                        lambda: ann_index_topk(
                            qb, stored, nprobe=NPROBE, k=10, oversample=5
                        ),
                        ("codes", "vectors"),
                        default_thr,
                    )
                    print(
                        f"[{enc}] bench={nq} topk   thr={label:12s} "
                        f"wall={w:6.2f}s "
                        f"codes_read={reads['codes']}/{n_rows} "
                        f"({100.0 * reads['codes'] / n_rows:.1f}%) "
                        f"vectors_read={reads['vectors']}/{n_rows} "
                        f"({100.0 * reads['vectors'] / n_rows:.1f}%)"
                    )
        print(f"loadavg_end={os.getloadavg()[0]:.2f}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
