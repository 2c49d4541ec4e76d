#!/usr/bin/env python
"""Per-run semantic-decontamination cost: recompute-LSH vs stored-index
probe, small vs 10x train corpus (r13, the r12 verdict's missing #5).

The contract under test: the RECOMPUTE variant re-normalizes and
re-buckets the full train side on every benchmark run, so its per-run
wall grows with the corpus; the INDEX-BACKED variant pays the build
once (amortized across runs — the same economics that justify the ANN
artifact, SCALE.md r8) and each run is one ``ann_index_radius`` probe:
O(bench + probed-cell rows), with the probed-cell list pushed into the
stored-vectors scan as a literal filter. Protocol mirrors
tools/measure_batch_scale.py: warm JVM, min-of-2 per side-effect-free
op, full materialization via noop writes.

Usage: python tools/measure_sem_decontam.py
Env: SCALE_SMALL (default /root/testdata/sf0.01),
     SCALE_BIG (default /root/testdata/sf0.1).
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
    ann_index_radius,
    build_ann_index,
    read_ann_index,
    write_ann_index,
)
from pandas_aws_spark.operators.similarity import lsh_bucket, recommended_n_planes
from pandas_aws_spark.functions.vector import as_double, dot, norm
from pandas_aws_spark.session import get_spark

THR = 0.4
NCENT = 8
NPROBE = 2


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def measure(spark, sf_dir: str) -> dict:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    train_pred = "vec_id % 10 <> 0"
    train = emb.filter(train_pred)
    # the contract's shape: a FIXED held-out benchmark (it does not
    # grow with the crawl) against the growing train corpus
    bench = emb.filter(f"NOT ({train_pred})").limit(1000).localCheckpoint()
    n_train = train.count()

    # recompute variant: the q_dedup_semantic_decontaminate body —
    # normalize + bucket BOTH sides per run, salted bucket join
    npl = recommended_n_planes(n_train, 128)

    def recompute():
        t_side = (
            train.select("vec_id", as_double("embedding").alias("v"))
            .withColumn("bucket", lsh_bucket(F.col("v"), 64, npl))
            .withColumn("nv", norm(F.col("v")))
        )
        h = (
            bench.select("vec_id", as_double("embedding").alias("v"))
            .withColumn("bucket", lsh_bucket(F.col("v"), 64, npl))
            .withColumn("nv", norm(F.col("v")))
            .withColumn("salt", F.pmod(F.hash("vec_id"), F.lit(8)))
            .alias("h")
        )
        t = t_side.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(7)))
        ).alias("t")
        hits = (
            h.join(t, (F.col("h.bucket") == F.col("t.bucket")) & (F.col("h.salt") == F.col("t.salt")))
            .select(
                F.col("h.vec_id").alias("vec_id"),
                (dot(F.col("h.v"), F.col("t.v")) / (F.col("h.nv") * F.col("t.nv"))).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= THR)
        )
        _noop(hits.groupBy("vec_id").agg(F.count("*").alias("n"), F.max("cos_sim").alias("m")))

    t_recompute = _timed(recompute)

    # index-backed variant: build once (amortized), probe per run
    work = tempfile.mkdtemp(prefix="measure_sem_decontam_")
    path = f"{work}/idx"
    try:
        t0 = time.perf_counter()
        write_ann_index(
            build_ann_index(train, n_centroids=NCENT, m=8, k_codes=16, iters=2), path
        )
        t_build = time.perf_counter() - t0
        stored = read_ann_index(spark, path)

        def probe():
            hits = ann_index_radius(bench, stored, threshold=THR, nprobe=NPROBE)
            _noop(
                hits.groupBy("query_id").agg(
                    F.count("*").alias("n"), F.max("cos_sim").alias("m")
                )
            )

        t_probe = _timed(probe)

        # ADAPTIVE_TARGET=<rows/cell> (r14): measure the probe AFTER the
        # corpus-adaptive rebuild lifecycle — rebuild_ann_index derives
        # max(stored ncent, ceil(live/target)) and retrains, so this is
        # the drift-trigger path's post-restore probe cost, the number
        # the constant-rows/cell recipe (SCALE.md r13) predicts stays
        # flat vs corpus.
        t_rebuild = ncent_adaptive = t_probe_adaptive = None
        target = os.environ.get("ADAPTIVE_TARGET")
        if target:
            from pandas_aws_spark.operators.annindex import rebuild_ann_index

            t0 = time.perf_counter()
            rebuild_ann_index(spark, path, target_cell_rows=int(target))
            t_rebuild = time.perf_counter() - t0
            stored = read_ann_index(spark, path)
            ncent_adaptive = int(stored.params["n_centroids"])

            def probe_adaptive():
                hits = ann_index_radius(
                    bench, stored, threshold=THR, nprobe=NPROBE
                )
                _noop(
                    hits.groupBy("query_id").agg(
                        F.count("*").alias("n"), F.max("cos_sim").alias("m")
                    )
                )

            t_probe_adaptive = _timed(probe_adaptive)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    out = {
        "train_rows": n_train,
        "recompute_s": round(t_recompute, 2),
        "index_build_s": round(t_build, 2),
        "probe_s": round(t_probe, 2),
    }
    if t_probe_adaptive is not None:
        out |= {
            "rebuild_s": round(t_rebuild, 2),
            "ncent_adaptive": ncent_adaptive,
            "probe_adaptive_s": round(t_probe_adaptive, 2),
        }
    return out


def _synth(spark, n_rows: int, dim: int, out: str) -> None:
    """Deterministic pseudo-random unit-ish vectors: hash-derived
    floats, no Date/random (bit-stable across runs)."""
    cols = ", ".join(
        f"CAST(pmod(xxhash64(id * {d + 3}), 1000) AS DOUBLE) / 500.0 - 1.0"
        for d in range(dim)
    )
    spark.range(n_rows).selectExpr("id AS vec_id", f"array({cols}) AS embedding").write.mode(
        "overwrite"
    ).parquet(f"{out}/embeddings.parquet")


def main() -> int:
    if os.environ.get("SYNTH"):
        # SYNTH="<small_rows>,<big_rows>[,dim]": corpus sizes where the
        # asymptotic term is visible (the sf0.1 table is 2k vectors —
        # fixed job overhead buries everything). ncent scales sqrt-ish
        # via NCENT env; defaults below match the SCALE.md r13 row.
        parts = [int(x) for x in os.environ["SYNTH"].split(",")]
        small_rows, big_rows = parts[0], parts[1]
        dim = parts[2] if len(parts) > 2 else 16
        global NCENT
        NCENT = int(os.environ.get("NCENT", "64"))
        spark = get_spark(app_name="measure-sem-decontam-synth")
        spark.range(10).count()
        rows = []
        for label, n in (("small", small_rows), ("big", big_rows)):
            work = tempfile.mkdtemp(prefix=f"semd_{label}_")
            try:
                _synth(spark, n, dim, work)
                r = measure(spark, work)
                r["scale"] = label
                rows.append(r)
                extra = (
                    f" rebuild={r['rebuild_s']:7.2f}s "
                    f"ncent={r['ncent_adaptive']} "
                    f"probe_adaptive={r['probe_adaptive_s']:7.2f}s"
                    if "probe_adaptive_s" in r
                    else ""
                )
                print(
                    f"{label:5s} train={r['train_rows']:8d} "
                    f"recompute={r['recompute_s']:7.2f}s "
                    f"build_once={r['index_build_s']:7.2f}s "
                    f"probe={r['probe_s']:7.2f}s" + extra
                )
            finally:
                shutil.rmtree(work, ignore_errors=True)
        s, b = rows[0], rows[1]
        print(
            f"train x{b['train_rows'] / max(s['train_rows'], 1):.1f}: "
            f"recompute x{b['recompute_s'] / max(s['recompute_s'], 0.01):.2f}, "
            f"probe x{b['probe_s'] / max(s['probe_s'], 0.01):.2f}"
        )
        return 0
    small = os.environ.get("SCALE_SMALL", "/root/testdata/sf0.01")
    big = os.environ.get("SCALE_BIG", "/root/testdata/sf0.1")
    spark = get_spark(app_name="measure-sem-decontam")
    spark.read.parquet(f"{small}/embeddings.parquet").count()  # warm-up
    rows = []
    for label, d in (("small", small), ("big", big)):
        r = measure(spark, d)
        r["scale"] = label
        rows.append(r)
        print(
            f"{label:5s} train={r['train_rows']:8d} recompute={r['recompute_s']:7.2f}s "
            f"build_once={r['index_build_s']:7.2f}s probe={r['probe_s']:7.2f}s"
        )
    s, b = rows[0], rows[1]
    print(
        f"train x{b['train_rows'] / max(s['train_rows'], 1):.1f}: "
        f"recompute x{b['recompute_s'] / max(s['recompute_s'], 0.01):.2f}, "
        f"probe x{b['probe_s'] / max(s['probe_s'], 0.01):.2f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
