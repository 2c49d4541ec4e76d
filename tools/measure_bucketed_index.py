#!/usr/bin/env python
"""Measure the bucketed dedup-index layout the DedupIndex docstring
promises (`operators/dedup.py`): postings stored as a catalog table
bucketed on BOTH join keys (band, sig), so successive ingests probe
the index with NO Exchange on the index side. (Bucketing on sig alone
— the docstring's original sketch — is rejected by the planner:
"Bucketed: false (disabled by query planner)", because a subset-key
bucketed side cannot co-partition with the (band, sig) join under the
default requireAllClusterKeysForCopartition=true. Measured r8.)

Regime: the zero-exchange claim matters when the batch is too big to
broadcast (small batches already stream map-side under BHJ), so
autoBroadcastJoinThreshold is disabled to pin the sort-merge-join
regime deterministically — the 100 TB shape where the index side is
thousands of times the executor count.

Compares, for the same stored index (corpus documents) probed by the
same batch:
  A. path-parquet postings (the storage-agnostic default layout)
  B. bucketBy(32, sig) saveAsTable postings
measuring candidate generation (the posting probe join) and checking
the physical plan for Exchange operators above the index-side scan.

Usage: python tools/measure_bucketed_index.py [corpus_dir] [batch_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.session import get_spark


def candidates(buckets_batch, buckets_index, id_col="doc_id"):
    from pyspark.sql import functions as F

    a = buckets_batch.alias("a")
    b = buckets_index.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def main() -> int:
    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf10"
    batch_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1"
    spark = get_spark(app_name="bucketed-index")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.dedup import (
        build_dedup_index,
        doc_shingle_hashes,
        lsh_band_buckets,
        minhash_signatures,
        read_dedup_index,
        write_dedup_index,
    )

    corpus = spark.read.parquet(f"{corpus_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    batch = (
        spark.read.parquet(f"{batch_dir}/documents.parquet")
        .select((F.col("doc_id") + 100_000_000).alias("doc_id"), "text")
    )

    t0 = time.perf_counter()
    idx = build_dedup_index(corpus, "doc_id", "text")
    path = "/tmp/bucketed_idx_path"
    write_dedup_index(idx, path)
    t_build = time.perf_counter() - t0
    stored = read_dedup_index(spark, path)

    # B layout: same postings as a bucketed catalog table.
    t0 = time.perf_counter()
    spark.sql("DROP TABLE IF EXISTS dedup_postings_bucketed")
    # the catalog is per-session in-memory: a previous run's table files
    # survive in spark-warehouse without a catalog entry, so clear them
    import shutil

    shutil.rmtree("spark-warehouse/dedup_postings_bucketed", ignore_errors=True)
    (
        stored.buckets.write.mode("overwrite")
        .bucketBy(32, "band", "sig")
        .sortBy("band", "sig")
        .saveAsTable("dedup_postings_bucketed")
    )
    t_bucketed_write = time.perf_counter() - t0
    bucketed = spark.table("dedup_postings_bucketed")

    # batch postings, computed once and pinned so both probes time the
    # join only.
    sh_b = doc_shingle_hashes(batch, "doc_id", "text", 3, "affine")
    sig_b = minhash_signatures(sh_b, "doc_id", 8, "affine")
    bb = lsh_band_buckets(sig_b, "doc_id", 4, 2).localCheckpoint()

    results = {}
    for label, postings in (("path-parquet", stored.buckets), ("bucketBy(32,band,sig)", bucketed)):
        cand = candidates(bb, postings)
        plan = cand._jdf.queryExecution().executedPlan().toString()
        n_exchange = plan.count("Exchange")
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = cand.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[label] = (round(best, 2), n, n_exchange)
        print(f"{label:18s} probe={best:6.2f}s candidates={n} exchanges_in_plan={n_exchange}")
    print(f"build+store={t_build:.1f}s bucketed_write={t_bucketed_write:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
