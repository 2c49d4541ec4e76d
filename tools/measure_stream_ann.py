#!/usr/bin/env python
"""Streaming ANN ingest + compaction at the 10x point (r9): stream half
the corpus into a stored index one landing file per trigger (16
micro-batch appends), and show (a) per-batch append wall is FLAT in
accumulated index size — the O(batch) ingest claim under streaming,
(b) search cost after 16 small batch dirs vs after compaction — the
file-count overhead compaction exists to reclaim.

Usage: python tools/measure_stream_ann.py [corpus_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.session import get_spark

N_FILES = 16


def main() -> int:
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.annindex import (
        ann_index_topk,
        append_ann_index,
        build_ann_index,
        compact_ann_index,
        read_ann_index,
        write_ann_index,
    )

    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    spark = get_spark(app_name="stream-ann")
    corpus = spark.read.parquet(f"{corpus_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    rest = corpus.filter(F.col("vec_id") % 2 == 1)
    n = corpus.count()
    step = max(1, n // 200)
    queries = corpus.filter(F.col("vec_id") % step == 0).limit(200)

    work = tempfile.mkdtemp(prefix="ann_stream_scale_")
    path, landing, ckpt = f"{work}/idx", f"{work}/landing", f"{work}/ckpt"
    t0 = time.time()
    write_ann_index(
        build_ann_index(base, n_centroids=64, m=8, k_codes=16, coarse="kmeans"),
        path,
    )
    print("base build+write:", round(time.time() - t0, 1), flush=True)
    rest.repartition(N_FILES).write.mode("overwrite").parquet(landing)

    batch_walls: list[float] = []

    def _ingest(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        t0 = time.time()
        append_ann_index(batch_df, path, batch_id=f"s{batch_id}")
        batch_walls.append(round(time.time() - t0, 2))

    q = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print(f"per-batch append walls ({len(batch_walls)} batches):", batch_walls, flush=True)
    print(
        "first-3 mean vs last-3 mean:",
        round(sum(batch_walls[:3]) / 3, 2),
        round(sum(batch_walls[-3:]) / 3, 2),
        flush=True,
    )

    def timed_search(tag: str) -> None:
        stored = read_ann_index(spark, path)
        t = None
        for _ in range(2):
            t0 = time.time()
            res = ann_index_topk(queries, stored, nprobe=8, k=10)
            res.write.format("noop").mode("overwrite").save()
            t = min(t or 9e9, time.time() - t0)
        files = sum(len(fs) for _, _, fs in os.walk(f"{path}/codes"))
        print({tag: round(t, 2), "codes files": files}, flush=True)

    timed_search("search over 1 base + %d stream batches" % len(batch_walls))
    t0 = time.time()
    compact_ann_index(spark, path)
    print("compaction wall:", round(time.time() - t0, 1), flush=True)
    timed_search("search after compaction")
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
