#!/usr/bin/env python
"""Tombstone overhead at the 10x point (r9): search wall with a 10%
tombstone set applied at read time (broadcast anti-join on both index
frames) vs after compaction makes the deletion physical — quantifies
the cost ceiling logical deletes carry between compactions.

Usage: python tools/measure_tombstones.py [corpus_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.session import get_spark


def main() -> int:
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.annindex import (
        ann_index_topk,
        build_ann_index,
        compact_ann_index,
        delete_from_ann_index,
        read_ann_index,
        write_ann_index,
    )

    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    spark = get_spark(app_name="tombstones")
    corpus = spark.read.parquet(f"{corpus_dir}/embeddings.parquet")
    n = corpus.count()
    step = max(1, n // 200)
    queries = corpus.filter(F.col("vec_id") % step == 0).limit(200)
    path = tempfile.mkdtemp(prefix="ann_tomb_scale_")
    write_ann_index(
        build_ann_index(corpus, n_centroids=64, m=8, k_codes=16, coarse="kmeans"),
        path,
    )

    def timed(tag: str) -> None:
        stored = read_ann_index(spark, path)
        t = None
        for _ in range(2):
            t0 = time.time()
            res = ann_index_topk(queries, stored, nprobe=8, k=10)
            res.write.format("noop").mode("overwrite").save()
            t = min(t or 9e9, time.time() - t0)
        print({tag: round(t, 2), "live rows": stored.codes.count()}, flush=True)

    timed("clean index")
    delete_from_ann_index(
        corpus.filter(F.col("vec_id") % 10 == 7), path, batch_id="t1"
    )
    timed("10% tombstoned (anti-join at read)")
    t0 = time.time()
    compact_ann_index(spark, path)
    print("compaction wall:", round(time.time() - t0, 1), flush=True)
    timed("after compaction (physical)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
