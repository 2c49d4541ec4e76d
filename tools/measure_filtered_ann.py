#!/usr/bin/env python
"""Filtered-ANN search cost vs selectivity (r9): the payload predicate
is applied BEFORE the ADC stage and reaches the stored codes parquet
scan as a PushedFilter, so a selective filter PRUNES search work
rather than adding a post-filter pass. Builds one payload-carrying
index at the 10x point and times unfiltered vs ~10%-selectivity
search (200 queries, k=10, nprobe=8, 64 trained cells).

Usage: python tools/measure_filtered_ann.py [corpus_dir]
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
        read_ann_index,
        write_ann_index,
    )

    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    spark = get_spark(app_name="filtered-ann")
    corpus = spark.read.parquet(f"{corpus_dir}/embeddings.parquet")
    n = corpus.count()
    step = max(1, n // 200)
    queries = corpus.filter(F.col("vec_id") % step == 0).limit(200)
    path = tempfile.mkdtemp(prefix="ann_filtered_scale_")
    t0 = time.time()
    write_ann_index(
        build_ann_index(
            corpus, n_centroids=64, m=8, k_codes=16, coarse="kmeans",
            payload_cols=("label",),
        ),
        path,
    )
    print("build+write:", round(time.time() - t0, 1), flush=True)
    stored = read_ann_index(spark, path)
    for label, wh in (("unfiltered", None), ("label=3 (~10%)", "label = 3")):
        t = None
        for _ in range(2):
            t0 = time.time()
            res = ann_index_topk(queries, stored, nprobe=8, k=10, where=wh)
            res.write.format("noop").mode("overwrite").save()
            t = min(t or 9e9, time.time() - t0)
        print(
            {"search": label, "wall (min of 2)": round(t, 2), "rows": res.count()},
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
