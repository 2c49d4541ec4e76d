#!/usr/bin/env python
"""Persisted ANN index artifact at scale (r8 verdict ask #2's SCALE
row): the full write/read/append lifecycle measured at the 10x/100x
embedding points, search-only wall directly comparable to the r8
`measure_ivfpq_search.py` isolation (same 200 queries, k=10, nprobe=8,
64 trained cells — that run passed an in-memory triple re-read from
bare parquet; this one goes through the real artifact API).

Also measures APPEND cost (a 1%-of-corpus batch with disjoint ids) and
search wall against the appended, re-read index — the O(batch) ingest
claim and the proof that searches after an append pay only the index's
own growth.

Usage: python tools/measure_ann_index.py [corpus_dir ...]
Defaults to /tmp/scale_sf1 (10x) and /tmp/scale_sf10 (100x) —
build with tools/make_scale_data.py.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.session import get_spark

NPROBE = 8
N_QUERIES = 200
CELLS = 64


def measure(spark, corpus_dir: str) -> dict:
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.annindex import (
        ann_index_topk,
        append_ann_index,
        build_ann_index,
        read_ann_index,
        write_ann_index,
    )

    corpus = spark.read.parquet(f"{corpus_dir}/embeddings.parquet")
    n = corpus.count()
    step = max(1, n // N_QUERIES)
    queries = corpus.filter(F.col("vec_id") % step == 0).limit(N_QUERIES)

    path = tempfile.mkdtemp(prefix="ann_index_scale_")
    t0 = time.perf_counter()
    idx = build_ann_index(
        corpus, n_centroids=CELLS, m=8, k_codes=16, coarse="kmeans"
    )
    write_ann_index(idx, path)
    t_build = time.perf_counter() - t0

    stored = read_ann_index(spark, path)
    t_search = None
    for _ in range(2):
        t0 = time.perf_counter()
        res = ann_index_topk(queries, stored, nprobe=NPROBE, k=10)
        res.write.format("noop").mode("overwrite").save()
        t_search = min(t_search or 9e9, time.perf_counter() - t0)
    rows = res.count()

    # append a 1% batch with disjoint ids (offset), then search the
    # re-read index — ingest is assign+encode of the BATCH only
    batch = corpus.filter(F.pmod(F.xxhash64("vec_id"), F.lit(100)) == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    n_batch = batch.count()
    t0 = time.perf_counter()
    append_ann_index(batch, path, batch_id="b1")
    t_append = time.perf_counter() - t0

    stored2 = read_ann_index(spark, path)
    t_search2 = None
    for _ in range(2):
        t0 = time.perf_counter()
        res2 = ann_index_topk(queries, stored2, nprobe=NPROBE, k=10)
        res2.write.format("noop").mode("overwrite").save()
        t_search2 = min(t_search2 or 9e9, time.perf_counter() - t0)

    shutil.rmtree(path, ignore_errors=True)
    return {
        "corpus": n,
        "cells": CELLS,
        "nprobe": NPROBE,
        "build+write": round(t_build, 1),
        "search 200q (min of 2)": round(t_search, 2),
        "result rows": rows,
        "append 1% batch": {"rows": n_batch, "wall": round(t_append, 1)},
        "search after append": round(t_search2, 2),
    }


def main() -> int:
    dirs = sys.argv[1:] or ["/tmp/scale_sf1", "/tmp/scale_sf10"]
    spark = get_spark(app_name="ann-index-scale")
    for d in dirs:
        print(f"{d}: {measure(spark, d)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
