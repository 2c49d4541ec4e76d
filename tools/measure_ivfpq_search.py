#!/usr/bin/env python
"""IVF-PQ search-only isolation (r6 verdict ask #6 / r7 ask #2).

Separates the one-time index build from the per-search cost the
build-once/search-many deployment claim rests on: build the index
triple once per corpus (`ivf_pq_build(coarse="kmeans")`), WRITE it to
parquet, re-read it, and time `ivf_pq_topk` runs that pass the stored
triple — so training/encoding/cell assignment are out of the measured
path and only probe selection + ADC + re-rank remain.

Usage: python tools/measure_ivfpq_search.py [corpus_dir ...]
Defaults to the 10x and 100x embedding scale points
(/tmp/scale_sf1, /tmp/scale_sf10 — build with make_scale_data.py).

Config: fixed nprobe=8 across scale points (the promised isolation);
cells are reported per run — 64 fixed, plus the sqrt-scaled
production knob at the largest point to show the lever that keeps
per-query scanned rows ~sqrt(n).
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.session import get_spark

NPROBE = 8
N_QUERIES = 200


def measure(spark, corpus_dir: str, n_centroids: int) -> dict:
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.pq import ivf_pq_build, ivf_pq_topk

    corpus = spark.read.parquet(f"{corpus_dir}/embeddings.parquet")
    n = corpus.count()
    step = max(1, n // N_QUERIES)
    queries = corpus.filter(F.col("vec_id") % step == 0).limit(N_QUERIES)

    t0 = time.perf_counter()
    cents, cb, codes = ivf_pq_build(
        corpus, n_centroids=n_centroids, m=8, k_codes=16, coarse="kmeans"
    )
    store = tempfile.mkdtemp(prefix="ivfpq_idx_")
    cents.write.mode("overwrite").parquet(f"{store}/centroids")
    cb.write.mode("overwrite").parquet(f"{store}/codebook")
    codes.write.mode("overwrite").parquet(f"{store}/codes")
    t_build = time.perf_counter() - t0

    stored = {
        "centroids": spark.read.parquet(f"{store}/centroids"),
        "codebook": spark.read.parquet(f"{store}/codebook"),
        "codes": spark.read.parquet(f"{store}/codes"),
    }
    t_search = None
    rows = None
    for _ in range(2):
        t0 = time.perf_counter()
        res = ivf_pq_topk(
            queries,
            corpus,
            n_centroids=n_centroids,
            nprobe=NPROBE,
            k=10,
            centroids=stored["centroids"],
            codebook=stored["codebook"],
            codes=stored["codes"],
        )
        res.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        t_search = dt if t_search is None else min(t_search, dt)
    rows = res.count()
    shutil.rmtree(store, ignore_errors=True)
    return {
        "corpus": n,
        "cells": n_centroids,
        "nprobe": NPROBE,
        "build+store": round(t_build, 1),
        "search(min of 2)": round(t_search, 2),
        "result rows": rows,
    }


def main() -> int:
    dirs = sys.argv[1:] or ["/tmp/scale_sf1", "/tmp/scale_sf10"]
    spark = get_spark(app_name="ivfpq-search")
    runs = []
    for d in dirs:
        runs.append((d, 64))
    # sqrt-scaled cells at the largest point: the production knob.
    import duckdb

    biggest = dirs[-1]
    n_big = duckdb.sql(
        f"select count(*) from '{biggest}/embeddings.parquet'"
    ).fetchone()[0]
    runs.append((biggest, max(64, math.ceil(math.sqrt(n_big) / 2))))
    for d, cells in runs:
        row = measure(spark, d, cells)
        print(f"{d}: {row}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
