#!/usr/bin/env python
"""Per-phase wall profile of the two lifecycle headline entries (r15
measurement tool — guide §1: measure first).

The lifecycle entries are sequences of SYNCHRONOUS steps (writes,
collects, merges), so phase walls come from plain timers around each
step — no listener, no UI. Replicates the entry bodies 1:1 (same
constants, same call order); any drift between this tool and the entry
is a measurement bug, not an engine change.

Usage::

    python tools/profile_entry.py ingest|cluster [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pandas_aws_spark.registry import load_registry, load_table
from pandas_aws_spark.session import get_spark

_T0 = [0.0]
_PHASES: list[tuple[str, float]] = []


def tick(label: str) -> None:
    now = time.perf_counter()
    _PHASES.append((label, now - _T0[0]))
    _T0[0] = now


def profile_ingest(spark, sf_dir: str) -> None:
    from pandas_aws_spark.operators.annindex import (
        ann_index_topk,
        append_ann_index,
        build_ann_index,
        read_ann_index,
        write_ann_index,
    )
    from pandas_aws_spark.queries import scratch_dir
    from pandas_aws_spark.queries.similarity import (
        _IVFPQ_NPROBE,
        _NCENT,
        _PQ_ITERS,
        _PQ_K,
        _PQ_M,
        _PQ_OVERSAMPLE,
        _PQ_TOPK,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr("vec_id % 4 <> 0"))
    b1 = emb.filter(F.expr("vec_id % 8 = 0"))
    b2 = emb.filter(F.expr("vec_id % 8 = 4"))
    qdf = emb.filter(F.col("vec_id") < 3)
    path = scratch_dir(prefix="pandas_aws_spark_profile_ann_")
    _T0[0] = time.perf_counter()
    idx = build_ann_index(base, n_centroids=_NCENT, m=_PQ_M, k_codes=_PQ_K, iters=_PQ_ITERS)
    tick("build_ann_index (train + lazy encode plans + coherence)")
    write_ann_index(idx, path)
    tick("write_ann_index (clustered vectors+codes writes, params, commit)")
    stored = read_ann_index(spark, path)
    tick("read_ann_index 1")
    s1 = (
        ann_index_topk(qdf, stored, nprobe=_IVFPQ_NPROBE, k=_PQ_TOPK, oversample=_PQ_OVERSAMPLE)
        .withColumn("search", F.lit(1))
        .localCheckpoint()
    )
    tick("search 1 (probe collect + plan + localCheckpoint)")
    append_ann_index(b1, path, batch_id="b1")
    tick("append b1")
    append_ann_index(b2, path, batch_id="b2")
    tick("append b2")
    stored2 = read_ann_index(spark, path)
    s2 = ann_index_topk(
        qdf, stored2, nprobe=_IVFPQ_NPROBE, k=_PQ_TOPK, oversample=_PQ_OVERSAMPLE
    ).withColumn("search", F.lit(2))
    tick("read 2 + search-2 plan build")
    (
        s1.unionByName(s2)
        .select("search", "query_id", "neighbor_id", "rank", "l2sq_fp")
        .orderBy("search", "query_id", "rank")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    tick("final noop materialize (search 2 executes here)")


def profile_cluster(spark, sf_dir: str) -> None:
    from pandas_aws_spark.operators.dedup import (
        append_dedup_index,
        build_dedup_index,
        index_cross_near_dup_pairs,
        index_self_near_dup_pairs,
        init_cluster_labels,
        merge_cluster_labels,
        read_cluster_labels,
        read_dedup_index,
        write_dedup_index,
    )
    from pandas_aws_spark.queries import scratch_dir

    recipe = dict(shingle_k=3, n_hashes=8, bands=4)
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    b1 = docs.filter(F.col("doc_id") % 8 == 0)
    b2 = docs.filter(F.col("doc_id") % 8 == 4)
    path = scratch_dir(prefix="pandas_aws_spark_profile_clu_")
    _T0[0] = time.perf_counter()
    write_dedup_index(build_dedup_index(corpus, "doc_id", "text", **recipe), path)
    tick("build+write dedup index")
    p0 = index_self_near_dup_pairs(read_dedup_index(spark, path), threshold=0.8)
    init_cluster_labels(p0, path)
    tick("bootstrap pairs (stored frames) + init_cluster_labels (CC + write)")
    for batch, bid in ((b1, "b1"), (b2, "b2")):
        stored = read_dedup_index(spark, path)
        delta = build_dedup_index(batch, "doc_id", "text", **recipe)
        cross = index_cross_near_dup_pairs(delta, stored, threshold=0.8)
        internal = index_self_near_dup_pairs(delta, threshold=0.8)
        tick(f"{bid}: delta built + pair plans")
        merge_cluster_labels(
            cross.select("id_a", "id_b").unionByName(internal.select("id_a", "id_b")),
            path,
            batch_id=bid,
        )
        tick(f"{bid}: merge_cluster_labels")
        append_dedup_index(delta, path, batch_id=bid)
        tick(f"{bid}: append_dedup_index")
    read_cluster_labels(spark, path).orderBy("doc_id").write.format("noop").mode(
        "overwrite"
    ).save()
    tick("final label read + noop")


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "ingest"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reg = load_registry()
    spark = get_spark(app_name=f"profile_{which}")
    # Warm-up: JVM JIT, codegen, parquet footers — same as bench.py.
    reg["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    t0 = time.perf_counter()
    if which == "ingest":
        profile_ingest(spark, sf_dir)
    elif which == "cluster":
        profile_cluster(spark, sf_dir)
    else:
        raise SystemExit(f"unknown target {which!r} (ingest|cluster)")
    wall = time.perf_counter() - t0
    print(f"\n== {which} @ {sf_dir}: wall {wall:.2f}s ==")
    for label, dt in _PHASES:
        print(f"{dt:8.2f}s  {label}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
