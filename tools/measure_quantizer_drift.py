#!/usr/bin/env python
"""Frozen-quantizer drift under a shifted append stream (r9 verdict
ask #4). ``append_ann_index`` never retrains — correctly, that is the
artifact's point — but the coarse cells were trained on the BASE
distribution, so appended batches from a progressively shifted
distribution degrade recall silently. This measures that degradation
at the 10x point and calibrates the cheap staleness signal
(``quantizer_staleness``: coherence ratio vs the train-time baseline
pinned in params) against it, per batch, with exact brute-force ground
truth.

Protocol: build the persisted index on the full 10x corpus (64 trained
cells), then append 16 batches; batch b takes a disjoint 2% slice of
the base vectors, re-ids it, and shifts every dimension by
alternating-sign ``s_b = DRIFT_STEP * b`` — a single drift direction
whose magnitude grows linearly, so by the last batches the drift term
rivals the vector norm (the "new data looks different now" regime).
For each batch: signal BEFORE append, recall@10 of the index search
for 100 queries drawn FROM the batch vs exact cosine ground truth over
the full accumulated corpus, at both the tight (nprobe=2) and the
relaxed (nprobe=8) operating points.

The signal's operational statistic is ``abs(ratio - 1)`` — a
directional shift can RAISE coherence (vectors collapse toward one
cell; recall dies via crowding) as well as lower it.

Usage: python tools/measure_quantizer_drift.py [corpus_dir] [n_batches]
Defaults: /tmp/scale_sf1 (10x), 16. Writes one table row per batch;
paste into SCALE.md. Runtime ~10 min — run under tmux.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.session import get_spark

CELLS = 64
RECIPE = dict(
    n_centroids=CELLS, m=8, k_codes=16, coarse="kmeans", coarse_sample=0.25
)
K = 10
N_QUERIES = 100
DRIFT_STEP = 0.05  # per-batch per-dim shift; x16 batches -> rivals |v|


def main() -> int:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.annindex import (
        ann_index_topk,
        append_ann_index,
        build_ann_index,
        quantizer_staleness,
        read_ann_index,
        write_ann_index,
    )
    from pandas_aws_spark.operators.similarity import brute_force_topk

    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(app_name="quantizer-drift")
    base = spark.read.parquet(f"{corpus_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = base.count()
    path = tempfile.mkdtemp(prefix="pandas_aws_spark_drift_")
    t0 = time.perf_counter()
    write_ann_index(build_ann_index(base, **RECIPE), path)
    print(
        f"base index: {n} rows, {CELLS} trained cells, "
        f"built+written in {time.perf_counter() - t0:.1f}s",
        flush=True,
    )

    def batch_of(b: int):
        s = DRIFT_STEP * b
        return (
            base.filter(F.col("vec_id") % 50 == b)
            .select(
                (F.col("vec_id") + 1_000_000 * (b + 1)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x
                    + F.when(i % 2 == 0, F.lit(s)).otherwise(F.lit(-s)),
                ).alias("embedding"),
            )
        )

    print(
        f"{'batch':>5} {'shift':>6} {'ratio':>7} {'|r-1|':>6} {'occ_tv':>7} "
        f"{'recall@10 np2':>13} {'recall@10 np8':>13}",
        flush=True,
    )
    # batch 0 is the zero-shift CONTROL: same batch size and replica
    # structure, no drift — it pins the small-sample floor of both
    # signals (a 2% batch of a replicated corpus covers few distinct
    # vectors, so its occupancy histogram is skewed even undrifted;
    # the drift signal is the EXCESS over this row, not over 0).
    accum = base
    rows = []
    for b in range(0, n_batches + 1):
        delta = batch_of(b).localCheckpoint(eager=True)
        sig = quantizer_staleness(delta, path)
        append_ann_index(delta, path, batch_id=f"d{b:02d}")
        accum = accum.unionByName(delta).localCheckpoint(eager=True)
        queries = delta.limit(N_QUERIES).localCheckpoint(eager=True)
        truth: dict = {}
        for r in brute_force_topk(
            queries, accum, k=K, max_query_rows=N_QUERIES + 8
        ).collect():
            truth.setdefault(r.query_id, set()).add(r.neighbor_id)
        idx = read_ann_index(spark, path)
        recalls = {}
        for nprobe in (2, 8):
            got: dict = {}
            for r in ann_index_topk(
                queries, idx, nprobe=nprobe, k=K, oversample=5
            ).collect():
                got.setdefault(r.query_id, set()).add(r.neighbor_id)
            hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
            recalls[nprobe] = hits / (len(truth) * K)
        dev = abs(sig["ratio"] - 1.0)
        tv = sig["occupancy_tv"]
        rows.append((b, DRIFT_STEP * b, sig["ratio"], dev, tv, recalls[2], recalls[8]))
        print(
            f"{b:>5} {DRIFT_STEP * b:>6.2f} {sig['ratio']:>7.4f} {dev:>6.4f} "
            f"{tv:>7.4f} {recalls[2]:>13.3f} {recalls[8]:>13.3f}",
            flush=True,
        )

    # Pearson correlation of each signal with the recall LOSS at the
    # tight operating point — the number that picks the re-train
    # trigger statistic.
    import math

    def pearson(xs, ys):
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        sx = math.sqrt(sum((x - mx) ** 2 for x in xs))
        sy = math.sqrt(sum((y - my) ** 2 for y in ys))
        return cov / (sx * sy) if sx and sy else float("nan")

    loss = [1.0 - r[5] for r in rows]
    print(
        f"\npearson(|ratio-1|, 1-recall@np2) = {pearson([r[3] for r in rows], loss):.3f}"
        f"\npearson(occ_tv,    1-recall@np2) = {pearson([r[4] for r in rows], loss):.3f}",
        flush=True,
    )
    shutil.rmtree(path, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
