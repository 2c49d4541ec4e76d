#!/usr/bin/env python
"""Sample-trained coarse k-means (r8 verdict ask #4): coarse training
is the dominant IVF-PQ build term (r8 isolation: the 64-cell 200k-row
build spent most of its 897.6s there), and the docstrings wave at
"train on a sample at 100 TB" — this measures that claim at the 100x
point: coarse quantizer trained on a deterministic 1% / 10% / 100%
hash-sample of the corpus, recall@10 against EXACT brute-force ground
truth at equal nprobe, plus the build wall each training rate buys.

PQ codebook training and the full-corpus encode are held IDENTICAL
across rows — only the coarse quantizer's training set varies, so the
recall delta isolates the knob.

Usage: python tools/measure_sampled_coarse.py [corpus_dir] [nprobe]
Defaults to /tmp/scale_sf10 (100x), nprobe=8. Pass a small nprobe
(e.g. 2) to measure at a NON-saturated operating point: at nprobe=8/64
this corpus's recall ceiling is already 1.0 for every training rate,
which shows sampling does not degrade recall but cannot show a delta;
a tight probe budget makes recall sensitive to cell quality, which is
exactly what coarse training controls.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.session import get_spark

NPROBE = 8
N_QUERIES = 200
CELLS = 64
K = 10


def main() -> int:
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.pq import ivf_pq_build_full, ivf_pq_topk
    from pandas_aws_spark.operators.similarity import brute_force_topk

    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf10"
    nprobe = int(sys.argv[2]) if len(sys.argv) > 2 else NPROBE
    spark = get_spark(app_name="sampled-coarse")
    corpus = spark.read.parquet(f"{corpus_dir}/embeddings.parquet")
    n = corpus.count()
    step = max(1, n // N_QUERIES)
    queries = corpus.filter(F.col("vec_id") % step == 0).limit(N_QUERIES)

    # exact ground truth (cosine ranking == L2 ranking on normalized
    # vectors, which is what the IVF-PQ path re-ranks by)
    truth = {}
    for r in brute_force_topk(queries, corpus, k=K, max_query_rows=N_QUERIES + 8).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    print(f"ground truth: {len(truth)} queries x top-{K}, nprobe={nprobe}", flush=True)

    for rate in (1.0, 0.1, 0.01):
        t0 = time.perf_counter()
        cents, cb, codes, vectors = ivf_pq_build_full(
            corpus,
            n_centroids=CELLS,
            m=8,
            k_codes=16,
            coarse="kmeans",
            coarse_sample=None if rate == 1.0 else rate,
        )
        # materialize like a real build would (the artifact write)
        codes.write.format("noop").mode("overwrite").save()
        t_build = time.perf_counter() - t0
        got = {}
        t0 = time.perf_counter()
        res = ivf_pq_topk(
            queries,
            None,
            n_centroids=CELLS,
            nprobe=nprobe,
            k=K,
            centroids=cents,
            codebook=cb,
            codes=codes,
            vectors=vectors,
        ).collect()
        t_search = time.perf_counter() - t0
        for r in res:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        recall = hits / (len(truth) * K)
        print(
            {
                "train rate": rate,
                "train rows": int(n * rate),
                "build wall": round(t_build, 1),
                "recall@10 vs exact": round(recall, 4),
                "search 200q": round(t_search, 2),
            },
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
