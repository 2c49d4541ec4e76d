#!/usr/bin/env python
"""Planted degenerate-bucket experiment (r7 ADVICE: the window-form
bucket cap funnels each band bucket into one task — does the
pathological bucket regime hurt the count-window itself?).

Plants m copies of one boilerplate document (identical text, distinct
ids) into the 10x document corpus, so every band gains one bucket of
size ~m. Measures:

* capped `minhash_near_dup_pairs` (corpus-derived cap, which drops the
  planted bucket) across growing m — the count-window's one-task term
  should grow LINEARLY in m (the task counts m 12-byte posting rows);
* uncapped across growing m — the self-join's term grows with m^2/2
  candidate pairs, all jaccard-1 verified survivors.

Usage: python tools/measure_planted_bucket.py [corpus_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_aws_spark.session import get_spark

BOILERPLATE = " ".join(f"boilerplate-footer-w{i}" for i in range(60))


def planted(spark, corpus_dir: str, m: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    max_id = docs.agg(F.max("doc_id")).first()[0]
    plant = spark.range(m).select(
        (F.col("id") + max_id + 1).alias("doc_id"), F.lit(BOILERPLATE).alias("text")
    )
    return docs.unionByName(plant)


def run(spark, df, cap):
    from pandas_aws_spark.operators.dedup import minhash_near_dup_pairs

    t0 = time.perf_counter()
    pairs = minhash_near_dup_pairs(
        df, "doc_id", "text", shingle_k=3, n_hashes=8, bands=4, threshold=0.8,
        max_band_bucket=cap,
    )
    pairs.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 1)


def main() -> int:
    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    spark = get_spark(app_name="planted-bucket")
    from pandas_aws_spark.operators.dedup import recommended_max_band_bucket

    for m in (2500, 5000, 20000):
        df = planted(spark, corpus_dir, m).localCheckpoint()
        n = df.count()
        cap = recommended_max_band_bucket(n)
        t_cap = run(spark, df, cap)
        t_uncap = run(spark, df, None) if m <= 5000 else None
        print(
            f"m={m:6d} n={n} cap={cap}: capped={t_cap}s "
            f"uncapped={t_uncap if t_uncap is not None else 'skipped (m^2/2 = '+str(m*m//2)+' pairs)'}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
