"""Semantic invariants for the pipeline-ops query family
(queries/pipeline.py) — properties the oracle hash can't express:
bounds, conservation-of-mass across rollup levels, cap enforcement.
"""

from __future__ import annotations

from pandas_aws_spark.registry import load_registry, load_table


def _run(spark, sf_dir, name):
    return load_registry()[name].fn(spark, sf_dir).collect()


def test_drift_tvd_bounds_and_mass(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_drift_tvd")
    ev = load_table(spark, sf_dir, "events")
    totals = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
    assert rows
    for r in rows:
        # TVD is a probability distance: 0 <= tvd <= 1 (ppm scale),
        # and the per-bin max shift bounds it from below / 10-bins above
        assert 0 <= r["tvd_ppm"] <= 1_000_000
        assert 0 <= r["max_bin_shift_ppm"] <= 1_000_000
        assert r["max_bin_shift_ppm"] // 2 <= r["tvd_ppm"] <= 10 * r["max_bin_shift_ppm"]
        # every event lands in exactly one period
        assert r["n_early"] + r["n_late"] == totals[r["event_type"]]


def test_target_encode_shrinks_toward_global(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_feature_target_encode")
    assert rows
    # reconstruct the global rate from the per-category sums
    g_ppm = 1_000_000 * sum(r["pos"] for r in rows) // sum(r["n"] for r in rows)
    for r in rows:
        raw_ppm = 1_000_000 * r["pos"] // r["n"]
        lo, hi = min(raw_ppm, g_ppm), max(raw_ppm, g_ppm)
        # smoothing can only move the estimate BETWEEN raw and prior
        # (+1 slack for integer-division truncation on each side)
        assert lo - 1 <= r["enc_ppm"] <= hi + 1, (r, raw_ppm, g_ppm)


def test_cdc_compact_partitions_key_space(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_cdc_compact")
    li = load_table(spark, sf_dir, "lineitem")
    n_keys = li.select("l_orderkey").distinct().count()
    assert sum(r["n_keys"] for r in rows) == n_keys
    assert {r["op"] for r in rows} <= {"D", "U"}


def test_time_rollup_levels_conserve_mass(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_time_rollup")
    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    grand = [r for r in rows if r["y"] == -1]
    assert len(grand) == 1 and grand[0]["n_events"] == total
    days = [r for r in rows if r["d"] != -1]
    months = [r for r in rows if r["m"] != -1 and r["d"] == -1]
    years = [r for r in rows if r["y"] != -1 and r["m"] == -1]
    assert sum(r["n_events"] for r in days) == total
    assert sum(r["n_events"] for r in months) == total
    assert sum(r["n_events"] for r in years) == total


def test_domain_caps_enforced(spark, sf_dir):
    from pandas_aws_spark.queries.pipeline import _CAP_K

    rows = _run(spark, sf_dir, "q_text_domain_caps")
    assert rows
    for r in rows:
        assert r["n_kept"] <= min(_CAP_K, r["n_docs"])
        assert r["chars_kept"] <= r["chars_total"]
        if r["n_docs"] <= _CAP_K:
            assert r["n_kept"] == r["n_docs"] and r["chars_kept"] == r["chars_total"]


def test_negative_sampling_excludes_positives(spark, sf_dir):
    from pyspark.sql import functions as F

    from pandas_aws_spark.queries.pipeline import _NEG_PER_USER

    rows = _run(spark, sf_dir, "q_sample_negative")
    assert rows
    for r in rows:
        # hash collisions can only shrink the candidate set
        assert 1 <= r["n_candidates"] <= _NEG_PER_USER
        assert 0 <= r["n_negatives"] <= r["n_candidates"]


def test_kmv_exact_when_under_k(spark, sf_dir):
    from pandas_aws_spark.queries.sketch import _KMV_K

    rows = load_registry()["q_sketch_kmv"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["est_within_tol"]
        if r["exact_distinct"] < _KMV_K:
            # bottom-k holds every distinct hash -> exact up to collisions
            assert abs(r["kmv_est"] - r["exact_distinct"]) <= 2


def test_semantic_dedup_survivor_rule(spark, sf_dir):
    """Property check on the operator itself: the lowest id of every
    cell is never dropped, and dup decisions replay under a brute
    within-cell cosine recomputation."""
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.dedup import semantic_dedup
    from pandas_aws_spark.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    marked = semantic_dedup(emb, n_cells=8, threshold=0.4)
    per_cell_min = marked.groupBy("cell").agg(F.min("vec_id").alias("lo"))
    dropped_lows = (
        marked.join(per_cell_min, "cell")
        .filter((F.col("vec_id") == F.col("lo")) & F.col("is_dup"))
        .count()
    )
    assert dropped_lows == 0
    total = emb.count()
    assert marked.count() == total  # every vector gets a verdict


def test_containment_dominates_jaccard(spark, sf_dir):
    """Every Jaccard>=0.8 pair must also be containment>=0.8 (containment
    >= jaccard always, since min(|A|,|B|) <= union), and rank bounds hold."""
    reg = load_registry()
    jac = {(r["id_a"], r["id_b"]) for r in reg["q_dedup_ngram_jaccard"].fn(spark, sf_dir).collect()}
    con = {
        (r["id_a"], r["id_b"]) for r in reg["q_dedup_containment"].fn(spark, sf_dir).collect()
    }
    assert jac <= con


def test_stream_topk_rank_bounds(spark, sf_dir):
    rows = load_registry()["q_stream_topk_per_window"].fn(spark, sf_dir).collect()
    assert rows
    by_win = {}
    for r in rows:
        by_win.setdefault(r["win_start"], []).append(r)
    for win, rs in by_win.items():
        ranks = sorted(r["rk"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1)) and len(rs) <= 3
        counts = [r["n_events"] for r in sorted(rs, key=lambda r: r["rk"])]
        assert counts == sorted(counts, reverse=True)


def test_chunking_conserves_bytes(spark, sf_dir):
    """Chunk table re-assembles exactly: per-doc chunk sizes sum to the
    payload size, indices are contiguous from 0, every non-final chunk
    is full."""
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.multimodal import chunk_payloads, with_binary_payload
    from pandas_aws_spark.registry import load_table

    docs = with_binary_payload(load_table(spark, sf_dir, "documents"), "text")
    chunks = chunk_payloads(docs, chunk_bytes=256)
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_bytes").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.max("chunk_idx").alias("max_idx"),
        F.min("chunk_idx").alias("min_idx"),
        F.sum(F.when(F.col("n_bytes") == 256, 1).otherwise(0)).alias("n_full"),
    )
    joined = docs.select("doc_id", F.length("payload").alias("nb")).join(per_doc, "doc_id")
    bad = joined.filter(
        (F.col("total") != F.col("nb"))
        | (F.col("max_idx") != F.col("n") - 1)
        | (F.col("min_idx") != 0)
        | (F.col("n_full") < F.col("n") - 1)
    ).count()
    assert bad == 0
    assert joined.count() == docs.count()


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    from pandas_aws_spark.objectstore import compact_prefix
    from pandas_aws_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = f"file://{tmp_path}/frag"
    docs.repartition(16).write.mode("overwrite").parquet(path)
    stats = compact_prefix(spark, path, target_bytes_per_file=64 * 1024 * 1024)
    assert stats["files_after"] < stats["files_before"]
    assert spark.read.parquet(path).count() == docs.count()


def test_seasonal_anomaly_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_events_seasonal_anomaly")
    assert rows
    for r in rows:
        assert 0 <= r["n_above_2x"] <= r["n_events"]
        # max ratio must exceed 1x whenever any point exceeds 2x baseline
        if r["n_above_2x"] > 0:
            assert r["max_ratio_ppm"] > 2_000_000


def test_hhi_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_supplier_hhi")
    assert rows
    for r in rows:
        # HHI of n equal shares = 1e6/n; bounds: [1e6/n, 1e6]
        assert r["hhi_ppm"] <= 1_000_000
        # truncation-tolerant lower bound
        assert r["hhi_ppm"] >= 1_000_000 // r["n_suppliers"] - r["n_suppliers"]


def test_reservoir_per_group_is_deterministic_and_k_bounded(spark):
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.sampling import reservoir_per_group

    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("grp")
    )
    a = reservoir_per_group(df, "id", "grp", 5)
    b = reservoir_per_group(df.repartition(13), "id", "grp", 5)
    rows_a = sorted((r.grp, r.id) for r in a.collect())
    rows_b = sorted((r.grp, r.id) for r in b.collect())
    assert rows_a == rows_b  # partitioning-independent
    sizes = {g: n for g, n in a.groupBy("grp").count().collect()}
    assert sizes == {"0": 5, "1": 5, "2": 5, "3": 5}


def test_reservoir_per_group_small_groups_keep_everything(spark):
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.sampling import reservoir_per_group

    df = spark.range(6).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("grp")
    )
    assert reservoir_per_group(df, "id", "grp", 10).count() == 6


def test_reservoir_per_group_rejects_bad_k(spark):
    import pytest
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.sampling import reservoir_per_group

    df = spark.range(3).select(F.col("id"), F.lit("g").alias("grp"))
    with pytest.raises(ValueError, match="k must be positive"):
        reservoir_per_group(df, "id", "grp", 0)


def test_epoch_shuffle_reproducible_and_decorrelated(spark, sf_dir):
    """Epoch 0 agrees with itself fully; later epochs keep only ~1/8 of
    doc->shard assignments (independent hashing), and the checksums are
    stable across reruns (the reproducibility contract)."""
    from pandas_aws_spark.registry import load_registry

    fn = load_registry()["q_sample_epoch_shuffle"].fn
    rows = {r.epoch: r for r in fn(spark, sf_dir).collect()}
    assert set(rows) == {0, 1, 2}
    n = rows[0].n_docs
    assert rows[0].n_same_as_epoch0 == n
    for e in (1, 2):
        assert rows[e].n_docs == n
        # independence: expect ~n/8 stable assignments, never most of them
        assert rows[e].n_same_as_epoch0 < n // 2
        assert rows[e].n_shards == 8
    rerun = {r.epoch: r for r in fn(spark, sf_dir).collect()}
    assert {e: r.order_checksum for e, r in rows.items()} == {
        e: r.order_checksum for e, r in rerun.items()
    }
