"""Unit tests for similarity operators with geometrically obvious
fixtures (axis-aligned vectors -> known nearest neighbors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_aws_spark.operators.similarity import brute_force_topk, ivf_topk


def _emb(spark):
    # 0 and 1 nearly parallel; 2 orthogonal; 3 anti-parallel to 0
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.5, 0.5, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_ranks_by_cosine(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") == 0)
    out = brute_force_topk(q, emb, k=4).collect()
    order = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert order == [1, 4, 2, 3]  # parallel > diagonal > orthogonal > anti
    assert out[0].cos_sim <= 1.0 and sorted(r.rank for r in out) == [1, 2, 3, 4]


def test_self_excluded(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") == 0)
    out = brute_force_topk(q, emb, k=10).collect()
    assert all(r.neighbor_id != 0 for r in out)


def test_ivf_fullprobe_equals_bruteforce(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") <= 1)
    brute = {(r.query_id, r.rank): r.neighbor_id for r in brute_force_topk(q, emb, k=3).collect()}
    ivf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(q, emb, n_centroids=3, nprobe=3, k=3).collect()
    }
    assert brute == ivf


def test_ivf_probe_subset_is_subset_of_corpus(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") == 0)
    # nprobe=1 can legitimately return nothing here (the query's own
    # cell holds only itself); probing 2 of 3 cells must find neighbors
    out = ivf_topk(q, emb, n_centroids=3, nprobe=2, k=5).collect()
    assert 0 < len(out) <= 5
    assert all(r.neighbor_id in {1, 2, 3, 4} for r in out)
    # and fewer probes can never return MORE candidates than full probe
    full = ivf_topk(q, emb, n_centroids=3, nprobe=3, k=5).collect()
    assert len(out) <= len(full)


def test_lsh_topk_subset_of_bruteforce_scores(spark, sf_dir):
    """LSH results are exact cosines over a candidate subset: every
    (query, neighbor) it returns must carry the same cos_sim brute
    force computes, and per-query results can't exceed k."""
    from pandas_aws_spark.operators.similarity import lsh_topk
    from pandas_aws_spark.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    lsh = lsh_topk(q, emb, dim=64, n_planes=4, k=5).toPandas()
    bf = brute_force_topk(q, emb, k=10**6).toPandas()
    assert (lsh.groupby("query_id").size() <= 5).all()
    merged = lsh.merge(bf, on=["query_id", "neighbor_id"], suffixes=("_lsh", "_bf"))
    assert len(merged) == len(lsh)
    assert (merged["cos_sim_lsh"] == merged["cos_sim_bf"]).all()


def test_arrow_bruteforce_matches_expression_path(spark, sf_dir):
    """The BLAS mapInPandas variant must agree with the expression path
    on neighbor sets and ranks (scores to float tolerance — summation
    order differs)."""
    from pandas_aws_spark.operators.similarity import brute_force_topk_arrow
    from pandas_aws_spark.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    a = brute_force_topk(q, emb, k=5).toPandas().set_index(["query_id", "rank"])
    b = brute_force_topk_arrow(q, emb, k=5).toPandas().set_index(["query_id", "rank"])
    assert sorted(a.index) == sorted(b.index)
    merged = a.join(b, lsuffix="_expr", rsuffix="_arrow")
    assert (merged["neighbor_id_expr"] == merged["neighbor_id_arrow"]).all()
    assert (merged["cos_sim_expr"] - merged["cos_sim_arrow"]).abs().max() < 1e-9


def test_multiprobe_recall_at_least_single_probe(spark, sf_dir):
    """Multi-probe candidates are a superset of single-probe (home
    bucket always probed), so its top-k cosine per query can only be
    equal or better; scores must still be exact."""
    from pandas_aws_spark.operators.similarity import lsh_topk, lsh_topk_multiprobe
    from pandas_aws_spark.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    single = lsh_topk(q, emb, dim=64, n_planes=4, k=5).toPandas()
    multi = lsh_topk_multiprobe(q, emb, dim=64, n_planes=4, k=5).toPandas()
    bf = brute_force_topk(q, emb, k=10**6).toPandas()

    m = multi.merge(bf, on=["query_id", "neighbor_id"], suffixes=("_m", "_bf"))
    assert len(m) == len(multi), "every multiprobe hit is a real corpus pair"
    assert (m["cos_sim_m"] == m["cos_sim_bf"]).all()

    s_best = single.groupby("query_id")["cos_sim"].max()
    m_best = multi.groupby("query_id")["cos_sim"].max()
    joined = s_best.to_frame("s").join(m_best.to_frame("m"), how="inner")
    assert (joined["m"] >= joined["s"] - 1e-15).all(), "multiprobe never worse"


def test_kmeans_improves_inertia_and_fullprobe_exact(spark, sf_dir):
    """Lloyd's rounds must improve the clustering objective (mean
    cosine of each vector to its assigned centroid), and full-probe
    search over the trained index must equal brute force. Partial-probe
    recall is data-dependent (these synthetic embeddings have weak
    cluster structure) so the objective, not recall, is the training
    assertion."""
    from pyspark.sql import Window

    from pandas_aws_spark.functions.vector import as_double, cosine
    from pandas_aws_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_topk,
        kmeans_fit,
    )

    from pandas_aws_spark.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    init = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("centroid_id"),
            F.col("embedding"),
        )
    )
    trained = kmeans_fit(emb, k=8, iters=3)
    assert 1 <= trained.count() <= 8
    assert len(trained.first()["embedding"]) == len(emb.first()["embedding"])

    def inertia(cents):
        a = ivf_assign(emb, cents)
        cc = cents.select(F.col("centroid_id").alias("cell"), as_double("embedding").alias("cv"))
        return (
            a.join(F.broadcast(cc), "cell")
            .select(cosine(as_double("embedding"), F.col("cv")).alias("s"))
            .agg(F.avg("s"))
            .first()[0]
        )

    assert inertia(trained) > inertia(init)

    q = emb.filter(F.col("vec_id") % 100 == 0)
    bf = brute_force_topk(q, emb, k=5).select("query_id", "neighbor_id")
    full = ivf_topk(q, emb, n_centroids=8, nprobe=8, k=5, centroids=trained).select(
        "query_id", "neighbor_id"
    )
    assert bf.exceptAll(full).count() == 0 and full.exceptAll(bf).count() == 0


def test_query_side_guard_rejects_oversized_query_set(spark, sf_dir):
    """The brute-force paths replicate the query side to every task;
    a query set over the cap must fail fast with a clear error, not
    OOM the driver at 100x scale."""
    import pytest

    from pandas_aws_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_arrow,
    )
    from pandas_aws_spark.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.limit(10)
    # expression path: the cap is asserted inside the main job (no extra
    # probe action), so the failure surfaces as a Spark job error
    # carrying the cap message when the plan executes
    with pytest.raises(Exception, match="query side exceeds"):
        brute_force_topk(q, emb, max_query_rows=5).count()
    # arrow path: the cap folds into the driver-side collection -> ValueError
    with pytest.raises(ValueError, match="query side exceeds"):
        brute_force_topk_arrow(q, emb, max_query_rows=5).count()
    # at/under the cap both paths still run
    assert brute_force_topk(q, emb, k=1, max_query_rows=10).count() == 10


def test_int8_quantization_range_and_zero_vector(spark):
    """Quantized codes stay in [-127, 127]; all-zero vectors quantize
    to zeros instead of dividing by zero."""
    from pandas_aws_spark.registry import load_registry

    df = load_registry()["q_embed_quantize_int8"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows
    for r in rows:
        assert -127 <= r["min_q"] <= r["max_q"] <= 127
    from pyspark.sql import functions as F

    from pandas_aws_spark.functions.vector import as_double

    z = spark.createDataFrame([(1, [0.0, 0.0], 0)], "vec_id long, embedding array<float>, label int")
    v = as_double("embedding")
    ma = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(ma > 0, F.lit(None)).otherwise(F.lit("zeros"))
    assert z.select(q.alias("path")).first()["path"] == "zeros"


def test_recommended_n_planes_scaling():
    """Plane count grows logarithmically with the corpus and clamps to
    the derived-plane family — the knob that keeps bucketed LSH
    subquadratic as both sides scale (SCALE.md)."""
    from pandas_aws_spark.operators.similarity import recommended_n_planes

    assert recommended_n_planes(1_000) == 1            # fits one bucket
    assert recommended_n_planes(100_000) == 1
    assert recommended_n_planes(200_000) == 1
    assert recommended_n_planes(1_600_000) == 4        # ceil(log2(16))
    assert recommended_n_planes(100_000_000) == 10     # ceil(log2(1000))
    assert recommended_n_planes(10_000_000_000) == 16  # clamped to family size (16 since r6)
    assert recommended_n_planes(10**9) == 14  # the 100 TB point now fits the family
    # monotone non-decreasing
    sizes = [10**k for k in range(3, 10)]
    planes = [recommended_n_planes(n) for n in sizes]
    assert planes == sorted(planes)
    # custom bucket target shifts the curve
    assert recommended_n_planes(1_600_000, target_bucket_rows=800_000) == 1


def test_matryoshka_recall_partitions_queries(spark, sf_dir):
    """Overlap histogram covers every query exactly once; truncated
    search can never exceed perfect overlap."""
    from pandas_aws_spark.registry import load_registry

    rows = load_registry()["q_embed_matryoshka_recall"].fn(spark, sf_dir).collect()
    assert sum(r.n_queries for r in rows) == 5  # vec_id % 100 == 0 at sf0.001
    assert all(0 <= r.n_common <= 10 for r in rows)


def test_embed_dim_diagnostics_shape(spark, sf_dir):
    """64 dims, uniform vector counts, coherent min/max, binary flag."""
    from pandas_aws_spark.registry import load_registry

    rows = load_registry()["q_embed_dim_diagnostics"].fn(spark, sf_dir).collect()
    assert len(rows) == 64
    ns = {r.n_vecs for r in rows}
    assert len(ns) == 1  # every dimension sees every vector
    for r in rows:
        assert r.min_ppm <= r.max_ppm
        assert abs(r.sum_ppm) <= r.sum_abs_ppm
        assert r.collapsed in (0, 1)


def test_rank_quality_bounds(spark, sf_dir):
    """Overlap/displacement/MRR respect their algebraic bounds, and the
    approximate list can never beat exact recall of itself."""
    from pandas_aws_spark.registry import load_registry

    (r,) = load_registry()["q_sim_eval_rank_quality"].fn(spark, sf_dir).collect()
    assert r.n_queries >= 1
    assert 0 <= r.sum_overlap <= r.n_queries * 10
    assert r.sum_displacement >= 0
    # each query's RR is at most 1e6 (true NN found at approx rank 1)
    assert 0 <= r.sum_rr_ppm <= r.n_queries * 1_000_000
    # displacement only accrues on shared neighbors: <= 9 per shared pair
    assert r.sum_displacement <= r.sum_overlap * 9
