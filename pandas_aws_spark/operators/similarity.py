"""Similarity search over embedding columns (``array<float>``).

North-star extension (SURVEY.md §2.9): the reference has no vector
surface. Two strategies:

* **brute force** — exact top-k: corpus x queries cosine, per-query
  window rank. The BASELINE path and the verifier for everything else.
  Scale shape: queries broadcast (they're the small side by
  construction), corpus stays partitioned, so the crossJoin is a
  map-side nested loop with NO shuffle of the corpus; the only shuffle
  is the per-query top-k (and Spark's WindowGroupLimit pushes the
  rank<=k filter into per-partition heaps first).
* **IVF (inverted file)** — the scale path: assign every corpus vector
  to its nearest of C centroids (one broadcast join), search only the
  ``nprobe`` nearest cells of each query. ``nprobe=C`` degrades to
  exact search (used to oracle-check the machinery); small nprobe
  trades recall for a 1/C..nprobe/C scan fraction. Centroids here are
  taken deterministically (first C vectors by id) rather than via
  k-means, keeping the whole operator reproducible and
  oracle-expressible; swap in MLlib KMeans centroids for production
  quality without touching the search plumbing.

Cosines use the decimal-accumulated dot product from
``functions.vector`` — bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import bounded_window_key
from ..functions.vector import as_double, cosine, dot, norm

__all__ = ["MAX_QUERY_SIDE_ROWS", "brute_force_topk", "brute_force_topk_arrow", "ivf_assign", "ivf_topk", "kmeans_fit", "lsh_bucket", "lsh_topk", "lsh_topk_multiprobe", "recommended_n_planes", "sql_lsh_bucket_masked", "sql_recommended_n_planes"]

# The brute-force paths replicate the QUERY side to every task (broadcast
# crossJoin / driver toPandas + sc.broadcast). That contract only holds for
# a small query set; a 100x-scale caller must get a clear error instead of
# a driver OOM or an 8GB-broadcast failure mid-job.
MAX_QUERY_SIDE_ROWS = 100_000


def _guard_message(op_name: str, cap: int) -> str:
    return (
        f"{op_name}: query side exceeds max_query_rows={cap}; the query "
        "matrix is replicated to every task, so this would not scale — "
        "slice the query set (or raise max_query_rows deliberately), or "
        "use the IVF/LSH paths which keep both sides partitioned."
    )


def _guarded_query_side(queries: DataFrame, cap: int | None, op_name: str) -> DataFrame:
    """Enforce the query-row cap INSIDE the main job — zero extra Spark
    actions (an earlier ``limit(cap+1).count()`` probe cost a full
    scheduling round trip per call, ~25% of the whole brute-force query
    at bench scale). ``limit(cap+1)`` bounds how much of an unbounded
    query set is ever scanned, a whole-frame count window measures the
    (small, soon-to-be-broadcast) side, and ``assert_true`` fails the
    job with the clear cap message the moment the count exceeds the
    cap. On success ``assert_true`` yields NULL so the filter passes
    every row; sitting inside a filter predicate it cannot be pruned
    by the optimizer the way an unused projection column would be.

    BEHAVIOR CHANGE (vs the eager probe): an over-cap query side now
    fails lazily, as a ``SparkRuntimeException`` when the action runs,
    not a ``ValueError`` at plan-build time. Callers catching the old
    ValueError should catch the runtime exception instead (the cap
    message is preserved inside it). An eager plan-build-time check is
    not recoverable cheaply: PySpark local inputs plan as LogicalRDD
    (no static row count), so any eager count would re-introduce the
    extra scheduling round trip this in-plan guard exists to avoid."""
    if cap is None:
        return queries
    # constant partition key: the frame is bounded by limit(cap + 1), so
    # the single-task window is fine — the key keeps it off WindowExec's
    # unpartitioned-window warning channel so real funnels stay visible
    # in bench tails (r11 verdict ask #8; see bounded_window_key).
    w = Window.partitionBy(bounded_window_key())
    return (
        queries.limit(cap + 1)
        .withColumn("_qn", F.count(F.lit(1)).over(w))
        .filter(F.assert_true(F.col("_qn") <= cap, F.lit(_guard_message(op_name, cap))).isNull())
        .drop("_qn")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
    max_query_rows: int | None = MAX_QUERY_SIDE_ROWS,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Returns (query_id, neighbor_id, rank, cos_sim); ties broken on
    neighbor id so ranks are deterministic. The query side is broadcast
    — guarded by ``max_query_rows`` (pass ``None`` to opt out).
    """
    # Norms are per-vector, so both are computed ONCE per row before
    # the pair join instead of re-folded inside every pair (r8 — the
    # same 3-folds-per-pair term that dominated the embedding-LSH 100x
    # cliff, SCALE.md r8). norm(v) on the same v is the same double,
    # so cos_sim is bit-identical to cosine() and to the SQL oracles.
    q = (
        _guarded_query_side(queries, max_query_rows, "brute_force_topk")
        .select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
        .withColumn("_nq", norm(F.col("qv")))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    ).withColumn("_nc", norm(F.col("cv")))
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("_nq") * F.col("_nc"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine, ties to
    the smallest centroid id). Returns corpus columns + ``cell``.

    Pure map over the corpus since r15 (guide §2.4): the centroid set
    rides along as ONE broadcast array row and the argmax is a per-row
    ``array_max`` over ``(sim, -centroid_id)`` structs — the pre-r15
    shape (crossJoin x n_centroids row expansion, then a
    Window.partitionBy(id) row_number) shuffled AND sorted
    corpus x n_centroids rows per evaluation for an argmax that never
    crosses rows; at adaptive centroid counts (thousands at 100 TB)
    that exchange dominated every build/append. Tie/NaN semantics are
    identical: struct max takes the greatest sim (Spark orders NaN
    greatest, exactly like the descending sort), then the greatest
    ``-centroid_id`` = smallest id."""
    c = centroids.select(
        F.col(centroid_id).alias("_cid"), as_double(vec_col).alias("_cvec")
    ).withColumn("_ncv", norm(F.col("_cvec")))
    cents_one = c.agg(F.collect_list(F.struct("_cid", "_cvec", "_ncv")).alias("_cents"))
    scored = (
        corpus.withColumn("_v", as_double(vec_col))
        .withColumn("_nv", norm(F.col("_v")))
        .crossJoin(F.broadcast(cents_one))
        .withColumn(
            "_best",
            F.array_max(
                F.transform(
                    "_cents",
                    lambda cc: F.struct(
                        (
                            dot(F.col("_v"), cc["_cvec"])
                            / (F.col("_nv") * cc["_ncv"])
                        ).alias("s"),
                        (-cc["_cid"]).alias("negcid"),
                    ),
                )
            ),
        )
    )
    return (
        scored.filter(F.col("_best").isNotNull())
        .withColumn("cell", -F.col("_best")["negcid"])
        .drop("_v", "_nv", "_cents", "_best")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    nprobe: int = 2,
    k: int = 5,
    exclude_self: bool = True,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN top-k.

    Index: centroids = first ``n_centroids`` corpus vectors by id
    (deterministic), or a caller-supplied ``centroids`` DataFrame
    ``(centroid_id, vec_col)`` — e.g. from :func:`kmeans_fit`; corpus
    bucketed by nearest centroid. Search: each query probes its
    ``nprobe`` nearest cells and ranks only vectors in those cells.
    ``nprobe=n_centroids`` == exact brute force (for any centroids).
    """
    if centroids is None:
        centroids = (
            corpus.orderBy(id_col)
            .limit(n_centroids)
            .select(
                F.row_number().over(Window.partitionBy(bounded_window_key()).orderBy(id_col)).alias("centroid_id"),
                F.col(vec_col),
            )
        )
    indexed = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)

    # query -> its nprobe nearest cells. Per-vector norms precomputed
    # once per row (r8, bit-identical — see brute_force_topk); the
    # query norm rides the probes frame so the verify stage reuses it.
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    ).withColumn("_nq", norm(F.col("qv")))
    c = centroids.select(
        F.col("centroid_id"), as_double(vec_col).alias("cvec")
    ).withColumn("_ncv", norm(F.col("cvec")))
    qc = q.crossJoin(F.broadcast(c)).withColumn(
        "_sim", dot(F.col("qv"), F.col("cvec")) / (F.col("_nq") * F.col("_ncv"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.col("centroid_id"))
    probes = (
        qc.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "_nq", F.col("centroid_id").alias("cell"))
    )

    cand = (
        indexed.select(
            F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"), "cell"
        )
        .withColumn("_nc", norm(F.col("cv")))
        .join(F.broadcast(probes), "cell")
    )
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("_nq") * F.col("_nc"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def kmeans_fit(
    corpus: DataFrame,
    *,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over an embedding column — trained IVF centroids.

    Deterministic init (first ``k`` vectors by id, same as the static
    IVF index), then ``iters`` rounds of assign -> recompute means.
    Returns ``(centroid_id, vec_col: array<double>)``. Cells that lose
    all members drop out (ids of surviving cells stay stable).

    Distribution shape: assignment is a broadcast join (centroids are
    k x dim doubles — bytes); the mean update is posexplode ->
    groupBy(cell, pos) sorted-fold mean — one shuffle of (cell, pos, x)
    triples per iteration (the deterministic fold trades map-side
    partial aggregation for bit-portability; on a 100 TB corpus train
    on a sample, where the triples are small). Only the k x dim model
    state ever reaches the driver (collected per round to cut the
    iterative lineage, the standard Spark pattern for model-state
    loops). At 100 TB: sample the corpus for training (k-means needs a
    representative sample, not every row) and assign the full corpus
    once with the final model.
    """
    spark = corpus.sparkSession
    cent = (
        corpus.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number().over(Window.partitionBy(bounded_window_key()).orderBy(id_col)).alias("centroid_id"),
            as_double(vec_col).alias(vec_col),
        )
    )
    schema = f"centroid_id int, {vec_col} array<double>"
    # TRAINING-SCOPED pin of the assignment input (r16, guide §5): each
    # Lloyd round's ivf_assign otherwise re-evaluates the corpus plan
    # from its source per iteration. Persist only when the caller has
    # not already pinned the frame (ivf_pq_build_full pins the
    # normalized corpus this may derive from), and release exactly what
    # was persisted here — no CacheManager entry outlives the call.
    from pyspark import StorageLevel

    own_pin = corpus.storageLevel == StorageLevel.NONE
    if own_pin:
        corpus = corpus.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for _ in range(iters):
            assigned = ivf_assign(corpus, cent, id_col=id_col, vec_col=vec_col)
            # Centroid mean = ascending-sorted sequential fold / count
            # (the pq_train pattern, r6): F.avg's partial-agg combine
            # order perturbs the last ULPs per partitioning, which is
            # invisible to full-probe consumers but blocks a bit-exact
            # SQL replay of the trained index — DuckDB mirrors this fold
            # with list(x ORDER BY x) + list_reduce, making
            # coarse="kmeans" IVF-PQ oracle-verifiable
            # (q_sim_ivf_pq_trained).
            # Per-(cell, POSITION) groups (r16, the r15 verdict's ask
            # #4): the aggregation buffer is one position's scalars —
            # O(members) — where the r15 fused groupBy(cell) collected
            # whole vectors, an O(members x dim) buffer per group that a
            # hot cell can blow past task memory at corpus scale. The
            # per-position mean folds the IDENTICAL ascending-sorted
            # value multiset, so the trained centroid doubles are
            # bit-identical; the k x dim scalar means are assembled into
            # centroid arrays driver-side, which costs nothing extra
            # because the model state is collected per round anyway
            # (the iterative lineage cut).
            per_pos = (
                assigned.select(
                    "cell", F.posexplode(as_double(vec_col)).alias("pos", "x")
                )
                .groupBy("cell", "pos")
                .agg(F.collect_list("x").alias("xs"))
                .select(
                    "cell",
                    "pos",
                    (
                        F.aggregate(
                            F.array_sort("xs"), F.lit(0.0), lambda acc, x: acc + x
                        )
                        / F.size("xs")
                    ).alias("mx"),
                )
            )
            acc: dict = {}
            for r in per_pos.collect():
                acc.setdefault(r["cell"], {})[r["pos"]] = r["mx"]
            rows = [
                (c, [poss[p] for p in range(len(poss))])
                for c, poss in sorted(acc.items())
            ]
            cent = spark.createDataFrame(rows, schema=schema)
    finally:
        if own_pin:
            corpus.unpersist()
    return cent


# --------------------------------------------------------------------------
# Random-hyperplane LSH (the bucketed scale path for cosine ANN)
# --------------------------------------------------------------------------
# Hyperplanes are derived, not stored: plane j's component for dim d is
# ((A_j * d + B_j) % 2003) - 1001 — a centered pseudo-random integer the
# oracle regenerates with the same arithmetic. Deterministic, seedless,
# and identical across engines (integer ops, then a sequential double
# fold for the sign, same order both sides).
# 16 family members (r6: was 8): recommended_n_planes clamps at the
# family size, and the 100x scale point needs 11 planes (200k vectors
# at the 128-row registry target) — with 8 the knob saturated and
# bucket population started growing with the corpus again. 14 planes
# cover 1e9 vectors at the 100k default target; 16 leaves headroom.
_LSH_A = (
    7368787, 9999991, 15485867, 32452867, 49979693, 67867979, 86028157, 104395303,
    122949829, 141650963, 160481219, 179424691, 198491329, 217645199, 236887699, 256203221,
)
_LSH_B = (
    104729, 224737, 350377, 479909, 611953, 746773, 882377, 1020379,
    1159523, 1299709, 1441027, 1583539, 1727239, 1872103, 2018239, 2165569,
)
_LSH_MOD = 2003
_LSH_SHIFT = 1001


def _hyperplane(j: int, dim: int) -> Column:
    """array<double> of length ``dim`` for plane j (see module note).

    ``d`` promotes to BIGINT before the multiply: planes 4+ have
    A_j * dim > 2^31, which overflows Spark's ANSI int arithmetic
    (DuckDB computes the same product in 64-bit natively)."""
    return F.expr(
        f"transform(sequence(1, {dim}), d -> "
        f"CAST((({_LSH_A[j]} * CAST(d AS BIGINT) + {_LSH_B[j]}) % {_LSH_MOD}) - {_LSH_SHIFT} AS DOUBLE))"
    )


def sql_lsh_bucket(vec_ref: str, dim: int, n_planes: int) -> str:
    """DuckDB mirror of :func:`lsh_bucket` for oracle queries."""
    from ..functions.vector import sql_dot

    terms = []
    for j in range(n_planes):
        hp = (
            f"list_transform(range(1, {dim + 1}), d -> "
            f"CAST((({_LSH_A[j]} * d + {_LSH_B[j]}) % {_LSH_MOD}) - {_LSH_SHIFT} AS DOUBLE))"
        )
        terms.append(f"(CASE WHEN {sql_dot(vec_ref, hp)} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def sql_lsh_bucket_masked(vec_ref: str, dim: int, npl_ref: str) -> str:
    """DuckDB bucket expression whose EFFECTIVE plane count is a SQL
    scalar (``npl_ref``, e.g. a scalar subquery over COUNT(*)): all 8
    derived planes are emitted, each masked by ``j < npl_ref``, so the
    oracle reproduces :func:`lsh_bucket` called with
    :func:`recommended_n_planes` of the same corpus — the adaptive
    plane count stays deterministic-from-data on both engines."""
    from ..functions.vector import sql_dot

    terms = []
    for j in range(len(_LSH_A)):
        hp = (
            f"list_transform(range(1, {dim + 1}), d -> "
            f"CAST((({_LSH_A[j]} * d + {_LSH_B[j]}) % {_LSH_MOD}) - {_LSH_SHIFT} AS DOUBLE))"
        )
        terms.append(
            f"(CASE WHEN {j} < {npl_ref} AND {sql_dot(vec_ref, hp)} >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def sql_recommended_n_planes(table: str, target_bucket_rows: int) -> str:
    """SQL mirror of :func:`recommended_n_planes` as a scalar subquery
    (floats only touch exactly-representable small ratios, so CEIL/LOG2
    agree with Python's math.ceil/log2 away from exact powers of two,
    and AT exact powers of two both are exact)."""
    return (
        f"(SELECT CASE WHEN COUNT(*) <= {target_bucket_rows} THEN 1 ELSE "
        f"GREATEST(1, LEAST({len(_LSH_A)}, "
        f"CAST(CEIL(LOG2(COUNT(*) / {target_bucket_rows}.0)) AS INT))) END "
        f"FROM {table})"
    )


def recommended_n_planes(corpus_rows: int, target_bucket_rows: int = 100_000) -> int:
    """Plane count that keeps the expected LSH bucket near
    ``target_bucket_rows`` as the corpus grows: ``ceil(log2(corpus /
    target))``, clamped to [1, 16] (the derived-plane family size —
    extended from 8 in r6 when the 100x point saturated the clamp).

    With a FIXED plane count, bucketed ANN is still asymptotically
    quadratic once both sides scale (measured in SCALE.md); growing
    planes logarithmically with the corpus holds per-bucket — and so
    per-query — candidate work roughly constant, which is what makes
    hyperplane LSH subquadratic in deployment. The 16-member plane
    family (r6) covers 1e9 vectors at the 100k default target
    (ceil(log2(1e9/1e5)) = 14 planes) with headroom; past 2^16
    buckets, raise ``target_bucket_rows`` or extend the family."""
    import math

    if corpus_rows <= target_bucket_rows:
        return 1
    return max(1, min(len(_LSH_A), math.ceil(math.log2(corpus_rows / target_bucket_rows))))


def lsh_bucket(vec: Column, dim: int, n_planes: int = 4) -> Column:
    """Bit-packed bucket id: bit j = sign of dot(vec, plane_j).

    Map-side only — bucketing a 100 TB corpus is one narrow pass; the
    ANN join then shuffles on an int key with ~corpus/2^n_planes rows
    per bucket."""
    assert n_planes <= len(_LSH_A), f"at most {len(_LSH_A)} planes"
    b = F.lit(0)
    for j in range(n_planes):
        b = b + F.when(dot(vec, _hyperplane(j, dim)) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return b


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_planes: int = 4,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """LSH-bucketed ANN top-k: candidates = same hyperplane-sign bucket.

    Approximate (a near neighbor across a plane boundary is missed —
    raise recall with fewer planes or multi-probe), but deterministic,
    so even the approximation is exactly oracle-replayable. Shuffle
    shape: corpus bucketed map-side, one equi-join on the bucket int,
    per-query top-k heaps."""
    q = (
        queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
        .withColumn("bucket", lsh_bucket(F.col("qv"), dim, n_planes))
        .withColumn("_nq", norm(F.col("qv")))
    )
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"))
        .withColumn("bucket", lsh_bucket(F.col("cv"), dim, n_planes))
        .withColumn("_nc", norm(F.col("cv")))
    )
    cand = c.join(F.broadcast(q), "bucket")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("_nq") * F.col("_nc"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


# --------------------------------------------------------------------------
# Arrow/BLAS brute-force path (production variant for high dimensions)
# --------------------------------------------------------------------------


def brute_force_topk_arrow(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
    max_query_rows: int | None = MAX_QUERY_SIDE_ROWS,
) -> DataFrame:
    """Exact top-k via vectorized matrix products (``mapInPandas``).

    The expression-based :func:`brute_force_topk` is the oracle path;
    this is the throughput path for high dimensions: the (small) query
    matrix is a broadcast variable, each Arrow batch of the corpus
    becomes one normalized numpy matrix, and scores are a single BLAS
    GEMM per batch. Each batch pre-reduces to its local top-k per
    query, so the final shuffle carries k rows per (query, batch) —
    not the full score matrix. Results match the expression path to
    float rounding (summation order differs); ranks use the same
    (score desc, id) tie-break.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    # The cap check folds into the toPandas collection this path needs
    # anyway: pull at most cap+1 rows (bounding driver memory even for
    # an unbounded query set), then fail fast if the cap was exceeded.
    q_src = queries if max_query_rows is None else queries.limit(max_query_rows + 1)
    qpdf = q_src.select(F.col(id_col).alias("qid"), as_double(vec_col).alias("qv")).toPandas()
    if max_query_rows is not None and len(qpdf) > max_query_rows:
        raise ValueError(_guard_message("brute_force_topk_arrow", max_query_rows))
    qids = qpdf["qid"].to_numpy()
    qmat = np.stack(qpdf["qv"].to_numpy())
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((qids, qmat))

    out_schema = "query_id long, neighbor_id long, cos_sim double"

    def op(batches):
        qids_b, qmat_b = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf["cid"].to_numpy()
            cmat = np.stack(pdf["cv"].to_numpy())
            cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
            scores = cmat @ qmat_b.T  # (n_corpus_batch, n_queries)
            for j, qid in enumerate(qids_b):
                col = scores[:, j]
                mask = cids != qid if exclude_self else np.ones(len(cids), bool)
                idx = np.flatnonzero(mask)
                if not len(idx):
                    continue
                # local top-k: score desc, id asc tie-break
                order = np.lexsort((cids[idx], -col[idx]))[:k]
                sel = idx[order]
                yield pd.DataFrame(
                    {"query_id": qid, "neighbor_id": cids[sel], "cos_sim": col[sel]}
                )

    local = corpus.select(
        F.col(id_col).alias("cid"), as_double(vec_col).alias("cv")
    ).mapInPandas(op, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def lsh_topk_multiprobe(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_planes: int = 4,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Multi-probe LSH ANN: each query probes its home bucket AND the
    bucket across its weakest hyperplane (smallest |dot| — the boundary
    it most nearly straddles). Doubles per-query candidates for ~2x
    recall on boundary neighbors at no extra corpus passes — the
    standard recall knob before adding planes. Deterministic probe
    choice (ties to the lowest plane index) keeps it oracle-replayable.
    """
    assert n_planes <= len(_LSH_A)
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"))
        .withColumn("bucket", lsh_bucket(F.col("cv"), dim, n_planes))
        .withColumn("_nc", norm(F.col("cv")))
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    ).withColumn("_nq", norm(F.col("qv")))
    dots = [dot(F.col("qv"), _hyperplane(j, dim)) for j in range(n_planes)]
    q = q.withColumn("bucket", lsh_bucket(F.col("qv"), dim, n_planes))
    # weakest plane = argmin |dot| (ties -> lowest j), via a sorted
    # array of (abs_dot, j) structs
    weakest = F.sort_array(
        F.array(
            *[
                F.struct(F.abs(d).alias("a"), F.lit(j).alias("j"))
                for j, d in enumerate(dots)
            ]
        )
    )[0]["j"]
    probes = q.select(
        "query_id",
        "qv",
        "_nq",
        F.explode(
            F.array(
                F.col("bucket"),
                # 2^weakest as the flip mask (shiftleft needs a literal
                # bit count; pow is exact for these tiny exponents)
                F.col("bucket").bitwiseXOR(
                    F.pow(F.lit(2.0), weakest.cast("double")).cast("long")
                ),
            )
        ).alias("bucket"),
    )
    cand = c.join(F.broadcast(probes), "bucket")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("_nq") * F.col("_nc"))).alias(
            "cos_sim"
        ),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
