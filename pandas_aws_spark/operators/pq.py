"""Product quantization (PQ) for approximate nearest neighbor search.

The missing piece between brute force and IVF/LSH (``similarity.py``):
at 100 TB the corpus' raw vectors (256 B+ each at dim 64) don't fit hot
storage, so the scale play is IVF-PQ — compress every vector to ``m``
one-byte codes (here m=8: 8 bytes per vector, a 32x shrink) and search
with asymmetric distance computation (ADC): the query stays exact, each
corpus vector's distance is approximated as the sum of per-subspace
distances from the query's subvector to the corpus vector's assigned
sub-centroid, read out of an m x k lookup table.

Distribution shape: training runs m independent k-means over
subvector slices (only the m x k x d codebook — kilobytes — ever
reaches the driver, per round, to cut iterative lineage); encoding is
a broadcast join + per-(vector, subspace) argmin; search is a
broadcast of the per-query LUT joined against the exploded codes —
corpus never shuffles until the final per-query top-k, which Spark
executes with WindowGroupLimit partial heaps.

Squared-L2 metric throughout (for cosine, L2-normalize vectors first —
then L2 ranking equals cosine ranking). Deterministic end to end:
first-k-by-id init, fixed iteration count, ties broken on centroid id.

Bit-portable across engines, so the whole train -> encode -> ADC ->
re-rank pipeline is SQL-oracle-expressible (the fixed iteration count
unrolls into CTEs — see queries/similarity.py): every cross-row float
reduction is a *sorted sequential fold* (centroid means fold the
group's values in ascending order; ADC folds per-subspace distances in
subspace order), and every within-row reduction is the same
left-to-right fold ``functions.vector`` uses. IEEE-754 addition of
identical operands in identical order is deterministic, so Spark and
DuckDB produce bit-identical codebooks, codes, and distances — plain
``avg``/``sum`` would not survive partial-aggregation reorder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import bounded_window_key
from ..functions.vector import as_double

__all__ = [
    "l2_normalize",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "pq_topk_refined",
    "ivf_pq_build",
    "ivf_pq_build_full",
    "ivf_pq_topk",
    "probe_frame",
]


def _l2sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 (deterministic element order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_normalize(df: DataFrame, *, vec_col: str = "embedding") -> DataFrame:
    """Row-local L2 normalization of an embedding column (in place).

    Norm is the same sequential fold the rest of the vector math uses,
    so normalized components are bit-portable across engines. After
    normalization, squared-L2 ranking equals cosine ranking
    (||a-b||^2 = 2 - 2*cos), which is what lets one PQ index serve a
    cosine workload. Zero vectors normalize to zeros."""
    v = as_double(vec_col)
    nrm = F.sqrt(
        F.aggregate(F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda a, p: a + p)
    )
    return df.withColumn(
        vec_col,
        F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(
            F.transform(v, lambda x: x * F.lit(0.0))
        ),
    )


def _subvectors(df: DataFrame, id_col: str, vec_col: str, m: int, d: int) -> DataFrame:
    """Explode each vector into (id, sub, subvec) rows, sub in [0, m)."""
    slices = F.expr(
        f"transform(sequence(0, {m - 1}), j -> slice({vec_col}, j * {d} + 1, {d}))"
    )
    return df.select(
        F.col(id_col), F.posexplode(slices).alias("sub", "subvec")
    )


def _cb_one(codebook: DataFrame) -> DataFrame:
    """The codebook as a ONE-row frame holding one array column ``_cb``
    of ``(sub, centroid_id, cvec)`` structs — the broadcast shape the
    map-side LUT expression below consumes (r15). Element order inside
    the array is irrelevant: every consumer folds with an explicit
    (dist, centroid_id) comparison, so the result is
    order-independent."""
    return codebook.agg(
        F.collect_list(F.struct("sub", "centroid_id", "cvec")).alias("_cb")
    )


def _cb_by_sub(codebook: DataFrame) -> DataFrame:
    """The codebook as a ONE-row frame whose ``_cb`` column is an array
    INDEXED BY SUBSPACE: element ``j`` holds subspace ``j``'s
    ``(centroid_id, cvec)`` candidates (r16). The r15 flat shape made
    every per-row argmin re-FILTER all m x k entries per subspace per
    corpus row; higher-order functions execute interpreted (no codegen),
    so that filter was pure per-row overhead — grouping once in this
    1-row broadcast frame turns it into an O(1) ``F.get`` per row
    (guide §1.2: per-task work). Candidate order within a subspace is
    irrelevant: the argmin is order-independent; a subspace with no
    centroids yields an empty element and a NULL code, exactly like the
    r15 empty-filter result."""
    flat = codebook.agg(F.collect_list(F.struct("sub", "centroid_id", "cvec")).alias("_f"))
    return flat.select(
        F.transform(
            F.sequence(
                F.lit(0), F.array_max(F.transform(F.col("_f"), lambda e: e["sub"]))
            ),
            lambda j: F.transform(
                F.filter(F.col("_f"), lambda e: e["sub"] == j),
                lambda e: F.struct(e["centroid_id"].alias("cid"), e["cvec"].alias("cvec")),
            ),
        ).alias("_cb")
    )


def _argmin_code(scored: Column) -> Column:
    """Argmin over an array of ``(d, cid)`` structs: smallest distance,
    ties to the smallest centroid id — the exact semantics of the
    pre-r15 ``F.min(F.struct(dist, centroid_id))`` group aggregate AND
    of the r15 explicit fold this replaces (r16): ``array_min`` is the
    total-order struct minimum (d first, then cid; NaN greatest,
    NaN = NaN), which is precisely what the fold's
    ``(c.d < acc.d) | (c.d == acc.d & c.cid < acc.cid)`` comparison
    computed. The fold referenced its ``scored`` subtree THREE times
    (slice/size/get) and interpreted HOF evaluation re-computes every
    reference per row — 3x the transform + l2sq work for the same
    argmin. Empty array still yields NULL."""
    return F.array_min(scored)["cid"]


def _code_for_sub(subvec: Column, cb_col: Column, sub: Column | int) -> Column:
    """Nearest sub-centroid id for one ALREADY-SLICED subvector — a
    pure per-row expression over the subspace-indexed broadcast
    codebook array (``_cb_by_sub``; r15 map-side shape, r16 indexing;
    guide §2.4: the broadcast-join + groupBy argmin it replaces paid
    one Exchange of corpus x m rows per evaluation for math that never
    needed to cross rows). ``F.get`` is 0-based and NULL-safe, so an
    out-of-range subspace degrades to a NULL code like the r15
    empty-filter path."""
    sub = F.lit(sub) if isinstance(sub, int) else sub
    cand = F.get(cb_col, sub)
    scored = F.transform(
        cand,
        lambda e: F.struct(
            _l2sq(subvec, e["cvec"]).alias("d"),
            e["cid"].alias("cid"),
        ),
    )
    return _argmin_code(scored)


def _codes_column(vec: Column, cb_col: Column, m: int, d: int) -> Column:
    """Full PQ code array (subspace order) for one vector — map-side.
    The slice expression matches ``_subvectors`` exactly (same 1-based
    offsets), so codes are bit-identical to the pre-r15 exploded path.
    One ``transform`` over ``sequence(0, m-1)`` (r16) instead of the
    r15 ``F.array`` of m inlined argmin copies: the values are the same
    per-j expressions, but the plan carries ONE argmin subtree instead
    of m — m x smaller interpreted-expression trees and generated
    code."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: _code_for_sub(F.slice(vec, j * F.lit(d) + 1, d), cb_col, j),
    )


# collision-free flat LUT key: sub * 2^32 + centroid_id (both ints)
_LUT_KEY_BASE = 1 << 32


def _lut_map_column(qv: Column, cb_col: Column) -> Column:
    """One query's ADC lookup table as ``map<bigint, double>`` over the
    broadcast codebook array: key = sub * 2^32 + centroid_id, value =
    the same ``_l2sq(query subvector, cvec)`` the exploded LUT rows
    carried pre-r15 (identical slice offsets, so identical doubles)."""
    return F.map_from_entries(
        F.transform(
            cb_col,
            lambda e: F.struct(
                (
                    e["sub"].cast("long") * F.lit(_LUT_KEY_BASE) + e["centroid_id"]
                ).alias("key"),
                _l2sq(
                    F.slice(qv, e["sub"] * F.size(e["cvec"]) + 1, F.size(e["cvec"])),
                    e["cvec"],
                ).alias("value"),
            ),
        )
    )


def _adc_column(lut: Column, codes: Column) -> Column:
    """ADC = sequential fold of the m LUT distances in ascending
    subspace order — the same addition order as the pre-r15
    ``array_sort(collect_list(struct(sub, dist)))`` fold, so the double
    is bit-identical. Every (sub, code) key exists by construction
    (codes were argmin'd over the same codebook)."""
    return F.aggregate(
        F.sequence(F.lit(0), F.size(codes) - 1),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            lut, j.cast("long") * F.lit(_LUT_KEY_BASE) + F.element_at(codes, j + 1)
        ),
    )


def pq_train(
    corpus: DataFrame,
    *,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Train an L2 codebook: for each of ``m`` subspaces, ``k``
    centroids via Lloyd's iterations (init = first k subvectors by
    id). Returns ``(sub, centroid_id, cvec: array<double>)``.

    ``dim`` skips the dimension probe when the caller already knows it
    (r15 — one fewer driver job per build).

    Distribution shape (r15/r16, guide §2.2/§2.4): assignment is a
    pure per-row argmin over the subspace-indexed broadcast codebook
    array (no exchange — it was a broadcast join + groupBy(id, sub)
    shuffle of corpus x m rows per iteration), and the mean update is
    ONE groupBy(sub, code, pos) shuffle per iteration whose per-group
    aggregation state is the O(members) scalar list of ONE position
    (r16, the r15 verdict's ask #4 — the r15 fused groupBy(sub, code)
    collected whole subvectors, an O(members x d) buffer per group
    that a hot cell can blow at corpus scale); the k x m x d per-
    position means are collected and assembled into centroid arrays
    driver-side, which costs nothing extra because the codebook is
    collected per round anyway (the iterative-lineage cut). The
    per-group per-position ascending-sorted sequential fold is
    unchanged — the one cross-row float reduction in training stays
    deterministic AND engine-portable (DuckDB mirrors it with
    list(x ORDER BY x) + list_reduce; F.avg would give
    partial-agg-order-dependent last ULPs). ``subs`` is persisted for
    the duration of the loop (released in the finally) so each
    iteration's assignment reads the materialized subvectors instead
    of re-scanning + re-normalizing + re-slicing the source per round
    (guide §5, the r15 verdict's ask #3)."""
    spark = corpus.sparkSession
    if dim is None:
        dim = corpus.select(F.size(as_double(vec_col)).alias("n")).first()["n"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    subs = _subvectors(
        corpus.select(F.col(id_col), as_double(vec_col).alias(vec_col)), id_col, vec_col, m, d
    )
    # Init = first k subvectors BY ID per subspace. Every id contributes
    # exactly one subvector per sub, so that set is exactly the
    # subvectors of the k smallest ids — take THOSE first (r15, guide
    # §2.2): ``orderBy(id).limit(k)`` plans as TakeOrdered (narrow,
    # driver-merged top-k; the same shape kmeans_fit's init already
    # uses) and the row_number window runs over <= k*m local rows. The
    # pre-r15 init windowed the ENTIRE corpus x m subvector set — an
    # Exchange into only m partitions (m hot tasks at corpus scale)
    # just to keep k rows per sub. Selected rows, centroid ids and
    # subvector bytes are identical.
    init_subs = _subvectors(
        corpus.select(F.col(id_col), as_double(vec_col).alias(vec_col))
        .orderBy(id_col)
        .limit(k),
        id_col,
        vec_col,
        m,
        d,
    )
    init_w = Window.partitionBy("sub").orderBy(id_col)
    cb = (
        init_subs.withColumn("_rn", F.row_number().over(init_w))
        .filter(F.col("_rn") <= k)
        .select("sub", F.col("_rn").alias("centroid_id"), F.col("subvec").alias("cvec"))
    )
    schema = "sub int, centroid_id int, cvec array<double>"
    from pyspark import StorageLevel

    subs = subs.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for _ in range(iters):
            assigned = (
                subs.crossJoin(F.broadcast(_cb_by_sub(cb)))
                .withColumn(
                    "code",
                    _code_for_sub(F.col("subvec"), F.col("_cb"), F.col("sub")),
                )
                .select("sub", "subvec", "code")
            )
            # Per-(sub, code, POSITION) groups: the aggregation buffer is
            # one position's scalars — O(members) — and the per-position
            # mean is the identical ascending-sorted sequential fold over
            # the identical value multiset the r15 whole-vector
            # collect_list computed, so the double is bit-identical.
            per_pos = (
                assigned.select("sub", "code", F.posexplode("subvec").alias("pos", "x"))
                .groupBy("sub", "code", "pos")
                .agg(F.collect_list("x").alias("xs"))
                .select(
                    "sub",
                    "code",
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
                acc.setdefault((r["sub"], r["code"]), {})[r["pos"]] = r["mx"]
            rows = [
                (s, c, [poss[p] for p in range(d)]) for (s, c), poss in sorted(acc.items())
            ]
            cb = spark.createDataFrame(rows, schema=schema)
    finally:
        subs.unpersist()
    return cb


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int | None = None,
    d: int | None = None,
) -> DataFrame:
    """Compress each vector to its ``m`` sub-centroid codes. Returns
    ``(id_col, codes: array<int>)`` with codes ordered by subspace.

    Pure map over the corpus since r15 (guide §2.4): the codes array
    is a per-row argmin expression against the ONE-row broadcast
    codebook — the pre-r15 shape (subvector explode -> broadcast join
    -> groupBy(id, sub) argmin -> groupBy(id) collect) paid two
    exchanges of corpus x m rows per evaluation for a computation that
    never crosses rows. ``m``/``d`` skip the two codebook probes when
    the caller already knows them (e.g. from stored index params)."""
    if m is None:
        m = codebook.select(F.max("sub")).first()[0] + 1
    if d is None:
        d = codebook.select(F.size("cvec")).first()[0]
    return (
        corpus.select(F.col(id_col), as_double(vec_col).alias("_v"))
        .crossJoin(F.broadcast(_cb_by_sub(codebook)))
        .select(
            F.col(id_col), _codes_column(F.col("_v"), F.col("_cb"), m, d).alias("codes")
        )
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """ADC search: approximate top-k neighbors of each query among the
    PQ-encoded corpus. Returns (query_id, neighbor_id, rank, adc_fp)
    — adc_fp is the approximate squared-L2 distance in floored
    micro-units (stable integer output).

    r15 (guide §2.3/§2.4): each query's LUT is a map column computed
    once from the ONE-row broadcast codebook, and ADC is a per-row
    sequential fold in ascending subspace order (bit-identical float
    additions — not F.sum: the fixed fold order keeps the double
    stable across partitionings and engines). The pre-r15 shape
    (posexplode codes x m -> broadcast LUT-row join ->
    groupBy(query_id, neighbor_id) sorted fold) shuffled m x the
    query-neighbor pair volume for a reduction that never crosses
    rows. The query side rides a 1-row-per-query broadcast NLJ — the
    same capped-query-side class as every ANN scoring pass."""
    qlut = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qv")
        )
        .crossJoin(F.broadcast(_cb_one(codebook)))
        .select(
            "query_id", _lut_map_column(F.col("_qv"), F.col("_cb")).alias("_lut")
        )
    )
    pairs = codes.select(F.col(id_col).alias("neighbor_id"), "codes").crossJoin(
        F.broadcast(qlut)
    )
    if exclude_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        _adc_column(F.col("_lut"), F.col("codes")).alias("adc"),
    )
    # asc_nulls_last (r16, r15 ADVICE): a NULL adc is impossible for a
    # self-consistent index (codes are argmin'd over the same codebook
    # the LUT covers) but a corrupted/mismatched stored artifact would
    # yield element_at misses -> NULL adc, and the default NULLS FIRST
    # would rank garbage #1. Fail-safe ordering only — no live row's
    # rank changes, so every oracle hash is unchanged.
    w = Window.partitionBy("query_id").orderBy(
        F.asc_nulls_last("adc"), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("adc") * 1000000).cast("long").alias("adc_fp"),
        )
    )


def pq_topk_refined(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    oversample: int = 5,
) -> DataFrame:
    """Two-stage retrieval (the standard IVF-PQ deployment): ADC over
    the compressed codes prunes the corpus to ``k * oversample``
    candidates per query, then ONLY those candidates' raw vectors are
    fetched and re-ranked with exact distances. At 100 TB the exact
    stage touches oversample*k rows per query instead of the corpus —
    the compressed index does the heavy lifting, the refinement
    restores exactness where it matters. Returns (query_id,
    neighbor_id, rank, l2sq_fp)."""
    cand = pq_topk(
        queries, codes, codebook, id_col=id_col, vec_col=vec_col, k=k * oversample
    ).select("query_id", "neighbor_id")
    raw = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_nv")
    )
    qv = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qv"))
    # broadcast the shortlist (r15) — same rationale as ivf_pq_topk:
    # bounded by |queries| x k x oversample id pairs; without the hint
    # the planner can shuffle the corpus side by neighbor_id.
    exact = (
        raw.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("_l2", _l2sq(F.col("_qv"), F.col("_nv")))
    )
    w = Window.partitionBy("query_id").orderBy("_l2", "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("_l2") * 1000000).cast("long").alias("l2sq_fp"),
        )
    )


def ivf_pq_build(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    coarse: str = "first",
    coarse_iters: int = 3,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the reusable IVF-PQ index triple over the L2-normalized
    corpus: ``(centroids, codebook, codes)`` — codes carry the coarse
    ``cell`` column. Build once (at 100 TB: train on a sample, encode
    the full corpus in one pass), then hand the triple to
    :func:`ivf_pq_topk` for every search.

    ``coarse`` picks the coarse-quantizer training: ``"first"`` (the
    SQL-replayable static init — first ``n_centroids`` vectors by id)
    or ``"kmeans"`` (``coarse_iters`` Lloyd rounds via
    :func:`~pandas_aws_spark.operators.similarity.kmeans_fit` — the
    production choice: trained cells track the data distribution, so
    nprobe cells hold more of each query's true neighbors; measured
    recall delta in SCALE.md)."""
    cents, cb, codes, _ = ivf_pq_build_full(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        m=m,
        k_codes=k_codes,
        iters=iters,
        coarse=coarse,
        coarse_iters=coarse_iters,
    )
    return cents, cb, codes


def ivf_pq_build_full(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    coarse: str = "first",
    coarse_iters: int = 3,
    coarse_sample: float | None = None,
    dim: int | None = None,
    carry_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """:func:`ivf_pq_build` plus the fourth frame a PERSISTED index
    needs: ``vectors`` — the L2-normalized raw vectors with their
    ``cell`` assignment ``(id_col, vec_col, cell)``. The exact re-rank
    stage reads raw vectors for the shortlisted candidates; an on-disk
    index must carry them (normalized ONCE, at build/append time) or
    every search would re-scan and re-normalize the source corpus —
    defeating the artifact. See :mod:`.annindex` for the lifecycle.

    ``coarse_sample`` (with ``coarse='kmeans'``): train the coarse
    quantizer on a deterministic hash-sample of the corpus instead of
    all of it — the 100 TB build story, since coarse training is the
    dominant build term (r8 isolation: 897.6s of a 64-cell 200k-row
    build) while assignment/encoding are single broadcast-join passes.
    Sampling only needs the sample to SEE the density structure, so
    recall holds at small fractions (measured r9, SCALE.md: recall@10
    at 1% training within noise of full-corpus training). Deterministic
    (xxhash64 threshold on the id), so rebuilds converge."""
    # carry_cols (r15): payload/metadata columns ride the normalize ->
    # assign lineage into the returned codes/vectors frames instead of
    # being joined back on id afterwards (two exchanges of the corpus
    # per payload-bearing build, for columns that never left the row).
    carry = [F.col(c) for c in carry_cols]
    cn = l2_normalize(
        corpus.select(F.col(id_col), as_double(vec_col).alias(vec_col), *carry),
        vec_col=vec_col,
    )
    # TRAINING-SCOPED persist of the normalized corpus (r16, the r15
    # verdict's ask #3): every training action below — the optional
    # sample count, each coarse k-means round, the dim probe, pq_train's
    # subvector materialization — otherwise re-evaluates the source scan
    # + normalization from parquet (4-5 evaluations per build; the two
    # lifecycle bench rows flow through this on every build/rebuild).
    # Released in the finally BEFORE returning, so the lazily-returned
    # codes/vectors frames recompute from source (write_ann_index pins
    # them for its own writes) and no CacheManager entry outlives the
    # call — the r12 cache-release protocol.
    from pyspark import StorageLevel

    cn = cn.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _build_full_trained(
            cn,
            id_col=id_col,
            vec_col=vec_col,
            n_centroids=n_centroids,
            m=m,
            k_codes=k_codes,
            iters=iters,
            coarse=coarse,
            coarse_iters=coarse_iters,
            coarse_sample=coarse_sample,
            dim=dim,
            carry=carry,
        )
    finally:
        cn.unpersist()


def _build_full_trained(
    cn: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    m: int,
    k_codes: int,
    iters: int,
    coarse: str,
    coarse_iters: int,
    coarse_sample: float | None,
    dim: int | None,
    carry: list,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Training + plan assembly over the ALREADY-PINNED normalized
    corpus (split out of :func:`ivf_pq_build_full` so the persist /
    unpersist bracket reads as one try/finally)."""
    from .similarity import ivf_assign, kmeans_fit

    if coarse == "kmeans":
        train = cn
        if coarse_sample is not None:
            if not (0.0 < coarse_sample <= 1.0):
                raise ValueError(f"coarse_sample must be in (0, 1], got {coarse_sample}")
            train = cn.filter(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_000))
                < int(coarse_sample * 1_000_000)
            )
            # The hash-sample can come up short on a SMALL corpus
            # (r9 ADVICE: k-means with fewer rows than centroids gets
            # degenerate input with an opaque failure). One cheap count
            # — on the sample, not the corpus — and fall back to
            # full-corpus training, which is affordable exactly when
            # the corpus is small enough for the sample to miss.
            if train.limit(n_centroids).count() < n_centroids:
                train = cn
        cents = kmeans_fit(
            train, k=n_centroids, iters=coarse_iters, id_col=id_col, vec_col=vec_col
        )
    elif coarse == "first":
        cents = (
            cn.orderBy(id_col)
            .limit(n_centroids)
            .select(
                F.row_number().over(Window.partitionBy(bounded_window_key()).orderBy(id_col)).alias("centroid_id"),
                F.col(vec_col),
            )
        )
    else:
        raise ValueError(f"coarse must be 'first' or 'kmeans', got {coarse!r}")
    if dim is None:
        dim = cn.select(F.size(F.col(vec_col)).alias("n")).first()["n"]
    cb = pq_train(cn, m=m, k=k_codes, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim)
    indexed = ivf_assign(cn, cents, id_col=id_col, vec_col=vec_col)
    # codes share the assigned lineage: the map-side codes column (r15)
    # rides the SAME rows the cell assignment produced, so the pre-r15
    # encode-then-join-on-id (two exchanges of the batch per
    # evaluation) disappears — build/append never shuffle the corpus.
    codes = (
        indexed.crossJoin(F.broadcast(_cb_by_sub(cb)))
        .select(
            F.col(id_col),
            _codes_column(F.col(vec_col), F.col("_cb"), m, dim // m).alias("codes"),
            "cell",
            *carry,
        )
    )
    vectors = indexed.select(F.col(id_col), F.col(vec_col), "cell", *carry)
    return cents, cb, codes, vectors


def probe_frame(
    qn: DataFrame, centroids: DataFrame, vec_col: str, nprobe: int
) -> DataFrame:
    """Per-query probed-cell frame ``(query_id, cell, qv)`` — THE probe
    ranking (cosine form with per-row norms, centroid_id tie-break),
    defined once (r14, review finding) and consumed by
    :func:`ivf_pq_topk` itself, by ``annindex.ann_index_radius``'s
    scoring join, and by ``annindex.ann_index_topk``'s literal
    cell-pruning collect — the pruning is only sound because the cells
    it collects come from the SAME ranking the search then probes, so
    the sharing is load-bearing, not cosmetic. Lazy; callers persist
    when consuming it more than once. ``qn`` must already be the
    L2-normalized ``(query_id, qv)`` projection."""
    from ..functions.vector import dot as _dot
    from ..functions.vector import norm as _norm

    cc = centroids.select(
        "centroid_id", F.col(vec_col).alias("cvec_c")
    ).withColumn("_ncc", _norm(F.col("cvec_c")))
    qc = (
        qn.withColumn("_nq", _norm(F.col("qv")))
        .crossJoin(F.broadcast(cc))
        .withColumn(
            "_sim", _dot(F.col("qv"), F.col("cvec_c")) / (F.col("_nq") * F.col("_ncc"))
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.col("centroid_id"))
    return (
        qc.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", F.col("centroid_id").alias("cell"), "qv")
    )


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame | None,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    k: int = 10,
    oversample: int = 5,
    exclude_self: bool = True,
    centroids: DataFrame | None = None,
    codebook: DataFrame | None = None,
    codes: DataFrame | None = None,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: the composed 100 TB ANN architecture — a coarse inverted
    file prunes WHICH vectors each query scores (``nprobe`` of
    ``n_centroids`` cells), product quantization prunes WHAT is read to
    score them (m one-byte codes instead of raw floats), and an exact
    re-rank of the ``k * oversample`` ADC shortlist restores precision.
    Scan fraction ~ nprobe/n_centroids of the corpus, touched at ~1/32
    the bytes, with only shortlisted raw vectors ever fetched.

    Index reuse (the deployment shape — build once, search many):
    pass ``centroids`` (centroid_id, vec), ``codebook`` (sub,
    centroid_id, cvec), and ``codes`` (id_col, codes, cell) from a
    prior build to skip training, encoding, and cell assignment
    entirely; all three must come from the same L2-normalized corpus.
    Additionally passing ``vectors`` — the ALREADY-NORMALIZED corpus
    ``(id_col, vec_col[, cell])`` a persisted index stores (see
    :func:`ivf_pq_build_full` / :mod:`.annindex`) — supplies the exact
    re-rank side directly, and ``corpus`` may then be ``None``: a
    search against a stored index touches ONLY index files, never the
    source corpus, and never re-normalizes (normalize-twice is not
    bit-stable on the last ULP, which would break oracle replay).
    Per-call training here exists so the registry entry is a
    self-contained, oracle-replayable pipeline.

    Both sides are L2-normalized first (squared-L2 ranking then equals
    cosine ranking), so the one index serves the engine's cosine
    workloads. Fully deterministic — static first-C coarse centroids
    (cosine assignment, id tie-break; swap in ``kmeans_fit`` output for
    production quality), sorted-fold PQ training — so the whole
    pipeline is SQL-replayable (``q_sim_ivf_pq``'s oracle).

    Distribution shape: coarse assignment and probe selection are
    broadcast joins (centroids are kilobytes); codes + cell ride one
    narrow table; the ADC join shuffles code rows, never vectors; the
    re-rank fetches oversample*k raw rows per query.
    """
    from .similarity import ivf_assign
    from ..functions.vector import cosine

    qn = l2_normalize(
        queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")),
        vec_col="qv",
    )
    cn = None
    if centroids is None or codes is None or vectors is None:
        if corpus is None:
            raise ValueError(
                "corpus is required unless centroids, codes AND vectors "
                "are all supplied from a prior build"
            )
        cn = l2_normalize(
            corpus.select(F.col(id_col), as_double(vec_col).alias(vec_col)),
            vec_col=vec_col,
        )
    if centroids is not None:
        cents = centroids.select("centroid_id", F.col(vec_col))
    else:
        cents = (
            cn.orderBy(id_col)
            .limit(n_centroids)
            .select(
                F.row_number().over(Window.partitionBy(bounded_window_key()).orderBy(id_col)).alias("centroid_id"),
                F.col(vec_col),
            )
        )
    cb = codebook
    if cb is None:
        cb = pq_train(cn, m=m, k=k_codes, iters=iters, id_col=id_col, vec_col=vec_col)
    if codes is None:
        d = cb.select(F.size("cvec")).first()[0]
        indexed = ivf_assign(cn, cents, id_col=id_col, vec_col=vec_col)
        # same single-lineage shape as ivf_pq_build_full (r15): the
        # codes column rides the assigned rows, no encode-then-join.
        codes = indexed.crossJoin(F.broadcast(_cb_by_sub(cb))).select(
            F.col(id_col),
            _codes_column(F.col(vec_col), F.col("_cb"), m, d).alias("codes"),
            "cell",
        )

    # both sides are L2-normalized above, but the probe ranking mirrors
    # the un-normalized cosine form; norms precomputed per row (r8,
    # bit-identical — see brute_force_topk). Shared with every other
    # stored-search shape via probe_frame (r14) so the literal
    # cell-pruning in annindex cannot drift from the ranking actually
    # probed here. The probes frame carries each query's ADC LUT as a
    # map column (r15, guide §2.3/§2.4): the pre-r15 shape exploded
    # codes x m, broadcast-hash-joined the (sub, code) LUT rows, and
    # re-assembled ADC with a groupBy(query_id, neighbor_id) sorted
    # fold — ONE Exchange of m x candidate rows per search. ADC is now
    # a per-row fold in the same ascending-subspace order (bit-equal
    # float additions), so nothing shuffles between the codes scan and
    # the shortlist window, and the shuffled volume that remains is
    # 1/m of what it was.
    probes = (
        probe_frame(qn, cents, vec_col, nprobe)
        .crossJoin(F.broadcast(_cb_one(cb)))
        .select(
            "query_id",
            "cell",
            _lut_map_column(F.col("qv"), F.col("_cb")).alias("_lut"),
        )
    )
    pairs = codes.select(
        F.col(id_col).alias("neighbor_id"), "cell", "codes"
    ).join(F.broadcast(probes), "cell")
    if exclude_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        _adc_column(F.col("_lut"), F.col("codes")).alias("adc"),
    )
    # asc_nulls_last: same fail-safe as pq_topk's shortlist window — a
    # malformed stored code can never outrank real candidates (r16,
    # r15 ADVICE; no live row moves, oracle hashes unchanged).
    ws = Window.partitionBy("query_id").orderBy(
        F.asc_nulls_last("adc"), "neighbor_id"
    )
    short = (
        scored.withColumn("_rn", F.row_number().over(ws))
        .filter(F.col("_rn") <= k * oversample)
        .select("query_id", "neighbor_id")
    )

    rerank_side = vectors if vectors is not None else cn
    raw = rerank_side.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"))
    # broadcast the shortlist (r15): bounded by |queries| x k x
    # oversample rows of two ids — without the hint the planner sizes
    # the window output blind and can pick a sort-merge join that
    # shuffles the STORED VECTORS side by neighbor_id, the exact
    # corpus-scale shuffle the shortlist exists to avoid.
    exact = (
        raw.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qn.select("query_id", F.col("qv").alias("_qv"))), "query_id")
        .withColumn("_l2", _l2sq(F.col("_qv"), F.col("_nv")))
    )
    wr = Window.partitionBy("query_id").orderBy("_l2", "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("_l2") * 1000000).cast("long").alias("l2sq_fp"),
        )
    )
