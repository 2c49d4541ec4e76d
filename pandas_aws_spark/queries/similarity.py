"""Similarity-search queries over the ``embeddings`` table — the
brute-force exact baseline and the IVF scale path, both oracle-checked
(IVF is deterministic here: fixed centroids, argmax assignment with
id tie-break — so even the *approximate* probe-2 variant has an exact
DuckDB replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import sql_cosine
from ..operators.similarity import brute_force_topk, ivf_topk
from ..registry import load_table, query

_K = 5
_NCENT = 8

# shared oracle fragment: queries = every 100th vector
_BASE_CTE = """
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0)
"""

_BRUTE_ORACLE = f"""
WITH {_BASE_CTE},
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {sql_cosine('q.qv', 'c.v')} AS cos_sim
  FROM q, e c
  WHERE c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cos_sim
FROM ranked WHERE rank <= {_K}
ORDER BY query_id, rank
"""


def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 100 == 0)


@query("q_sim_bruteforce_topk", oracle=_BRUTE_ORACLE, headline=True, tags=("similarity",))
def q_sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors. Queries broadcast; corpus never
    shuffles for the scoring pass (map-side nested loop), only the
    per-query top-k ranking shuffles (and WindowGroupLimit keeps it to
    per-partition heaps)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = brute_force_topk(_queries_df(spark, sf_dir), emb, k=_K)
    return out.orderBy("query_id", "rank")


@query("q_sim_ivf_fullprobe", oracle=_BRUTE_ORACLE, tags=("similarity", "ivf"))
def q_sim_ivf_fullprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF machinery with nprobe = n_centroids: must EQUAL exact brute
    force (same oracle) — the correctness proof for the index path."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(
        _queries_df(spark, sf_dir), emb, n_centroids=_NCENT, nprobe=_NCENT, k=_K
    )
    return out.orderBy("query_id", "rank")


_IVF2_ORACLE = f"""
WITH {_BASE_CTE},
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS centroid_id, v AS cv
  FROM e ORDER BY vec_id LIMIT {_NCENT}
),
corpus_scored AS (
  SELECT e.vec_id, e.v, ct.centroid_id,
         {sql_cosine('e.v', 'ct.cv')} AS sim
  FROM e, cent ct
),
assigned AS (
  SELECT vec_id, v, centroid_id AS cell
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, centroid_id) AS rn
        FROM corpus_scored)
  WHERE rn = 1
),
query_scored AS (
  SELECT q.query_id, q.qv, ct.centroid_id,
         {sql_cosine('q.qv', 'ct.cv')} AS sim
  FROM q, cent ct
),
probes AS (
  SELECT query_id, qv, centroid_id AS cell
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, centroid_id) AS rn
        FROM query_scored)
  WHERE rn <= 2
),
cand AS (
  SELECT p.query_id, p.qv, a.vec_id AS neighbor_id, a.v AS cv
  FROM probes p JOIN assigned a ON a.cell = p.cell
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         {sql_cosine('qv', 'cv')} AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY {sql_cosine('qv', 'cv')} DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, rank, cos_sim
FROM ranked WHERE rank <= {_K}
ORDER BY query_id, rank
"""


@query("q_sim_ivf_probe2", oracle=_IVF2_ORACLE, tags=("similarity", "ivf"))
def q_sim_ivf_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2 of 8 cells: the real ANN trade — each query
    scans ~1/4 of the corpus. Deterministic index construction makes
    even this approximate search exactly replayable by the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(_queries_df(spark, sf_dir), emb, n_centroids=_NCENT, nprobe=2, k=_K)
    return out.orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# Random-hyperplane LSH ANN — the bucketed scale path; approximate but
# deterministic, so exactly replayable. Plane count ADAPTS to corpus
# size (recommended_n_planes), holding expected bucket population — and
# so per-query candidate work — roughly constant as the corpus grows;
# a fixed plane count is asymptotically quadratic once both sides
# scale. The oracle reproduces the adaptive count with a COUNT(*)
# scalar subquery, so the bucketing stays deterministic-from-data on
# both engines.
# --------------------------------------------------------------------------
from ..operators.similarity import (  # noqa: E402
    lsh_topk,
    recommended_n_planes,
    sql_lsh_bucket_masked,
    sql_recommended_n_planes,
)

_DIM = 64
# Registry target bucket population: small enough that the adaptive
# knob actually moves across the test scales (sf0.01: 500 rows -> 2
# planes, sf0.1: 2k -> 4, 10x scale point: 20k -> 8); a deployment
# against a real corpus would use the operator default (100k).
_LSH_TARGET_BUCKET_ROWS = 128
_SQL_NPL = sql_recommended_n_planes("embeddings", _LSH_TARGET_BUCKET_ROWS)

_np_cache: dict[str, int] = {}


def _adaptive_planes(spark: SparkSession, sf_dir: str) -> int:
    """Driver-side mirror of the oracle's COUNT(*) scalar subquery: a
    parquet metadata count (no data read) feeding recommended_n_planes.
    Cached per sf_dir — the count is a property of the dataset."""
    if sf_dir not in _np_cache:
        n = load_table(spark, sf_dir, "embeddings").count()
        _np_cache[sf_dir] = recommended_n_planes(n, _LSH_TARGET_BUCKET_ROWS)
    return _np_cache[sf_dir]


_LSH_ORACLE = f"""
WITH {_BASE_CTE},
cb AS (SELECT vec_id AS neighbor_id, v AS cv,
              {sql_lsh_bucket_masked('v', _DIM, _SQL_NPL)} AS bucket FROM e),
qb AS (SELECT query_id, qv,
              {sql_lsh_bucket_masked('qv', _DIM, _SQL_NPL)} AS bucket FROM q),
cand AS (
  SELECT qb.query_id, qb.qv, cb.neighbor_id, cb.cv
  FROM cb JOIN qb ON cb.bucket = qb.bucket
  WHERE cb.neighbor_id <> qb.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         {sql_cosine('qv', 'cv')} AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY {sql_cosine('qv', 'cv')} DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, rank, cos_sim
FROM ranked WHERE rank <= {_K}
ORDER BY query_id, rank
"""


@query("q_sim_lsh_bucketed", oracle=_LSH_ORACLE, tags=("similarity", "lsh"))
def q_sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: bucket = bit-packed hyperplane signs
    (map-side), candidates = bucket equi-join, exact-cosine rank <= 5.
    Plane count derives from the corpus size (recommended_n_planes via
    a metadata count), so expected bucket population stays near the
    target as the corpus grows — candidates per query are ~constant
    instead of growing linearly, which is what keeps bucketed ANN
    subquadratic in deployment; multi-probe tunes recall back up when
    the bucket fan-out gets fine."""
    emb = load_table(spark, sf_dir, "embeddings")
    npl = _adaptive_planes(spark, sf_dir)
    out = lsh_topk(_queries_df(spark, sf_dir), emb, dim=_DIM, n_planes=npl, k=_K)
    return out.orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# Multi-probe LSH: home bucket + weakest-plane flip per query. Plane
# count ADAPTS to corpus size exactly like the single-probe entry (r6;
# the probe sequence depends on the plane count, so the weakest-plane
# argmin is masked to the first npl planes on both engines).
# --------------------------------------------------------------------------
from ..operators.similarity import _LSH_A, lsh_topk_multiprobe  # noqa: E402
from ..functions.vector import sql_dot  # noqa: E402


def _sql_plane(j: int) -> str:
    from ..operators.similarity import _LSH_B, _LSH_MOD, _LSH_SHIFT

    return (
        f"list_transform(range(1, {_DIM + 1}), d -> "
        f"CAST((({_LSH_A[j]} * d + {_LSH_B[j]}) % {_LSH_MOD}) - {_LSH_SHIFT} AS DOUBLE))"
    )


# masked |dot| per plane: planes beyond the adaptive count get a +inf
# sentinel so they can never win the weakest-plane argmin (LEAST) and
# the CASE equality scan resolves ties to the LOWEST index — matching
# the Spark side's sort_array((abs_dot, j)) tie-break.
_QDOTS = ",\n       ".join(
    f"CASE WHEN {j} < {_SQL_NPL} THEN abs({sql_dot('qv', _sql_plane(j))}) "
    f"ELSE CAST(1e308 AS DOUBLE) END AS ad{j}"
    for j in range(len(_LSH_A))
)
_MP_LEAST = "LEAST(" + ", ".join(f"ad{j}" for j in range(len(_LSH_A))) + ")"
_MP_MASK = (
    "CASE "
    + " ".join(f"WHEN ad{j} = m THEN {1 << j}" for j in range(len(_LSH_A)))
    + " END"
)

_MULTIPROBE_ORACLE = f"""
WITH {_BASE_CTE},
cb AS (SELECT vec_id AS neighbor_id, v AS cv,
              {sql_lsh_bucket_masked('v', _DIM, _SQL_NPL)} AS bucket FROM e),
qd AS (SELECT query_id, qv,
              {sql_lsh_bucket_masked('qv', _DIM, _SQL_NPL)} AS bucket,
       {_QDOTS}
       FROM q),
qflip AS (
  SELECT query_id, qv, bucket, {_MP_MASK} AS mask
  FROM (SELECT *, {_MP_LEAST} AS m FROM qd)
),
probes AS (
  SELECT query_id, qv, bucket FROM qflip
  UNION ALL
  SELECT query_id, qv, xor(bucket, mask) FROM qflip
),
cand AS (
  SELECT DISTINCT p.query_id, p.qv, cb.neighbor_id, cb.cv
  FROM cb JOIN probes p ON cb.bucket = p.bucket
  WHERE cb.neighbor_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         {sql_cosine('qv', 'cv')} AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY {sql_cosine('qv', 'cv')} DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, rank, cos_sim
FROM ranked WHERE rank <= {_K}
ORDER BY query_id, rank
"""


@query("q_sim_lsh_multiprobe", oracle=_MULTIPROBE_ORACLE, tags=("similarity", "lsh"))
def q_sim_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH: each query also probes across its weakest
    hyperplane (smallest |dot| among the ACTIVE planes — the boundary
    it nearly straddles), roughly doubling recall on boundary
    neighbors for 2x candidate cost and zero extra corpus passes.
    The plane count derives from the corpus size (recommended_n_planes
    via a metadata count, same knob as q_sim_lsh_bucketed — r5's
    adaptive rewrite left this entry on a fixed 4, re-acquiring the
    quadratic tail the rewrite removed; r6 closes that). The probe
    sequence adapts with it: the weakest-plane argmin only ranges over
    the active planes, which the oracle mirrors with +inf-masked |dot|
    terms."""
    emb = load_table(spark, sf_dir, "embeddings")
    npl = _adaptive_planes(spark, sf_dir)
    out = lsh_topk_multiprobe(
        _queries_df(spark, sf_dir), emb, dim=_DIM, n_planes=npl, k=_K
    )
    return out.orderBy("query_id", "rank")


@query("q_sim_ivf_kmeans", oracle=_BRUTE_ORACLE, tags=("similarity", "ivf", "kmeans"))
def q_sim_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over TRAINED centroids (Lloyd's k-means, 3 rounds,
    deterministic init) probing every cell — an iterative-algorithm
    capability proof that stays exactly oracle-checkable: full probe
    equals brute force no matter what centroids the training produced,
    so the whole train+index+search pipeline is verified end-to-end.
    Recall quality of partial probes over the same trained index is
    covered in tests/test_similarity.py (probe-2 recall floor)."""
    from ..operators.similarity import kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=_NCENT, iters=3)
    out = ivf_topk(
        _queries_df(spark, sf_dir),
        emb,
        n_centroids=_NCENT,
        nprobe=_NCENT,
        k=_K,
        centroids=cents,
    )
    return out.orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# Product quantization: full SQL replay of train -> encode -> ADC ->
# exact re-rank. The fixed iteration count (2) unrolls into CTE pairs;
# every float reduction in operators/pq.py is a sorted sequential fold,
# so DuckDB reproduces the codebook, codes, ADC distances, and final
# ranks bit-for-bit.
# --------------------------------------------------------------------------
_PQ_M = 8          # subspaces
_PQ_K = 16         # sub-centroids per subspace
_PQ_ITERS = 2
_PQ_D = _DIM // _PQ_M
_PQ_TOPK = 10
_PQ_OVERSAMPLE = 5


def _sql_l2sq(a: str, b: str, d: int) -> str:
    """Sequential-fold squared L2 over d elements — mirrors pq._l2sq
    (zip_with then left fold, identical element order)."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {d + 1}), i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        f"(acc, x) -> acc + x)"
    )


def _pq_iteration_ctes(t: int, src: str = "subs") -> str:
    """assign{t} (argmin vs cb{t-1}) + cb{t} (sorted-fold means).
    ``src`` names the subvector CTE training folds over — the default
    trains on the full corpus; the persisted-index ingest oracle passes
    its base-subset CTE so appended batches are ENCODED but never
    TRAINED on (mirroring append_ann_index's no-retrain contract)."""
    dist = _sql_l2sq("s.subvec", "cb.cvec", _PQ_D)
    return f"""
assign{t} AS (
  SELECT vec_id, sub, subvec, code FROM (
    SELECT s.vec_id, s.sub, s.subvec, cb.centroid_id AS code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
                              ORDER BY {dist}, cb.centroid_id) AS rn
    FROM {src} s JOIN cb{t - 1} cb ON cb.sub = s.sub)
  WHERE rn = 1
),
cb{t} AS (
  SELECT sub, code AS centroid_id, list(mval ORDER BY pos) AS cvec
  FROM (
    SELECT sub, code, pos,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(x ORDER BY x)),
                       (a, b) -> a + b) / COUNT(*) AS mval
    FROM (SELECT a.sub, a.code, p.pos, a.subvec[p.pos] AS x
          FROM assign{t} a, (SELECT unnest(range(1, {_PQ_D + 1})) AS pos) p)
    GROUP BY sub, code, pos)
  GROUP BY sub, code
)"""


_PQ_SHORTLIST = _PQ_TOPK * _PQ_OVERSAMPLE

_PQ_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
subs AS (
  SELECT e.vec_id, s.sub,
         list_slice(e.v, s.sub * {_PQ_D} + 1, s.sub * {_PQ_D} + {_PQ_D}) AS subvec
  FROM e, (SELECT unnest(range(0, {_PQ_M})) AS sub) s
),
cb0 AS (
  SELECT sub, CAST(rn AS INT) AS centroid_id, subvec AS cvec
  FROM (SELECT sub, subvec,
               ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
        FROM subs)
  WHERE rn <= {_PQ_K}
),
{_pq_iteration_ctes(1).strip()},
{_pq_iteration_ctes(2).strip()},
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT s.vec_id, s.sub, cb.centroid_id AS code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
                              ORDER BY {_sql_l2sq("s.subvec", "cb.cvec", _PQ_D)},
                                       cb.centroid_id) AS rn
    FROM subs s JOIN cb{_PQ_ITERS} cb ON cb.sub = s.sub)
  WHERE rn = 1
),
lut AS (
  SELECT s.vec_id AS query_id, s.sub, cb.centroid_id AS code,
         {_sql_l2sq("s.subvec", "cb.cvec", _PQ_D)} AS dist
  FROM subs s JOIN cb{_PQ_ITERS} cb ON cb.sub = s.sub
  WHERE s.vec_id < 3
),
adc AS (
  SELECT l.query_id, c.vec_id AS neighbor_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(l.dist ORDER BY l.sub)),
                     (a, b) -> a + b) AS adc
  FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rn
    FROM adc)
  WHERE rn <= {_PQ_SHORTLIST}
),
rerank AS (
  SELECT s.query_id, s.neighbor_id, {_sql_l2sq("qe.v", "ne.v", _DIM)} AS l2
  FROM short s
  JOIN e ne ON ne.vec_id = s.neighbor_id
  JOIN e qe ON qe.vec_id = s.query_id
)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank,
       CAST(FLOOR(l2 * 1000000) AS BIGINT) AS l2sq_fp
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY l2, neighbor_id) AS rn
      FROM rerank)
WHERE rn <= {_PQ_TOPK}
ORDER BY query_id, rank
"""


@query("q_sim_pq_adc", oracle=_PQ_ORACLE, tags=("similarity", "pq"))
def q_sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ's compression half: vectors quantized to m=8 one-byte
    codes (32x smaller than raw dim-64 floats), searched via
    asymmetric distance (per-query LUT over sub-centroids), then the
    production two-stage shape: ADC shortlist (5x oversample) ->
    exact re-rank of only the shortlisted raw vectors. The 100 TB
    path when raw vectors can't stay hot. Oracle-checked end to end:
    the 2 Lloyd's iterations unroll into SQL CTEs and every float
    reduction is a sorted sequential fold (see operators/pq.py), so
    DuckDB replays training, encoding, and both ranking stages
    bit-for-bit. Recall-vs-exact is additionally asserted in
    tests/test_pq.py."""
    from ..operators.pq import pq_encode, pq_topk_refined, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_train(emb, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS)
    codes = pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") < 3)
    return pq_topk_refined(
        queries, codes, cb, emb, k=_PQ_TOPK, oversample=_PQ_OVERSAMPLE
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# IVF-PQ composed: coarse cells prune WHICH vectors are scored, PQ codes
# prune WHAT is read to score them, exact re-rank restores precision.
# Oracle = the PQ replay above + normalized base + coarse cell filter.
# --------------------------------------------------------------------------
_IVFPQ_NPROBE = 2

_IVFPQ_ORACLE = f"""
WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
e AS (
  SELECT vec_id,
         CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm)
              ELSE list_transform(v, x -> x * 0.0) END AS v
  FROM (SELECT vec_id, v, SQRT({sql_dot("v", "v")}) AS nrm FROM e0)
),
subs AS (
  SELECT e.vec_id, s.sub,
         list_slice(e.v, s.sub * {_PQ_D} + 1, s.sub * {_PQ_D} + {_PQ_D}) AS subvec
  FROM e, (SELECT unnest(range(0, {_PQ_M})) AS sub) s
),
cb0 AS (
  SELECT sub, CAST(rn AS INT) AS centroid_id, subvec AS cvec
  FROM (SELECT sub, subvec,
               ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
        FROM subs)
  WHERE rn <= {_PQ_K}
),
{_pq_iteration_ctes(1).strip()},
{_pq_iteration_ctes(2).strip()},
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT s.vec_id, s.sub, cb.centroid_id AS code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
                              ORDER BY {_sql_l2sq("s.subvec", "cb.cvec", _PQ_D)},
                                       cb.centroid_id) AS rn
    FROM subs s JOIN cb{_PQ_ITERS} cb ON cb.sub = s.sub)
  WHERE rn = 1
),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS centroid_id, v AS cv
  FROM e ORDER BY vec_id LIMIT {_NCENT}
),
cells AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, ct.centroid_id AS cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.v', 'ct.cv')} DESC,
                                       ct.centroid_id) AS rn
    FROM e, cent ct)
  WHERE rn = 1
),
qprobes AS (
  SELECT query_id, cell FROM (
    SELECT q.vec_id AS query_id, ct.centroid_id AS cell,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {sql_cosine('q.v', 'ct.cv')} DESC,
                                       ct.centroid_id) AS rn
    FROM e q, cent ct WHERE q.vec_id < 3)
  WHERE rn <= {_IVFPQ_NPROBE}
),
lut AS (
  SELECT s.vec_id AS query_id, s.sub, cb.centroid_id AS code,
         {_sql_l2sq("s.subvec", "cb.cvec", _PQ_D)} AS dist
  FROM subs s JOIN cb{_PQ_ITERS} cb ON cb.sub = s.sub
  WHERE s.vec_id < 3
),
adc AS (
  SELECT l.query_id, c.vec_id AS neighbor_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(l.dist ORDER BY l.sub)),
                     (a, b) -> a + b) AS adc
  FROM codes c
  JOIN cells ce ON ce.vec_id = c.vec_id
  JOIN lut l ON l.sub = c.sub AND l.code = c.code
  JOIN qprobes p ON p.query_id = l.query_id AND p.cell = ce.cell
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rn
    FROM adc)
  WHERE rn <= {_PQ_SHORTLIST}
),
rerank AS (
  SELECT s.query_id, s.neighbor_id, {_sql_l2sq("qe.v", "ne.v", _DIM)} AS l2
  FROM short s
  JOIN e ne ON ne.vec_id = s.neighbor_id
  JOIN e qe ON qe.vec_id = s.query_id
)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank,
       CAST(FLOOR(l2 * 1000000) AS BIGINT) AS l2sq_fp
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY l2, neighbor_id) AS rn
      FROM rerank)
WHERE rn <= {_PQ_TOPK}
ORDER BY query_id, rank
"""


@query("q_sim_ivf_pq", oracle=_IVFPQ_ORACLE, tags=("similarity", "pq", "ivf"))
def q_sim_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed — the production 100 TB ANN architecture: a
    coarse inverted file prunes WHICH vectors each query scores
    (nprobe=2 of 8 cells -> ~1/4 scan fraction), PQ prunes WHAT is
    read to score them (8 one-byte codes, 32x smaller than raw), and
    an exact re-rank of the 5x-oversampled ADC shortlist restores
    precision on only oversample*k raw rows per query. Vectors are
    L2-normalized first so squared-L2 ranking equals cosine ranking.
    Fully oracle-checked: every stage (normalization, coarse
    assignment, Lloyd's PQ training, ADC, re-rank) is a deterministic
    sorted/sequential fold DuckDB replays bit-for-bit."""
    from ..operators.pq import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    return ivf_pq_topk(
        queries,
        emb,
        n_centroids=_NCENT,
        nprobe=_IVFPQ_NPROBE,
        m=_PQ_M,
        k_codes=_PQ_K,
        iters=_PQ_ITERS,
        k=_PQ_TOPK,
        oversample=_PQ_OVERSAMPLE,
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# IVF-PQ with TRAINED coarse cells (coarse="kmeans") — the documented
# production choice, now oracle-verified (r6): the 3 Lloyd rounds
# unroll into CTEs exactly like the PQ training above. kmeans_fit's
# centroid mean is the same ascending-sorted sequential fold as
# pq_train (r6 change), so the trained centroids — and everything
# downstream of them — are bit-identical across engines.
# --------------------------------------------------------------------------
_COARSE_ITERS = 3


def _kmeans_iteration_ctes(t: int) -> str:
    """kcells{t} (argmax cosine vs kcent{t-1}, id tie-break) +
    kcent{t} (per-cell sorted-fold means) — the SQL mirror of one
    kmeans_fit round over the normalized corpus."""
    return f"""
kcells{t} AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, ct.centroid_id AS cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.v', 'ct.cv')} DESC,
                                       ct.centroid_id) AS rn
    FROM e, kcent{t - 1} ct)
  WHERE rn = 1
),
kcent{t} AS (
  SELECT cell AS centroid_id, list(m ORDER BY pos) AS cv
  FROM (
    SELECT cell, pos,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(x ORDER BY x)),
                       (a, b) -> a + b) / COUNT(*) AS m
    FROM (SELECT k.cell, p.pos, k.v[p.pos] AS x
          FROM kcells{t} k, (SELECT unnest(range(1, {_DIM + 1})) AS pos) p)
    GROUP BY cell, pos)
  GROUP BY cell
)"""


_IVFPQ_TRAINED_ORACLE = f"""
WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
e AS (
  SELECT vec_id,
         CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm)
              ELSE list_transform(v, x -> x * 0.0) END AS v
  FROM (SELECT vec_id, v, SQRT({sql_dot("v", "v")}) AS nrm FROM e0)
),
subs AS (
  SELECT e.vec_id, s.sub,
         list_slice(e.v, s.sub * {_PQ_D} + 1, s.sub * {_PQ_D} + {_PQ_D}) AS subvec
  FROM e, (SELECT unnest(range(0, {_PQ_M})) AS sub) s
),
cb0 AS (
  SELECT sub, CAST(rn AS INT) AS centroid_id, subvec AS cvec
  FROM (SELECT sub, subvec,
               ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
        FROM subs)
  WHERE rn <= {_PQ_K}
),
{_pq_iteration_ctes(1).strip()},
{_pq_iteration_ctes(2).strip()},
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT s.vec_id, s.sub, cb.centroid_id AS code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
                              ORDER BY {_sql_l2sq("s.subvec", "cb.cvec", _PQ_D)},
                                       cb.centroid_id) AS rn
    FROM subs s JOIN cb{_PQ_ITERS} cb ON cb.sub = s.sub)
  WHERE rn = 1
),
kcent0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS centroid_id, v AS cv
  FROM e ORDER BY vec_id LIMIT {_NCENT}
),
{_kmeans_iteration_ctes(1).strip()},
{_kmeans_iteration_ctes(2).strip()},
{_kmeans_iteration_ctes(3).strip()},
cells AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, ct.centroid_id AS cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {sql_cosine('e.v', 'ct.cv')} DESC,
                                       ct.centroid_id) AS rn
    FROM e, kcent{_COARSE_ITERS} ct)
  WHERE rn = 1
),
qprobes AS (
  SELECT query_id, cell FROM (
    SELECT q.vec_id AS query_id, ct.centroid_id AS cell,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {sql_cosine('q.v', 'ct.cv')} DESC,
                                       ct.centroid_id) AS rn
    FROM e q, kcent{_COARSE_ITERS} ct WHERE q.vec_id < 3)
  WHERE rn <= {_IVFPQ_NPROBE}
),
lut AS (
  SELECT s.vec_id AS query_id, s.sub, cb.centroid_id AS code,
         {_sql_l2sq("s.subvec", "cb.cvec", _PQ_D)} AS dist
  FROM subs s JOIN cb{_PQ_ITERS} cb ON cb.sub = s.sub
  WHERE s.vec_id < 3
),
adc AS (
  SELECT l.query_id, c.vec_id AS neighbor_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(l.dist ORDER BY l.sub)),
                     (a, b) -> a + b) AS adc
  FROM codes c
  JOIN cells ce ON ce.vec_id = c.vec_id
  JOIN lut l ON l.sub = c.sub AND l.code = c.code
  JOIN qprobes p ON p.query_id = l.query_id AND p.cell = ce.cell
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rn
    FROM adc)
  WHERE rn <= {_PQ_SHORTLIST}
),
rerank AS (
  SELECT s.query_id, s.neighbor_id, {_sql_l2sq("qe.v", "ne.v", _DIM)} AS l2
  FROM short s
  JOIN e ne ON ne.vec_id = s.neighbor_id
  JOIN e qe ON qe.vec_id = s.query_id
)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank,
       CAST(FLOOR(l2 * 1000000) AS BIGINT) AS l2sq_fp
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY l2, neighbor_id) AS rn
      FROM rerank)
WHERE rn <= {_PQ_TOPK}
ORDER BY query_id, rank
"""


@query(
    "q_sim_ivf_pq_trained",
    oracle=_IVFPQ_TRAINED_ORACLE,
    tags=("similarity", "pq", "ivf", "kmeans"),
)
def q_sim_ivf_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with TRAINED coarse cells — q_sim_ivf_pq's architecture
    with coarse="kmeans" (3 Lloyd rounds over the normalized corpus),
    the documented production choice: trained cells track the data
    distribution so nprobe cells hold more of each query's true
    neighbors (+recall at the same scan fraction, SCALE.md). Until r6
    this path had only a pytest recall floor; kmeans_fit's centroid
    means are now the same sorted sequential fold as PQ training, so
    the whole trained pipeline — Lloyd rounds included — unrolls into
    oracle CTEs and is hash-verified. Runs through ivf_pq_build /
    prebuilt-index ivf_pq_topk, so the build-once/search-many
    deployment path is what the driver checks."""
    from ..operators.pq import ivf_pq_build, ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    cents, cb, codes = ivf_pq_build(
        emb,
        n_centroids=_NCENT,
        m=_PQ_M,
        k_codes=_PQ_K,
        iters=_PQ_ITERS,
        coarse="kmeans",
        coarse_iters=_COARSE_ITERS,
    )
    return ivf_pq_topk(
        queries,
        emb,
        nprobe=_IVFPQ_NPROBE,
        k=_PQ_TOPK,
        oversample=_PQ_OVERSAMPLE,
        centroids=cents,
        codebook=cb,
        codes=codes,
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# Int8 symmetric quantization of the embedding store.
# --------------------------------------------------------------------------
_QUANT_ORACLE = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
m AS (
  SELECT vec_id, label, v,
         list_max(list_transform(v, x -> abs(x))) AS ma
  FROM e
),
qt AS (
  SELECT vec_id, label,
         CASE WHEN ma > 0
              THEN list_transform(v, x -> CAST(round(127.0 * x / ma) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
  FROM m
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(list_reduce(list_prepend(CAST(0 AS BIGINT), q), (a, b) -> a + b)) AS BIGINT)
         AS sum_q,
       CAST(MAX(list_max(q)) AS BIGINT) AS max_q,
       CAST(MIN(list_min(q)) AS BIGINT) AS min_q
FROM qt
GROUP BY label
ORDER BY label
"""


@query("q_embed_quantize_int8", oracle=_QUANT_ORACLE, tags=("similarity", "quantization"))
def q_embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (q_i =
    round(127 * x_i / max_abs)) — the 4x storage/bandwidth cut every
    100 TB embedding store takes before ANN. All array expressions in
    codegen (transform/aggregate), one row-local pass, no shuffle of
    vectors; the groupBy carries three int64 counters per label. The
    identical expression tree runs on both engines, so the rounded
    codes are bit-reproducible (ties round away from zero on both)."""
    from ..functions.vector import as_double

    e = load_table(spark, sf_dir, "embeddings").withColumn("v", as_double("embedding"))
    ma = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    d = e.withColumn("ma", ma).withColumn(
        "q",
        F.when(
            F.col("ma") > 0,
            F.transform(F.col("v"), lambda x: F.round(F.lit(127.0) * x / F.col("ma")).cast("long")),
        ).otherwise(F.transform(F.col("v"), lambda x: F.lit(0).cast("long"))),
    )
    sum_q = F.aggregate(F.col("q"), F.lit(0).cast("long"), lambda a, x: a + x)
    return (
        d.select("label", F.col("q"), sum_q.alias("sq"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("sq").alias("sum_q"),
            F.max(F.array_max("q")).alias("max_q"),
            F.min(F.array_min("q")).alias("min_q"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Matryoshka truncation recall: top-k with the first 16 of 64 dims vs
# the full-dimension exact top-k.
# --------------------------------------------------------------------------
_MATRYOSHKA_D = 16
_MATRYOSHKA_K = 10
_MATRYOSHKA_ORACLE = f"""
WITH {_BASE_CTE},
full_ranked AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY q.query_id
                            ORDER BY {sql_cosine('q.qv', 'c.v')} DESC, c.vec_id) AS rank
  FROM q, e c WHERE c.vec_id <> q.query_id
),
tq AS (SELECT query_id, list_slice(qv, 1, {_MATRYOSHKA_D}) AS qv FROM q),
te AS (SELECT vec_id, list_slice(v, 1, {_MATRYOSHKA_D}) AS v FROM e),
trunc_ranked AS (
  SELECT tq.query_id, te.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY tq.query_id
                            ORDER BY {sql_cosine('tq.qv', 'te.v')} DESC, te.vec_id) AS rank
  FROM tq, te WHERE te.vec_id <> tq.query_id
),
common AS (
  SELECT f.query_id, COUNT(*) AS n_common
  FROM (SELECT query_id, neighbor_id FROM full_ranked WHERE rank <= {_MATRYOSHKA_K}) f
  JOIN (SELECT query_id, neighbor_id FROM trunc_ranked WHERE rank <= {_MATRYOSHKA_K}) t
    ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
  GROUP BY f.query_id
),
per_q AS (
  SELECT q.query_id, COALESCE(c.n_common, 0) AS n_common
  FROM q LEFT JOIN common c ON c.query_id = q.query_id
)
SELECT CAST(n_common AS BIGINT) AS n_common, COUNT(*) AS n_queries
FROM per_q GROUP BY n_common ORDER BY n_common
"""


@query("q_embed_matryoshka_recall", oracle=_MATRYOSHKA_ORACLE, tags=("similarity", "quantization"))
def q_embed_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation audit: search with only
    the FIRST 16 of 64 dimensions (a 4x bandwidth/storage cut, the MRL
    deployment trick) and histogram the overlap with the exact
    full-dimension top-10 per query. This is the measurement that
    decides whether truncated embeddings are good enough to serve.

    Scale shape: both passes are the guarded broadcast-query scoring
    pattern (corpus never shuffles; WindowGroupLimit heaps do the
    top-k); the overlap join carries only (query_id, neighbor_id)
    pairs — 2k rows per query."""
    from ..functions.vector import as_double

    emb = load_table(spark, sf_dir, "embeddings")
    qs = _queries_df(spark, sf_dir)
    full = brute_force_topk(qs, emb, k=_MATRYOSHKA_K)
    t_emb = emb.select("vec_id", F.slice(as_double("embedding"), 1, _MATRYOSHKA_D).alias("embedding"))
    t_qs = t_emb.filter(F.col("vec_id") % 100 == 0)
    trunc = brute_force_topk(t_qs, t_emb, k=_MATRYOSHKA_K)
    common = (
        full.select("query_id", "neighbor_id")
        .join(trunc.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    per_q = (
        qs.select(F.col("vec_id").alias("query_id"))
        .join(common, "query_id", "left")
        .select(F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"))
    )
    return per_q.groupBy("n_common").agg(F.count(F.lit(1)).alias("n_queries")).orderBy("n_common")


# --------------------------------------------------------------------------
# Radius (range) search: ALL neighbors above a similarity threshold,
# not a fixed top-k — via LSH bucket candidates.
# --------------------------------------------------------------------------
_RANGE_TAU = "0.4"  # literal in both engines; empirically-active for this data

_RANGE_ORACLE = f"""
WITH {_BASE_CTE},
cb AS (SELECT vec_id AS neighbor_id, v AS cv,
              {sql_lsh_bucket_masked('v', _DIM, _SQL_NPL)} AS bucket FROM e),
qb AS (SELECT query_id, qv,
              {sql_lsh_bucket_masked('qv', _DIM, _SQL_NPL)} AS bucket FROM q),
cand AS (
  SELECT qb.query_id, qb.qv, cb.neighbor_id, cb.cv
  FROM cb JOIN qb ON cb.bucket = qb.bucket
  WHERE cb.neighbor_id <> qb.query_id
)
SELECT query_id,
       COUNT(*) AS n_candidates,
       CAST(SUM(CASE WHEN {sql_cosine('qv', 'cv')} >= {_RANGE_TAU} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matches
FROM cand GROUP BY query_id ORDER BY query_id
"""


@query("q_sim_range_search", oracle=_RANGE_ORACLE, tags=("similarity", "lsh"))
def q_sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search — return EVERY neighbor above cosine 0.4, not a
    fixed top-k (the dedup/recall-sweep shape, where result counts per
    query vary and a k-cap would silently truncate). Candidates come
    from hyperplane-LSH bucket equality; per query the result is the
    candidate count and the verified in-radius count.

    Scale shape: identical to the LSH top-k path (bucket equi-join,
    corpus/2^planes rows per bucket) but with NO ranking window at all
    — a pure filter + count, so the only shuffle is the bucket join.
    Plane count adapts to the corpus (recommended_n_planes), holding
    bucket population — and so candidate counts — near the target as
    the corpus grows instead of letting them scale linearly."""
    from ..functions.vector import as_double, cosine
    from ..operators.similarity import lsh_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    npl = _adaptive_planes(spark, sf_dir)
    e = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double("embedding").alias("cv"),
        lsh_bucket(as_double("embedding"), _DIM, npl).alias("bucket"),
    )
    q = _queries_df(spark, sf_dir).select(
        F.col("vec_id").alias("query_id"),
        as_double("embedding").alias("qv"),
        lsh_bucket(as_double("embedding"), _DIM, npl).alias("bucket"),
    )
    # per-vector norms precomputed (r8, bit-identical — see
    # operators/similarity.brute_force_topk)
    from ..functions.vector import dot, norm

    e = e.withColumn("_nc", norm(F.col("cv")))
    q = q.withColumn("_nq", norm(F.col("qv")))
    cand = e.join(q, "bucket").filter(F.col("neighbor_id") != F.col("query_id"))
    return (
        cand.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(
                F.when(
                    dot(F.col("qv"), F.col("cv")) / (F.col("_nq") * F.col("_nc"))
                    >= float(_RANGE_TAU),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_matches"),
        )
        .orderBy("query_id")
    )


# --------------------------------------------------------------------------
# k-NN majority-vote classification — the embedding-quality eval.
# --------------------------------------------------------------------------
_KNN_K = 5
_KNN_ORACLE = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS true_label, v AS qv FROM e WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, q.true_label, c.label AS nlabel, c.vec_id AS neighbor_id,
         {sql_cosine('q.qv', 'c.v')} AS cos_sim
  FROM q, e c WHERE c.vec_id <> q.query_id
),
topk AS (
  SELECT query_id, true_label, nlabel
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored)
  WHERE rank <= {_KNN_K}
),
votes AS (
  SELECT query_id, true_label, nlabel, COUNT(*) AS n_votes
  FROM topk GROUP BY query_id, true_label, nlabel
),
pred AS (
  SELECT query_id, true_label, nlabel AS pred_label
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY n_votes DESC, nlabel) AS rn
        FROM votes)
  WHERE rn = 1
)
SELECT CAST(true_label AS BIGINT) AS true_label,
       COUNT(*) AS n_queries,
       CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
FROM pred GROUP BY true_label ORDER BY true_label
"""


@query("q_sim_knn_classify", oracle=_KNN_ORACLE, tags=("similarity", "model", "eval"))
def q_sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN majority-vote classification of the held-out query vectors
    against their ``label`` column — the standard embedding-quality
    probe (if nearest neighbors do not share labels, the space is not
    learning anything). Votes tie-break on the smaller label so the
    prediction is deterministic. On THIS synthetic corpus the readout
    is chance-level (labels are independent of the vectors) — which is
    the eval doing its job: it reports that these embeddings carry no
    label signal, exactly what you want surfaced before training on
    retrieval labels.

    Scale shape: the scoring pass is the guarded broadcast-query
    pattern; voting and argmax are two bounded aggregations
    (queries x k rows). Accuracy rolls up per true label."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    qs = _queries_df(spark, sf_dir)
    topk = brute_force_topk(qs, emb, k=_KNN_K)
    nl = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel"))
    tl = emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("true_label"))
    votes = (
        topk.join(F.broadcast(nl), "neighbor_id")
        .join(F.broadcast(tl), "query_id")
        .groupBy("query_id", "true_label", "nlabel")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.col("nlabel"))
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "true_label", F.col("nlabel").alias("pred_label"))
    )
    return (
        pred.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
        )
        .select(F.col("true_label").cast("long"), "n_queries", "n_correct")
        .orderBy("true_label")
    )


# --------------------------------------------------------------------------
# Embedding-dimension diagnostics: per-dimension activity stats that
# catch collapsed / dead dimensions before they silently waste index
# storage and distance computation (a 100 TB embedding pipeline checks
# this at ingest, not after the ANN index is built).
# --------------------------------------------------------------------------
_DIMDIAG_ORACLE = f"""
WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (
  SELECT i AS dim,
         CAST(FLOOR(v[CAST(i AS INT) + 1] * 1000000 + 0.5) AS BIGINT) AS c
  FROM e, UNNEST(range(0, {_DIM})) AS u(i)
)
SELECT CAST(dim AS BIGINT) AS dim,
       COUNT(*) AS n_vecs,
       CAST(SUM(c) AS BIGINT) AS sum_ppm,
       CAST(SUM(ABS(c)) AS BIGINT) AS sum_abs_ppm,
       MIN(c) AS min_ppm,
       MAX(c) AS max_ppm,
       CASE WHEN MAX(c) - MIN(c) < 1000 THEN 1 ELSE 0 END AS collapsed
FROM x GROUP BY dim ORDER BY dim
"""


@query("q_embed_dim_diagnostics", oracle=_DIMDIAG_ORACLE, tags=("similarity", "quality"))
def q_embed_dim_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health: count, signed/absolute magnitude
    sums and min/max per coordinate, plus a collapsed-dimension flag
    (range < 1e-3). A dimension every vector agrees on carries no
    information — it inflates index storage and distance cost for
    nothing, and at 100 TB you want that surfaced by a one-pass scan,
    not discovered after building an IVF index over dead coordinates.
    Components are fixed-pointed to ppm (floor(x * 1e6 + 0.5), the
    identical double op on both engines) so every aggregate is an
    exact integer.

    Scale shape: posexplode widens rows 64x MAP-SIDE only — the partial
    hash aggregate combines to 64 groups inside the same stage, so the
    shuffle carries 64 rows per task regardless of corpus size. One
    scan, one narrow shuffle."""
    from ..functions.vector import as_double

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.posexplode(as_double("embedding")).alias("dim", "x")
    )
    c = F.floor(F.col("x") * 1000000 + F.lit(0.5)).cast("long")
    return (
        emb.select(F.col("dim").cast("long"), c.alias("c"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("c").cast("long").alias("sum_ppm"),
            F.sum(F.abs(F.col("c"))).cast("long").alias("sum_abs_ppm"),
            F.min("c").alias("min_ppm"),
            F.max("c").alias("max_ppm"),
        )
        .withColumn(
            "collapsed",
            F.when(F.col("max_ppm") - F.col("min_ppm") < 1000, 1).otherwise(0),
        )
        .orderBy("dim")
    )


# --------------------------------------------------------------------------
# ANN rank-quality eval: IVF(nprobe=2) top-10 vs the exact top-10 —
# overlap, rank displacement, and reciprocal rank of the true nearest
# neighbor. Recall@k (elsewhere) says WHETHER neighbors are found;
# this says how well their ORDER survives the approximation.
# --------------------------------------------------------------------------
_EVAL_K = 10

_RANKQ_ORACLE = f"""
WITH {_BASE_CTE},
exact AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {sql_cosine('q.qv', 'c.v')} DESC, c.vec_id) AS rank
    FROM q, e c WHERE c.vec_id <> q.query_id
  ) WHERE rank <= {_EVAL_K}
),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS centroid_id, v AS cv
  FROM e ORDER BY vec_id LIMIT {_NCENT}
),
assigned AS (
  SELECT vec_id, v, centroid_id AS cell
  FROM (SELECT e.vec_id, e.v, ct.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {sql_cosine('e.v', 'ct.cv')} DESC, ct.centroid_id) AS rn
        FROM e, cent ct)
  WHERE rn = 1
),
probes AS (
  SELECT query_id, qv, cell
  FROM (SELECT q.query_id, q.qv, ct.centroid_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {sql_cosine('q.qv', 'ct.cv')} DESC, ct.centroid_id) AS rn
        FROM q, cent ct)
  WHERE rn <= 2
),
approx AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
                              ORDER BY {sql_cosine('p.qv', 'a.v')} DESC, a.vec_id) AS rank
    FROM probes p JOIN assigned a ON a.cell = p.cell
    WHERE a.vec_id <> p.query_id
  ) WHERE rank <= {_EVAL_K}
),
joined AS (
  SELECT x.query_id, x.rank AS rank_e, a.rank AS rank_a
  FROM exact x JOIN approx a
    ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
),
per_q AS (
  SELECT q.query_id,
         COALESCE(j.n_common, 0) AS n_common,
         COALESCE(j.displacement, 0) AS displacement,
         COALESCE(j.rr_ppm, 0) AS rr_ppm
  FROM q LEFT JOIN (
    SELECT query_id,
           COUNT(*) AS n_common,
           SUM(ABS(rank_e - rank_a)) AS displacement,
           CAST(SUM(CASE WHEN rank_e = 1 THEN 1000000 // rank_a ELSE 0 END) AS BIGINT) AS rr_ppm
    FROM joined GROUP BY query_id
  ) j USING (query_id)
)
SELECT COUNT(*) AS n_queries,
       CAST(SUM(n_common) AS BIGINT) AS sum_overlap,
       CAST(SUM(displacement) AS BIGINT) AS sum_displacement,
       CAST(SUM(rr_ppm) AS BIGINT) AS sum_rr_ppm
FROM per_q
"""


@query("q_sim_eval_rank_quality", oracle=_RANKQ_ORACLE, tags=("similarity", "ivf", "quality"))
def q_sim_eval_rank_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-quality eval of the IVF scale path against the exact
    baseline at k=10: total overlap, total |rank displacement| over
    shared neighbors, and summed reciprocal rank (ppm, integer-exact:
    1e6 div rank) of each query's TRUE nearest neighbor inside the
    approximate list. Recall@k elsewhere measures set membership; this
    measures whether the ORDER a re-ranker or a serving layer depends
    on survives the approximation.

    Scale shape: both passes are the existing guarded ANN plans (exact:
    broadcast capped query side; IVF: nprobe/C scan fraction); the eval
    join carries only (query_id, neighbor_id, rank) triples — 2k rows
    per query side."""
    emb = load_table(spark, sf_dir, "embeddings")
    qs = _queries_df(spark, sf_dir)
    exact = brute_force_topk(qs, emb, k=_EVAL_K).select(
        "query_id", "neighbor_id", F.col("rank").alias("rank_e")
    )
    approx = ivf_topk(qs, emb, n_centroids=_NCENT, nprobe=2, k=_EVAL_K).select(
        "query_id", "neighbor_id", F.col("rank").alias("rank_a")
    )
    joined = exact.join(approx, ["query_id", "neighbor_id"])
    per_join = joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum(F.abs(F.col("rank_e") - F.col("rank_a"))).alias("displacement"),
        F.sum(
            F.when(F.col("rank_e") == 1, F.expr("1000000 div rank_a")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("rr_ppm"),
    )
    per_q = (
        qs.select(F.col("vec_id").alias("query_id"))
        .join(per_join, "query_id", "left")
        .select(
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            F.coalesce("displacement", F.lit(0)).alias("displacement"),
            F.coalesce("rr_ppm", F.lit(0)).alias("rr_ppm"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("n_common").cast("long").alias("sum_overlap"),
        F.sum("displacement").cast("long").alias("sum_displacement"),
        F.sum("rr_ppm").cast("long").alias("sum_rr_ppm"),
    )
