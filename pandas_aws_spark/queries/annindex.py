"""Persisted ANN (IVF-PQ) index lifecycle entry — the build-once /
search-many / append-without-retrain deployment story, exercised end to
end against real parquet and fully oracle-replayed.

The r8 measurement (SCALE.md: IVF-PQ build dominates search 21-54x) is
what justifies this artifact; this entry is its external correctness
proof: the index that is searched was written to disk, read back, and
incrementally appended — never held in memory across stages.

Oracle design: DuckDB replays the WHOLE lifecycle declaratively. PQ and
coarse quantizers train on the BASE subset only (``subs_tr``); ALL
vectors (base + both appended batches) are encoded/assigned with those
frozen quantizers — exactly ``append_ann_index``'s no-retrain contract.
Search 1 restricts ADC + re-rank to base rows (the on-disk index before
the appends); search 2 sees everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import sql_dot
from ..registry import load_table, query
from . import scratch_dir
from .similarity import (
    _IVFPQ_NPROBE,
    _NCENT,
    _PQ_ITERS,
    _PQ_K,
    _PQ_M,
    _PQ_D,
    _PQ_OVERSAMPLE,
    _PQ_SHORTLIST,
    _PQ_TOPK,
    _DIM,
    _pq_iteration_ctes,
    _sql_l2sq,
    sql_cosine,
)

# base corpus / two ingest batches: the same disjoint split the dedup
# index entry uses (base = 3/4 of vectors, each batch 1/8)
_BASE_PRED = "vec_id % 4 <> 0"
_B1_PRED = "vec_id % 8 = 0"
_B2_PRED = "vec_id % 8 = 4"

_ANN_INGEST_ORACLE = f"""
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
subs_tr AS (SELECT * FROM subs WHERE {_BASE_PRED}),
cb0 AS (
  SELECT sub, CAST(rn AS INT) AS centroid_id, subvec AS cvec
  FROM (SELECT sub, subvec,
               ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
        FROM subs_tr)
  WHERE rn <= {_PQ_K}
),
{_pq_iteration_ctes(1, "subs_tr").strip()},
{_pq_iteration_ctes(2, "subs_tr").strip()},
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
  FROM e WHERE {_BASE_PRED} ORDER BY vec_id LIMIT {_NCENT}
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
  SELECT srch.search, l.query_id, c.vec_id AS neighbor_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(l.dist ORDER BY l.sub)),
                     (a, b) -> a + b) AS adc
  FROM (SELECT 1 AS search UNION ALL SELECT 2) srch
  JOIN codes c ON (srch.search = 2 OR (c.{_BASE_PRED}))
  JOIN cells ce ON ce.vec_id = c.vec_id
  JOIN lut l ON l.sub = c.sub AND l.code = c.code
  JOIN qprobes p ON p.query_id = l.query_id AND p.cell = ce.cell
  WHERE c.vec_id <> l.query_id
  GROUP BY srch.search, l.query_id, c.vec_id
),
short AS (
  SELECT search, query_id, neighbor_id FROM (
    SELECT search, query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY search, query_id
                              ORDER BY adc, neighbor_id) AS rn
    FROM adc)
  WHERE rn <= {_PQ_SHORTLIST}
),
rerank AS (
  SELECT s.search, s.query_id, s.neighbor_id, {_sql_l2sq("qe.v", "ne.v", _DIM)} AS l2
  FROM short s
  JOIN e ne ON ne.vec_id = s.neighbor_id
  JOIN e qe ON qe.vec_id = s.query_id
)
SELECT search, query_id, neighbor_id, CAST(rn AS INT) AS rank,
       CAST(FLOOR(l2 * 1000000) AS BIGINT) AS l2sq_fp
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY search, query_id
                                   ORDER BY l2, neighbor_id) AS rn
      FROM rerank)
WHERE rn <= {_PQ_TOPK}
ORDER BY search, query_id, rank
"""


@query(
    "q_sim_index_ingest",
    oracle=_ANN_INGEST_ORACLE,
    # headline since r10 (r9 verdict ask #5): the persisted-index
    # lifecycle is the most load-bearing r7-r9 surface and the bench's
    # round-over-round drift tracking must cover it. NOTE: this breaks
    # the headline_total series at r10 — protocol note in SCALE.md.
    headline=True,
    tags=("similarity", "pq", "ivf", "incremental"),
)
def q_sim_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-ANN-index lifecycle, end to end on real parquet:
    ``build_ann_index`` over the base corpus (vec_id % 4 != 0, PQ +
    coarse quantizers trained on base ONLY) -> ``write_ann_index`` ->
    search 1 against the index READ BACK from disk ->
    ``append_ann_index`` two batches (% 8 == 0 and % 8 == 4; assigned
    to the frozen cells, encoded with the frozen codebook — NO
    retraining, the O(batch) ingest contract) -> re-read -> search 2,
    whose candidates span base and both appended batches. The search
    plan touches ONLY index files — centroids/codebook broadcast from
    kilobyte parquet, ADC over the stored codes, exact re-rank against
    the stored normalized vectors; the source ``embeddings`` table
    appears nowhere in either search (asserted on the physical plan in
    tests/test_annindex.py). Search 1's result is pinned via
    localCheckpoint BEFORE the appends (stored frames are lazy scans).

    Reference analogue: none — the reference persists no reusable
    artifacts; this is the ANN twin of ``q_dedup_index_ingest``,
    motivated by the r8 build/search economics measurement."""
    from ..operators.annindex import (
        append_ann_index,
        build_ann_index,
        read_ann_index,
        write_ann_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr(_BASE_PRED))
    b1 = emb.filter(F.expr(_B1_PRED))
    b2 = emb.filter(F.expr(_B2_PRED))
    qdf = emb.filter(F.col("vec_id") < 3)
    path = scratch_dir(prefix="pandas_aws_spark_ann_index_")
    write_ann_index(
        build_ann_index(
            base, n_centroids=_NCENT, m=_PQ_M, k_codes=_PQ_K, iters=_PQ_ITERS
        ),
        path,
    )
    from ..operators.annindex import ann_index_topk

    stored = read_ann_index(spark, path)
    s1 = (
        ann_index_topk(
            qdf, stored, nprobe=_IVFPQ_NPROBE, k=_PQ_TOPK, oversample=_PQ_OVERSAMPLE
        )
        .withColumn("search", F.lit(1))
        .localCheckpoint()
    )
    append_ann_index(b1, path, batch_id="b1")
    append_ann_index(b2, path, batch_id="b2")
    stored2 = read_ann_index(spark, path)
    s2 = ann_index_topk(
        qdf, stored2, nprobe=_IVFPQ_NPROBE, k=_PQ_TOPK, oversample=_PQ_OVERSAMPLE
    ).withColumn("search", F.lit(2))
    return (
        s1.unionByName(s2)
        .select("search", "query_id", "neighbor_id", "rank", "l2sq_fp")
        .orderBy("search", "query_id", "rank")
    )


# --------------------------------------------------------------------------
# Snapshot (time-travel) reads: a retained generation serves the index
# frozen at its last state while the current view moves on. Oracle =
# the ingest replay with search 1's membership widened to base + b1
# (the snapshot generation's final contents).
# --------------------------------------------------------------------------
_ANN_SNAPSHOT_ORACLE = _ANN_INGEST_ORACLE.replace(
    f"JOIN codes c ON (srch.search = 2 OR (c.{_BASE_PRED}))",
    f"JOIN codes c ON (srch.search = 2 OR (c.{_BASE_PRED}) OR (c.{_B1_PRED}))",
)
assert _ANN_SNAPSHOT_ORACLE != _ANN_INGEST_ORACLE  # replace must land


@query(
    "q_sim_index_snapshot",
    oracle=_ANN_SNAPSHOT_ORACLE,
    tags=("similarity", "pq", "ivf", "snapshot"),
)
def q_sim_index_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-read (time-travel) lifecycle on the generation store
    (r12): build over base (gen 1, quantizers trained there and
    frozen) -> append b1 into gen 1 -> ``compact_ann_index(
    retain_generations=2)`` (gen 2 — physically folded, gen 1 kept as
    readable history) -> append b2 into gen 2. Search 1 then runs
    against ``read_ann_index(generation=1)`` — the index AS OF gen 1's
    last state (base + b1, no b2; the snapshot is immune to everything
    that landed after its generation committed) — and search 2 against
    the current view (all three slices). Both searches must replay the
    same frozen-quantizer SQL as the ingest entry, differing only in
    candidate membership: time travel changes WHICH rows exist, never
    the math. This is the Delta/Iceberg snapshot capability expressed
    on the repo's own commit protocol (genstore.snapshot_root)."""
    from ..operators.annindex import (
        ann_index_topk,
        append_ann_index,
        build_ann_index,
        compact_ann_index,
        read_ann_index,
        write_ann_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr(_BASE_PRED))
    b1 = emb.filter(F.expr(_B1_PRED))
    b2 = emb.filter(F.expr(_B2_PRED))
    qdf = emb.filter(F.col("vec_id") < 3)
    path = scratch_dir(prefix="pandas_aws_spark_ann_snapshot_")
    write_ann_index(
        build_ann_index(
            base, n_centroids=_NCENT, m=_PQ_M, k_codes=_PQ_K, iters=_PQ_ITERS
        ),
        path,
    )
    append_ann_index(b1, path, batch_id="b1")
    compact_ann_index(spark, path, retain_generations=2)
    append_ann_index(b2, path, batch_id="b2")

    snap = read_ann_index(spark, path, generation=1)
    s1 = ann_index_topk(
        qdf, snap, nprobe=_IVFPQ_NPROBE, k=_PQ_TOPK, oversample=_PQ_OVERSAMPLE
    ).withColumn("search", F.lit(1))
    cur = read_ann_index(spark, path)
    s2 = ann_index_topk(
        qdf, cur, nprobe=_IVFPQ_NPROBE, k=_PQ_TOPK, oversample=_PQ_OVERSAMPLE
    ).withColumn("search", F.lit(2))
    return (
        s1.unionByName(s2)
        .select("search", "query_id", "neighbor_id", "rank", "l2sq_fp")
        .orderBy("search", "query_id", "rank")
    )


# --------------------------------------------------------------------------
# Filtered ANN search: top-k among ONLY the rows matching a metadata
# predicate ("nearest label-3 neighbors") — the production shape for
# per-language / per-source / per-license retrieval. The predicate is
# applied to the stored codes BEFORE the ADC stage, so it reaches the
# parquet scan as a PushedFilter (tests assert the plan) and top-k is
# exact over the filtered set within the probed cells; filtering after
# the shortlist would silently under-fill k and lose recall.
# --------------------------------------------------------------------------
_FILTER_LABEL = 3

_ANN_FILTERED_ORACLE = f"""
WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
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
  JOIN e0 lab ON lab.vec_id = c.vec_id AND lab.label = {_FILTER_LABEL}
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
    "q_sim_index_filtered",
    oracle=_ANN_FILTERED_ORACLE,
    tags=("similarity", "pq", "ivf", "filtered"),
)
def q_sim_index_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN against a stored index: top-10 neighbors among ONLY
    label-3 vectors. The index stores ``label`` as a payload column in
    both the codes and vectors frames (``build_ann_index(payload_cols=
    ("label",))``), and ``ann_index_topk(where="label = 3")`` applies
    the predicate BEFORE the ADC stage — it reaches the codes parquet
    scan as a PushedFilter (plan-asserted in tests/test_annindex.py),
    so candidate pruning happens at the scan, and top-k is exact over
    the filtered set within the probed cells. Filtering after the
    shortlist instead would under-fill k whenever the shortlist is
    dominated by non-matching rows — the classic filtered-ANN recall
    trap."""
    from ..operators.annindex import (
        ann_index_topk,
        build_ann_index,
        read_ann_index,
        write_ann_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 3)
    path = scratch_dir(prefix="pandas_aws_spark_ann_filtered_")
    write_ann_index(
        build_ann_index(
            emb,
            n_centroids=_NCENT,
            m=_PQ_M,
            k_codes=_PQ_K,
            iters=_PQ_ITERS,
            payload_cols=("label",),
        ),
        path,
    )
    stored = read_ann_index(spark, path)
    return ann_index_topk(
        qdf,
        stored,
        nprobe=_IVFPQ_NPROBE,
        k=_PQ_TOPK,
        oversample=_PQ_OVERSAMPLE,
        where=f"label = {_FILTER_LABEL}",
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# Streaming vector ingest: new embedding batches arrive as a file
# stream and foreachBatch appends each micro-batch into the STORED
# index (frozen quantizers, per-batch subdirs) — the crawl-to-index
# pipeline shape. The final search is deterministic even though
# micro-batch BOUNDARIES are not: appends assign/encode each row
# independently against the frozen quantizers, so the union of batch
# subdirs is the same index whatever the file-to-trigger split, and
# batch ids derive from the checkpointed micro-batch id so a replayed
# batch overwrites itself (at-least-once foreachBatch -> exactly-once
# index effect, the same recipe as q_stream_upsert_foreachbatch).
# --------------------------------------------------------------------------
_STREAM_BASE_PRED = "vec_id % 2 = 0"

_ANN_STREAM_ORACLE = f"""
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
subs_tr AS (SELECT * FROM subs WHERE {_STREAM_BASE_PRED}),
cb0 AS (
  SELECT sub, CAST(rn AS INT) AS centroid_id, subvec AS cvec
  FROM (SELECT sub, subvec,
               ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
        FROM subs_tr)
  WHERE rn <= {_PQ_K}
),
{_pq_iteration_ctes(1, "subs_tr").strip()},
{_pq_iteration_ctes(2, "subs_tr").strip()},
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
  FROM e WHERE {_STREAM_BASE_PRED} ORDER BY vec_id LIMIT {_NCENT}
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


@query(
    "q_stream_ann_ingest",
    oracle=_ANN_STREAM_ORACLE,
    tags=("streaming", "similarity", "pq", "ivf", "incremental"),
)
def q_stream_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming vector ingest into the persisted ANN index — the
    crawl-to-index pipeline: the base index is built over half the
    corpus (vec_id % 2 = 0, quantizers trained there and FROZEN), the
    other half lands as a parquet file stream (4 landing files, 2 per
    trigger -> 2 micro-batches), and ``foreachBatch`` appends each
    micro-batch via ``append_ann_index`` with ``batch_id=s<micro-batch
    id>`` — at-least-once foreachBatch replays overwrite their own
    batch subdirs, so the index effect is exactly-once. The final
    search (over the re-read index) is deterministic although the
    micro-batch BOUNDARIES are not: each row's cell/codes depend only
    on the frozen quantizers, never on which batch carried it, so the
    union of batch subdirs is one fixed index. Oracle replays
    train-on-base + encode-everything + search in SQL."""
    import shutil

    from ..operators.annindex import (
        ann_index_topk,
        build_ann_index,
        read_ann_index,
        write_ann_index,
    )
    from ..streaming.pipeline import stream_ann_ingest

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.expr(_STREAM_BASE_PRED))
    rest = emb.filter(~F.expr(_STREAM_BASE_PRED))
    qdf = emb.filter(F.col("vec_id") < 3)
    work = scratch_dir(prefix="pandas_aws_spark_ann_stream_")
    path, landing, ckpt = f"{work}/idx", f"{work}/landing", f"{work}/ckpt"
    write_ann_index(
        build_ann_index(
            base, n_centroids=_NCENT, m=_PQ_M, k_codes=_PQ_K, iters=_PQ_ITERS
        ),
        path,
    )
    rest.repartition(4).write.mode("overwrite").parquet(landing)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(landing)
    )
    stream_ann_ingest(stream, path, ckpt)

    stored = read_ann_index(spark, path)
    out = (
        ann_index_topk(
            qdf, stored, nprobe=_IVFPQ_NPROBE, k=_PQ_TOPK, oversample=_PQ_OVERSAMPLE
        )
        .orderBy("query_id", "rank")
        .localCheckpoint(eager=True)  # detach from the temp dir before cleanup
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# Deletion lifecycle: tombstone batches make removals O(ids) and take
# effect at the next read (anti-join of a broadcast id set); compaction
# rewrites live rows only and retires the tombstones (physical delete).
# Phases: 1 = pre-delete, 2 = logically deleted, 3 = after compaction
# (2 and 3 must be identical — the oracle says so by construction, the
# entry proves the engine agrees).
# --------------------------------------------------------------------------
_DELETE_PRED = "vec_id % 10 = 7"

_ANN_DELETE_ORACLE = f"""
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
  SELECT ph.phase, l.query_id, c.vec_id AS neighbor_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(l.dist ORDER BY l.sub)),
                     (a, b) -> a + b) AS adc
  FROM (SELECT 1 AS phase UNION ALL SELECT 2 UNION ALL SELECT 3) ph
  JOIN codes c ON (ph.phase = 1 OR NOT (c.{_DELETE_PRED}))
  JOIN cells ce ON ce.vec_id = c.vec_id
  JOIN lut l ON l.sub = c.sub AND l.code = c.code
  JOIN qprobes p ON p.query_id = l.query_id AND p.cell = ce.cell
  WHERE c.vec_id <> l.query_id
  GROUP BY ph.phase, l.query_id, c.vec_id
),
short AS (
  SELECT phase, query_id, neighbor_id FROM (
    SELECT phase, query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY phase, query_id
                              ORDER BY adc, neighbor_id) AS rn
    FROM adc)
  WHERE rn <= {_PQ_SHORTLIST}
),
rerank AS (
  SELECT s.phase, s.query_id, s.neighbor_id, {_sql_l2sq("qe.v", "ne.v", _DIM)} AS l2
  FROM short s
  JOIN e ne ON ne.vec_id = s.neighbor_id
  JOIN e qe ON qe.vec_id = s.query_id
)
SELECT phase, query_id, neighbor_id, CAST(rn AS INT) AS rank,
       CAST(FLOOR(l2 * 1000000) AS BIGINT) AS l2sq_fp
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY phase, query_id
                                   ORDER BY l2, neighbor_id) AS rn
      FROM rerank)
WHERE rn <= {_PQ_TOPK}
ORDER BY phase, query_id, rank
"""


@query(
    "q_sim_index_delete",
    oracle=_ANN_DELETE_ORACLE,
    tags=("similarity", "pq", "ivf", "delete"),
)
def q_sim_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion lifecycle of the persisted ANN index — the takedown /
    GDPR / post-dedup-drop story: search the stored index (phase 1),
    ``delete_from_ann_index`` the vec_id % 10 = 7 cohort as a
    TOMBSTONE batch (O(ids) — no data-file rewrite, the
    deletion-vector shape Delta/Iceberg/Lucene use), search again
    (phase 2 — reads anti-join the broadcast tombstone set, deleted
    ids gone), then ``compact_ann_index`` (rewrites live rows only,
    retires the tombstones) and search once more (phase 3 — must equal
    phase 2, now physically). Phase-1 results are pinned via
    localCheckpoint before the mutations; the oracle states the
    2 == 3 equality by construction and the driver's hash check proves
    the engine agrees."""
    from ..operators.annindex import (
        ann_index_topk,
        build_ann_index,
        compact_ann_index,
        delete_from_ann_index,
        read_ann_index,
        write_ann_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 3)
    path = scratch_dir(prefix="pandas_aws_spark_ann_delete_")
    write_ann_index(
        build_ann_index(
            emb, n_centroids=_NCENT, m=_PQ_M, k_codes=_PQ_K, iters=_PQ_ITERS
        ),
        path,
    )

    def search(phase: int) -> DataFrame:
        return (
            ann_index_topk(
                qdf,
                read_ann_index(spark, path),
                nprobe=_IVFPQ_NPROBE,
                k=_PQ_TOPK,
                oversample=_PQ_OVERSAMPLE,
            )
            .withColumn("phase", F.lit(phase))
            .localCheckpoint()
        )

    p1 = search(1)
    delete_from_ann_index(emb.filter(F.expr(_DELETE_PRED)), path, batch_id="takedown1")
    p2 = search(2)
    compact_ann_index(spark, path)
    p3 = search(3)
    return (
        p1.unionByName(p2)
        .unionByName(p3)
        .select("phase", "query_id", "neighbor_id", "rank", "l2sq_fp")
        .orderBy("phase", "query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Drift-signal components (r10): the quantizer_staleness math, externally
# verified. The signal's floats (coherence averages, occupancy TV) are
# driver-side divisions of these EXACT integer components, so hashing the
# components verifies the math without cross-engine float-aggregation risk:
#  * per-row cosine is fixed-pointed BEFORE summation (integer sums are
#    order-independent — the same reason the ANN entries ship l2sq_fp);
#  * occupancy TV is reported as the exact integer cross term
#    sum_c |cnt_base[c] * n_batch - cnt_batch[c] * n_base|, i.e.
#    TV = tv_cross / (2 * n_base * n_batch) without any division.
_DRIFT_SHIFT = 0.5  # alternating-sign per-dim shift of the probe batch

_DRIFT_ORACLE = f"""
WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
e AS (
  SELECT vec_id,
         CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm)
              ELSE list_transform(v, x -> x * 0.0) END AS v
  FROM (SELECT vec_id, v, SQRT({sql_dot("v", "v")}) AS nrm FROM e0)
),
base AS (SELECT * FROM e WHERE {_BASE_PRED}),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS centroid_id, v AS cv
  FROM base ORDER BY vec_id LIMIT {_NCENT}
),
-- drifted probe batch: shift the RAW embedding (before normalization),
-- exactly as the Spark side does; DuckDB lambda index i is 1-based where
-- Spark's transform index is 0-based, hence (i-1)
q0 AS (
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        (x, i) -> x + CASE WHEN (i-1) % 2 = 0
                                           THEN {_DRIFT_SHIFT}
                                           ELSE -{_DRIFT_SHIFT} END) AS v
  FROM embeddings WHERE {_B1_PRED}
),
q AS (
  SELECT vec_id,
         CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm)
              ELSE list_transform(v, x -> x * 0.0) END AS v
  FROM (SELECT vec_id, v, SQRT({sql_dot("v", "v")}) AS nrm FROM q0)
),
bassign AS (
  SELECT vec_id, cell, cos FROM (
    SELECT b.vec_id, ct.centroid_id AS cell,
           {sql_cosine('b.v', 'ct.cv')} AS cos,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
                              ORDER BY {sql_cosine('b.v', 'ct.cv')} DESC,
                                       ct.centroid_id) AS rn
    FROM base b, cent ct)
  WHERE rn = 1
),
qassign AS (
  SELECT vec_id, cell, cos FROM (
    SELECT qq.vec_id, ct.centroid_id AS cell,
           {sql_cosine('qq.v', 'ct.cv')} AS cos,
           ROW_NUMBER() OVER (PARTITION BY qq.vec_id
                              ORDER BY {sql_cosine('qq.v', 'ct.cv')} DESC,
                                       ct.centroid_id) AS rn
    FROM q qq, cent ct)
  WHERE rn = 1
),
occ AS (
  SELECT COALESCE(b.cell, qc.cell) AS cell,
         COALESCE(b.cnt, 0) AS cb, COALESCE(qc.cnt, 0) AS cq
  FROM (SELECT cell, COUNT(*) AS cnt FROM bassign GROUP BY cell) b
  FULL OUTER JOIN
       (SELECT cell, COUNT(*) AS cnt FROM qassign GROUP BY cell) qc
  ON b.cell = qc.cell
),
tot AS (SELECT (SELECT COUNT(*) FROM bassign) AS nb,
               (SELECT COUNT(*) FROM qassign) AS nq)
SELECT 'base_coh_fp_sum' AS metric,
       CAST(SUM(CAST(FLOOR(cos * 1000000) AS BIGINT)) AS BIGINT) AS value
FROM bassign
UNION ALL
SELECT 'base_rows', CAST(COUNT(*) AS BIGINT) FROM bassign
UNION ALL
SELECT 'batch_coh_fp_sum',
       CAST(SUM(CAST(FLOOR(cos * 1000000) AS BIGINT)) AS BIGINT) FROM qassign
UNION ALL
SELECT 'batch_rows', CAST(COUNT(*) AS BIGINT) FROM qassign
UNION ALL
SELECT 'tv_cross', CAST(SUM(ABS(cb * tot.nq - cq * tot.nb)) AS BIGINT)
FROM occ, tot
ORDER BY metric
"""


@query(
    "q_sim_index_drift_signal",
    oracle=_DRIFT_ORACLE,
    tags=("similarity", "ivf", "drift"),
)
def q_sim_index_drift_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-quantizer drift signal (r10), externally verified at the
    component level: build+write the index on the base corpus, read it
    back, then — against the STORED quantizer, the exact code path
    ``quantizer_staleness`` runs — assign (a) the index's own vectors
    and (b) a deliberately drifted probe batch (alternating-sign 0.5
    per-dim shift of the % 8 == 0 slice, re-id'd), and emit the
    signal's exact integer components: per-row fixed-point coherence
    sums, row counts, and the occupancy cross term
    ``sum_c |cnt_base[c]*n_batch - cnt_batch[c]*n_base|`` (TV without
    the division). DuckDB replays normalization, first-k coarse
    centroids, cosine argmax assignment and the same fixed-pointing
    independently. Why integers: cross-row float aggregation is not
    bit-portable across engines; the shipped signal's floats are
    driver-side divisions of exactly these components (see
    tools/measure_quantizer_drift.py + SCALE.md r10 for the measured
    recall calibration and the occ-TV >= +0.25-over-control trigger).

    Reference analogue: none — north-star extension (SURVEY §2.9)."""
    from ..functions.vector import as_double, cosine
    from ..operators.annindex import build_ann_index, read_ann_index, write_ann_index
    from ..operators.pq import l2_normalize
    from ..operators.similarity import ivf_assign

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr(_BASE_PRED))
    path = scratch_dir(prefix="pandas_aws_spark_ann_drift_")
    write_ann_index(
        build_ann_index(
            base, n_centroids=_NCENT, m=_PQ_M, k_codes=_PQ_K, iters=_PQ_ITERS
        ),
        path,
    )
    idx = read_ann_index(spark, path)
    cents = idx.centroids.select(
        F.col("centroid_id").alias("cell"), as_double("embedding").alias("cvec")
    )

    def cos_rows(assigned: DataFrame) -> DataFrame:
        return assigned.join(F.broadcast(cents), "cell").select(
            "cell",
            F.floor(cosine(as_double("embedding"), F.col("cvec")) * F.lit(1e6))
            .cast("long")
            .alias("cos_fp"),
        )

    shift = F.lit(_DRIFT_SHIFT)
    drifted = emb.filter(F.expr(_B1_PRED)).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            as_double("embedding"),
            lambda x, i: x + F.when(i % 2 == 0, shift).otherwise(-shift),
        ).alias("embedding"),
    )
    qassigned = ivf_assign(l2_normalize(drifted), idx.centroids)
    bcos = cos_rows(idx.vectors)
    qcos = cos_rows(qassigned.select("vec_id", "embedding", "cell"))

    def metric(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("metric"), F.col("value"))

    occ_b = bcos.groupBy("cell").agg(F.count("*").alias("cb"))
    occ_q = qcos.groupBy("cell").agg(F.count("*").alias("cq"))
    totals = (
        bcos.agg(F.count("*").alias("nb"))
        .crossJoin(qcos.agg(F.count("*").alias("nq")))
    )
    tv = (
        occ_b.join(occ_q, "cell", "full_outer")
        .na.fill(0, ["cb", "cq"])
        .crossJoin(F.broadcast(totals))
        .agg(
            F.sum(F.abs(F.col("cb") * F.col("nq") - F.col("cq") * F.col("nb"))).alias(
                "value"
            )
        )
    )
    out = (
        metric("base_coh_fp_sum", bcos.agg(F.sum("cos_fp").alias("value")))
        .unionByName(metric("base_rows", bcos.agg(F.count("*").alias("value"))))
        .unionByName(metric("batch_coh_fp_sum", qcos.agg(F.sum("cos_fp").alias("value"))))
        .unionByName(metric("batch_rows", qcos.agg(F.count("*").alias("value"))))
        .unionByName(metric("tv_cross", tv))
    )
    return out.select("metric", F.col("value").cast("long").alias("value")).orderBy(
        "metric"
    )


# ---------------------------------------------------------------------------
# Rebuild (retrain) lifecycle (r10): what the drift trigger fires. The
# oracle's key subtlety: rebuild trains/stores over the index's STORED
# vectors, which are already unit-norm — build_ann_index normalizes them
# AGAIN, and normalize(normalize(v)) is NOT bit-identical to
# normalize(v) (the unit vector's recomputed norm is 1 +- ulps and the
# division moves last bits). The replay therefore applies the
# normalization CTE twice for everything the rebuilt index stores,
# while the query side normalizes raw vectors ONCE (ivf_pq_topk's
# query path) — re-rank distances cross the two.
_ANN_REBUILD_ORACLE = f"""
WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
e AS (
  SELECT vec_id,
         CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm)
              ELSE list_transform(v, x -> x * 0.0) END AS v
  FROM (SELECT vec_id, v, SQRT({sql_dot("v", "v")}) AS nrm FROM e0)
),
e2 AS (
  SELECT vec_id,
         CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm)
              ELSE list_transform(v, x -> x * 0.0) END AS v
  FROM (SELECT vec_id, v, SQRT({sql_dot("v", "v")}) AS nrm FROM e)
),
subs AS (
  SELECT e2.vec_id, s.sub,
         list_slice(e2.v, s.sub * {_PQ_D} + 1, s.sub * {_PQ_D} + {_PQ_D}) AS subvec
  FROM e2, (SELECT unnest(range(0, {_PQ_M})) AS sub) s
),
cb0 AS (
  SELECT sub, CAST(rn AS INT) AS centroid_id, subvec AS cvec
  FROM (SELECT sub, subvec,
               ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
        FROM subs)
  WHERE rn <= {_PQ_K}
),
{_pq_iteration_ctes(1, "subs").strip()},
{_pq_iteration_ctes(2, "subs").strip()},
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
  FROM e2 ORDER BY vec_id LIMIT {_NCENT}
),
cells AS (
  SELECT vec_id, cell FROM (
    SELECT e2.vec_id, ct.centroid_id AS cell,
           ROW_NUMBER() OVER (PARTITION BY e2.vec_id
                              ORDER BY {sql_cosine('e2.v', 'ct.cv')} DESC,
                                       ct.centroid_id) AS rn
    FROM e2, cent ct)
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
-- query-side LUT subvectors come from the ONCE-normalized query path
qsubs AS (
  SELECT e.vec_id, s.sub,
         list_slice(e.v, s.sub * {_PQ_D} + 1, s.sub * {_PQ_D} + {_PQ_D}) AS subvec
  FROM e, (SELECT unnest(range(0, {_PQ_M})) AS sub) s
  WHERE e.vec_id < 3
),
lut AS (
  SELECT s.vec_id AS query_id, s.sub, cb.centroid_id AS code,
         {_sql_l2sq("s.subvec", "cb.cvec", _PQ_D)} AS dist
  FROM qsubs s JOIN cb{_PQ_ITERS} cb ON cb.sub = s.sub
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
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adc, neighbor_id) AS rn
    FROM adc)
  WHERE rn <= {_PQ_SHORTLIST}
),
rerank AS (
  SELECT s.query_id, s.neighbor_id, {_sql_l2sq("qe.v", "ne.v", _DIM)} AS l2
  FROM short s
  JOIN e2 ne ON ne.vec_id = s.neighbor_id
  JOIN e qe ON qe.vec_id = s.query_id
)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank,
       CAST(FLOOR(l2 * 1000000) AS BIGINT) AS l2sq_fp
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY l2, neighbor_id) AS rn
      FROM rerank)
WHERE rn <= {_PQ_TOPK}
ORDER BY query_id, rank
"""


@query(
    "q_sim_index_rebuild",
    oracle=_ANN_REBUILD_ORACLE,
    tags=("similarity", "pq", "ivf", "rebuild"),
)
def q_sim_index_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebuild (retrain) lifecycle against real parquet — the action
    the r10 drift trigger fires: build+write on the base corpus ->
    ``append_ann_index`` both batches (frozen quantizers) ->
    ``rebuild_ann_index`` (retrain coarse + PQ on ALL live vectors
    under the stored recipe, committed as a new generation — the
    crash-safe full-price counterpart of the O(batch) append) ->
    search the rebuilt index read back from disk. The oracle replays
    quantizer training over the FULL corpus (vs the ingest entry's
    base-only training — the two entries differ exactly where
    append's no-retrain contract and rebuild's retrain differ) and
    reproduces the stored side's double normalization bit for bit
    (docstring above).

    Reference analogue: none — north-star extension (SURVEY §2.9)."""
    from ..operators.annindex import (
        ann_index_topk,
        append_ann_index,
        build_ann_index,
        read_ann_index,
        rebuild_ann_index,
        write_ann_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr(_BASE_PRED))
    b1 = emb.filter(F.expr(_B1_PRED))
    b2 = emb.filter(F.expr(_B2_PRED))
    qdf = emb.filter(F.col("vec_id") < 3)
    path = scratch_dir(prefix="pandas_aws_spark_ann_rebuild_")
    write_ann_index(
        build_ann_index(
            base, n_centroids=_NCENT, m=_PQ_M, k_codes=_PQ_K, iters=_PQ_ITERS
        ),
        path,
    )
    append_ann_index(b1, path, batch_id="b1")
    append_ann_index(b2, path, batch_id="b2")
    # n_centroids PINNED (r14 review finding): this entry's oracle
    # replays exactly _NCENT coarse centroids, so the rebuild must not
    # inherit the corpus-adaptive default (whose floor only shields it
    # while live rows <= _NCENT * DEFAULT_TARGET_CELL_ROWS — a silent
    # divergence at large SF). The adaptive default has its own
    # derivation-replaying entry: q_sim_index_rebuild_adaptive.
    rebuild_ann_index(spark, path, n_centroids=_NCENT)
    return (
        ann_index_topk(
            qdf,
            read_ann_index(spark, path),
            nprobe=_IVFPQ_NPROBE,
            k=_PQ_TOPK,
            oversample=_PQ_OVERSAMPLE,
        )
        .select("query_id", "neighbor_id", "rank", "l2sq_fp")
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# Payload-schema evolution (r13, the r12 verdict's ask #6): real crawls
# add metadata columns mid-stream. Batch 1 appends WITH a new payload
# column (src = vec_id % 5); batch 2 appends WITHOUT the original label
# column (the dropped direction). Filtered searches run across the
# mixed-schema batches with SQL null semantics: search 1 (post-b1,
# index = base + b1) filters `label = 3 OR src = 2` — base rows
# qualify by label only (src NULL), b1 rows by either; search 2
# (post-b2) filters `label IS NULL OR label = 3` — exactly the b2 rows
# (whose label reads back NULL) plus label-3 rows. The oracle rewrites
# the ingest replay's membership + filter per search; everything else
# (frozen-quantizer encode of appended rows included) is the proven
# ingest pipeline.
# --------------------------------------------------------------------------
_ANN_EVOLVED_ORACLE = _ANN_INGEST_ORACLE.replace(
    "WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),",
    "WITH e0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v"
    " FROM embeddings),",
).replace(
    f"JOIN codes c ON (srch.search = 2 OR (c.{_BASE_PRED}))",
    f"JOIN codes c ON (srch.search = 2 OR (c.{_BASE_PRED}) OR (c.{_B1_PRED}))\n"
    "  JOIN e0 lab ON lab.vec_id = c.vec_id AND (\n"
    f"    (srch.search = 1 AND (lab.label = {_FILTER_LABEL}\n"
    f"                          OR ((lab.{_B1_PRED}) AND lab.vec_id % 5 = 2)))\n"
    f"    OR (srch.search = 2 AND ((lab.{_B2_PRED})\n"
    f"                             OR lab.label = {_FILTER_LABEL})))",
)
assert _ANN_EVOLVED_ORACLE != _ANN_INGEST_ORACLE  # both replaces must land
assert "lab.label" in _ANN_EVOLVED_ORACLE


@query(
    "q_sim_index_evolved",
    oracle=_ANN_EVOLVED_ORACLE,
    tags=("similarity", "pq", "ivf", "filtered", "evolution"),
)
def q_sim_index_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN across EVOLVED payload schema, end to end on disk:
    base built with payload ``label``; batch 1 appended with
    ``payload_evolution=True`` carrying a NEW ``src`` column (older
    rows read back NULL); batch 2 appended WITHOUT ``label`` (its rows
    read back NULL — the dropped direction). Search 1 (post-b1)
    filters ``label = 3 OR src = 2``: base rows qualify by label only,
    b1 rows by either disjunct — NULL semantics exact. Search 2
    (post-b2) filters ``label IS NULL OR label = 3``: precisely b2's
    null-label rows plus every label-3 row. Both predicates reach the
    merged-schema codes scan before the ADC stage (the filtered-search
    contract); the oracle replays membership + filter per search over
    the frozen-quantizer ingest pipeline."""
    from ..operators.annindex import (
        ann_index_topk,
        append_ann_index,
        build_ann_index,
        read_ann_index,
        write_ann_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr(_BASE_PRED))
    b1 = emb.filter(F.expr(_B1_PRED)).withColumn(
        "src", (F.col("vec_id") % 5).cast("long")
    )
    b2 = emb.filter(F.expr(_B2_PRED)).drop("label")
    qdf = emb.filter(F.col("vec_id") < 3)
    path = scratch_dir(prefix="pandas_aws_spark_ann_evolved_")
    write_ann_index(
        build_ann_index(
            base,
            n_centroids=_NCENT,
            m=_PQ_M,
            k_codes=_PQ_K,
            iters=_PQ_ITERS,
            payload_cols=("label",),
        ),
        path,
    )
    append_ann_index(b1, path, batch_id="b1", payload_evolution=True)
    s1 = (
        ann_index_topk(
            qdf,
            read_ann_index(spark, path),
            nprobe=_IVFPQ_NPROBE,
            k=_PQ_TOPK,
            oversample=_PQ_OVERSAMPLE,
            where=f"label = {_FILTER_LABEL} OR src = 2",
        )
        .withColumn("search", F.lit(1))
        .localCheckpoint()
    )
    append_ann_index(b2, path, batch_id="b2", payload_evolution=True)
    s2 = ann_index_topk(
        qdf,
        read_ann_index(spark, path),
        nprobe=_IVFPQ_NPROBE,
        k=_PQ_TOPK,
        oversample=_PQ_OVERSAMPLE,
        where=f"label IS NULL OR label = {_FILTER_LABEL}",
    ).withColumn("search", F.lit(2))
    return (
        s1.unionByName(s2)
        .select("search", "query_id", "neighbor_id", "rank", "l2sq_fp")
        .orderBy("search", "query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Corpus-adaptive rebuild (r14, the r13 verdict's missing #4): the
# drift-triggered retrain derives its centroid count from the LIVE row
# count (target rows/cell — the constant-occupancy recipe SCALE.md r13
# measured as the flat-probe-cost path: 2.83 s at 10x corpus vs 6.07 s
# with the frozen count), floored at the stored recipe's count. The
# oracle replays the derivation as an exact integer scalar subquery
# (`sql_recommended_n_centroids`) inside the coarse-centroid CTE — the
# same corpus-derived-scalar pattern as `recommended_n_planes` /
# `recommended_max_band_bucket` — so the entry's hash pins BOTH the
# retrain and the sizing rule at every scale factor (ncent = 5 at
# sf0.01's 500 vectors, 20 at sf0.1's 2000).
# ---------------------------------------------------------------------------
_ADAPT_BASE_NCENT = 2   # deliberately under-celled base recipe
_ADAPT_TARGET = 100     # rows/cell target the rebuild restores

from ..operators.annindex import sql_recommended_n_centroids  # noqa: E402

_ANN_REBUILD_ADAPTIVE_ORACLE = _ANN_REBUILD_ORACLE.replace(
    f"""cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS centroid_id, v AS cv
  FROM e2 ORDER BY vec_id LIMIT {_NCENT}
),""",
    f"""cent AS (
  SELECT centroid_id, cv FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS centroid_id, v AS cv
    FROM e2)
  WHERE centroid_id <= GREATEST({_ADAPT_BASE_NCENT},
        {sql_recommended_n_centroids("embeddings", _ADAPT_TARGET)})
),""",
)
assert _ANN_REBUILD_ADAPTIVE_ORACLE != _ANN_REBUILD_ORACLE  # replace must land
assert "GREATEST(2," in _ANN_REBUILD_ADAPTIVE_ORACLE


@query(
    "q_sim_index_rebuild_adaptive",
    oracle=_ANN_REBUILD_ADAPTIVE_ORACLE,
    tags=("similarity", "pq", "ivf", "rebuild", "adaptive"),
)
def q_sim_index_rebuild_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-adaptive rebuild lifecycle: base index deliberately
    UNDER-celled (2 centroids), two appends land under the frozen
    quantizers, then ``rebuild_ann_index`` with a 100-rows/cell target
    derives ``max(2, recommended_n_centroids(live_rows, 100))``
    centroids — restoring cell occupancy as the corpus grows, the
    production recipe SCALE.md r13 measured as the flat-probe-cost
    path. The searched index therefore has a DIFFERENT (corpus-
    derived) cell structure at every scale factor, and the oracle
    replays the sizing rule as an exact integer scalar subquery plus
    the full retrain.

    Reference analogue: none — north-star extension (SURVEY §2.9)."""
    from ..operators.annindex import (
        ann_index_topk,
        append_ann_index,
        build_ann_index,
        read_ann_index,
        rebuild_ann_index,
        write_ann_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr(_BASE_PRED))
    b1 = emb.filter(F.expr(_B1_PRED))
    b2 = emb.filter(F.expr(_B2_PRED))
    qdf = emb.filter(F.col("vec_id") < 3)
    path = scratch_dir(prefix="pandas_aws_spark_ann_rebuild_adaptive_")
    write_ann_index(
        build_ann_index(
            base,
            n_centroids=_ADAPT_BASE_NCENT,
            m=_PQ_M,
            k_codes=_PQ_K,
            iters=_PQ_ITERS,
        ),
        path,
    )
    append_ann_index(b1, path, batch_id="b1")
    append_ann_index(b2, path, batch_id="b2")
    rebuild_ann_index(spark, path, target_cell_rows=_ADAPT_TARGET)
    return (
        ann_index_topk(
            qdf,
            read_ann_index(spark, path),
            nprobe=_IVFPQ_NPROBE,
            k=_PQ_TOPK,
            oversample=_PQ_OVERSAMPLE,
        )
        .select("query_id", "neighbor_id", "rank", "l2sq_fp")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Corpus-adaptive BUILD (r15, the r14 verdict's ask #3): rebuild got the
# constant-occupancy sizing in r14, but a FRESH index built with defaults
# still got a fixed 8 cells — a 100 TB corpus built that way pays
# full-corpus-scale probes until the first drift rebuild. build_ann_index
# with n_centroids=None now derives recommended_n_centroids(corpus_count,
# target_cell_rows) itself; this entry pins the derivation end to end on
# disk: the index searched below was built WITHOUT an explicit centroid
# count, and the oracle replays the sizing rule as the same exact integer
# scalar subquery over the base subset (no floor here — unlike the rebuild
# there is no stored recipe to respect).
# ---------------------------------------------------------------------------
_ANN_BUILD_ADAPTIVE_ORACLE = (
    _ANN_INGEST_ORACLE.replace(
        f"""cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS centroid_id, v AS cv
  FROM e WHERE {_BASE_PRED} ORDER BY vec_id LIMIT {_NCENT}
),""",
        f"""cent AS (
  SELECT centroid_id, cv FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS centroid_id, v AS cv
    FROM e WHERE {_BASE_PRED})
  WHERE centroid_id <=
        {sql_recommended_n_centroids("embeddings", _ADAPT_TARGET, where=_BASE_PRED)}
),""",
    )
    .replace(
        "SELECT search, query_id, neighbor_id, CAST(rn AS INT) AS rank,",
        "SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank,",
    )
    .replace(
        "WHERE rn <= {topk}\nORDER BY search, query_id, rank".format(topk=_PQ_TOPK),
        "WHERE rn <= {topk} AND search = 1\nORDER BY query_id, rank".format(
            topk=_PQ_TOPK
        ),
    )
)
assert _ANN_BUILD_ADAPTIVE_ORACLE != _ANN_INGEST_ORACLE  # all replaces must land
assert "AND search = 1" in _ANN_BUILD_ADAPTIVE_ORACLE
assert _ANN_BUILD_ADAPTIVE_ORACLE.count("GREATEST(1,") >= 1


@query(
    "q_sim_index_build_adaptive",
    oracle=_ANN_BUILD_ADAPTIVE_ORACLE,
    tags=("similarity", "pq", "ivf", "build", "adaptive"),
)
def q_sim_index_build_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default-build sizing, end to end on disk: the base corpus is
    indexed with ``build_ann_index(n_centroids=None)`` (the new r15
    default) and a 100-rows/cell target, so the centroid count is
    ``recommended_n_centroids(base_rows, 100)`` — derived from the
    corpus, not a hardcoded 8 — then written, read back, and searched.
    The oracle replays the derivation as an exact integer scalar
    subquery over the same base predicate, so the entry's hash pins the
    build-time sizing rule at every scale factor (the searched index
    has a different, corpus-derived cell structure at each SF). The
    ingest-oracle's search-1 shape (base rows only, quantizers trained
    on base) is exactly a fresh-build search, which is why the oracle
    derives from _ANN_INGEST_ORACLE rather than a new CTE stack.

    Reference analogue: none — north-star extension (SURVEY §2.9)."""
    from ..operators.annindex import (
        ann_index_topk,
        build_ann_index,
        read_ann_index,
        write_ann_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr(_BASE_PRED))
    qdf = emb.filter(F.col("vec_id") < 3)
    path = scratch_dir(prefix="pandas_aws_spark_ann_build_adaptive_")
    write_ann_index(
        build_ann_index(
            base,
            # no n_centroids: the operator derives it from base's count
            target_cell_rows=_ADAPT_TARGET,
            m=_PQ_M,
            k_codes=_PQ_K,
            iters=_PQ_ITERS,
        ),
        path,
    )
    return (
        ann_index_topk(
            qdf,
            read_ann_index(spark, path),
            nprobe=_IVFPQ_NPROBE,
            k=_PQ_TOPK,
            oversample=_PQ_OVERSAMPLE,
        )
        .select("query_id", "neighbor_id", "rank", "l2sq_fp")
        .orderBy("query_id", "rank")
    )
