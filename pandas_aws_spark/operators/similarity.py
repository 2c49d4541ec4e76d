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

from ..functions.vector import as_double, cosine

__all__ = ["brute_force_topk", "ivf_assign", "ivf_topk"]


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Returns (query_id, neighbor_id, rank, cos_sim); ties broken on
    neighbor id so ranks are deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim")
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
    the smallest centroid id). One broadcast join + per-vector argmax —
    no corpus shuffle. Returns corpus columns + ``cell``."""
    c = centroids.select(
        F.col(centroid_id).alias("_cid"), as_double(vec_col).alias("_cvec")
    )
    scored = (
        corpus.withColumn("_v", as_double(vec_col))
        .crossJoin(F.broadcast(c))
        .withColumn("_sim", cosine(F.col("_v"), F.col("_cvec")))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.col("_cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_v", "_cvec", "_sim", "_rn")
        .withColumnRenamed("_cid", "cell")
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
) -> DataFrame:
    """IVF-style ANN top-k.

    Index: centroids = first ``n_centroids`` corpus vectors by id
    (deterministic); corpus bucketed by nearest centroid. Search: each
    query probes its ``nprobe`` nearest cells and ranks only vectors in
    those cells. ``nprobe=n_centroids`` == exact brute force.
    """
    centroids = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("centroid_id"),
            F.col(vec_col),
        )
    )
    indexed = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)

    # query -> its nprobe nearest cells
    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    c = centroids.select(F.col("centroid_id"), as_double(vec_col).alias("cvec"))
    qc = q.crossJoin(F.broadcast(c)).withColumn("_sim", cosine(F.col("qv"), F.col("cvec")))
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.col("centroid_id"))
    probes = (
        qc.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", F.col("centroid_id").alias("cell"))
    )

    cand = indexed.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"), "cell"
    ).join(F.broadcast(probes), "cell")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
