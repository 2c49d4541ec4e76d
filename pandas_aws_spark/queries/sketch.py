"""Count-min sketch query: build the sketch over the documents token
stream, estimate the frequency of the overall top tokens, and report
estimate vs exact — the whole thing (including the sketch's collision
overestimates) replayed exactly by the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.texthash import tokens
from ..operators.sketch import cms_build, cms_estimate, sql_cms_bucket
from ..registry import load_table, query

_DEPTH = 4
_WIDTH = 256
_TOPN = 20

_CMS_ORACLE = f"""
WITH tok AS (
  SELECT UNNEST(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
),
entries AS (
  {" UNION ALL ".join(
    f"SELECT tok, {j} AS row, {sql_cms_bucket('tok', j, _WIDTH)} AS bucket FROM tok"
    for j in range(_DEPTH)
  )}
),
sketch AS (
  SELECT row, bucket, COUNT(*) AS cnt FROM entries GROUP BY row, bucket
),
exact AS (
  SELECT tok, COUNT(*) AS exact_cnt FROM tok GROUP BY tok
),
top_toks AS (
  SELECT tok, exact_cnt FROM exact ORDER BY exact_cnt DESC, tok LIMIT {_TOPN}
),
probe_entries AS (
  {" UNION ALL ".join(
    f"SELECT tok, {j} AS row, {sql_cms_bucket('tok', j, _WIDTH)} AS bucket FROM top_toks"
    for j in range(_DEPTH)
  )}
),
est AS (
  SELECT p.tok, MIN(COALESCE(s.cnt, 0)) AS est
  FROM probe_entries p LEFT JOIN sketch s ON s.row = p.row AND s.bucket = p.bucket
  GROUP BY p.tok
)
SELECT t.tok, t.exact_cnt, e.est, e.est - t.exact_cnt AS overestimate
FROM top_toks t JOIN est e ON e.tok = t.tok
ORDER BY t.exact_cnt DESC, t.tok
"""


@query("q_sketch_count_min", oracle=_CMS_ORACLE, tags=("sketch", "cms"))
def q_sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS heavy-hitter estimation: sketch shuffle is bounded at
    depth x width counters no matter the corpus size; estimates are
    overestimates by construction (asserted by the non-negative
    ``overestimate`` column the oracle reproduces bit-for-bit)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens("text")).alias("tok"))
    sketch = cms_build(tok, "tok", depth=_DEPTH, width=_WIDTH)
    exact = tok.groupBy("tok").agg(F.count("*").alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "tok").limit(_TOPN)
    est = cms_estimate(sketch, top.select("tok"), "tok", depth=_DEPTH, width=_WIDTH)
    return (
        top.join(est, "tok")
        .select(
            "tok",
            "exact_cnt",
            "est",
            (F.col("est") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), "tok")
    )


_HLL_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct,
       TRUE AS est_within_tol
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'ALL',
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
       TRUE
FROM lineitem
ORDER BY l_returnflag
"""


@query("q_sketch_hll_distinct", oracle=_HLL_ORACLE, tags=("sketch", "hll"))
def q_sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketches (Spark's DataSketches
    built-ins): per-returnflag partkey sketches, then a MERGE of the
    group sketches into a global estimate — the mergeability is the
    100 TB story (sketch each partition/day once, union at query time;
    no re-scan, fixed sketch bytes over the wire).

    The raw HLL estimate is implementation-defined (DuckDB's
    approx_distinct is a different HLL), so the *estimate* can't be
    hash-compared — but the error CONTRACT can: the query outputs the
    exact distinct count plus ``est_within_tol`` (|est-exact| <= 2.5%
    of exact, computed from the live sketch — an EMPIRICAL margin for
    lgK=14 on this data, the same bound tests/test_sketch.py asserts
    on the raw estimates), and the oracle asserts the same exact
    counts with the bound literally TRUE. Spark's
    sketch is deterministic for fixed data (register maxes are
    order-independent under union), so the boolean is stable. A raw
    estimate readout stays covered by tests/test_sketch.py. The exact
    count here is test-scale scaffolding for the contract; production
    keeps only the sketches."""
    li = load_table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey", F.lit(14)).alias("sk"),
        F.countDistinct("l_partkey").alias("exact_distinct"),
    )
    merged = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.lit("ALL").alias("l_returnflag"),
    ).join(
        li.agg(F.countDistinct("l_partkey").alias("exact_distinct")), how="cross"
    )
    within = (
        F.abs(F.col("est") - F.col("exact_distinct"))
        <= F.lit(0.025) * F.col("exact_distinct")
    ).alias("est_within_tol")
    return (
        per_flag.select(
            "l_returnflag",
            "exact_distinct",
            (
                F.abs(F.hll_sketch_estimate("sk") - F.col("exact_distinct"))
                <= F.lit(0.025) * F.col("exact_distinct")
            ).alias("est_within_tol"),
        )
        .unionByName(merged.select("l_returnflag", "exact_distinct", within))
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Mergeable approximate quantiles with a rank-error contract.
# --------------------------------------------------------------------------
_QSKETCH_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


@query("q_sketch_quantile", oracle=_QSKETCH_ORACLE, tags=("sketch", "quantile"))
def q_sketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles from Spark's mergeable Greenwald-Khanna
    sketch (``percentile_approx``, accuracy=100 => rank error
    eps <= 1%): the sketch per partition/day merges associatively, so
    at 100 TB you sketch once per partition and combine at query time
    — never a global sort.

    Like the HLL entry, the raw estimate is implementation-defined, so
    the hash-compared output is the CONTRACT, not the estimate: for
    each p in (0.5, 0.9, 0.99) the query computes the estimate's true
    rank (one aggregated pass, no re-sort) and asserts
    |rank - p*n| <= n/accuracy + 1 — the documented GK guarantee. The
    oracle pins the same groups with the bound literally TRUE."""
    acc = 100
    ev = load_table(spark, sf_dir, "events")
    appx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], F.lit(acc)).alias("ap"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ranked = (
        ev.join(F.broadcast(appx), "event_type")
        .groupBy("event_type", "n_rows")
        .agg(
            *[
                F.sum(F.when(F.col("value") <= F.col("ap")[i], 1).otherwise(0)).alias(f"r{i}")
                for i in range(3)
            ]
        )
    )
    tol = F.col("n_rows") / acc + 1
    cols = [
        (F.abs(F.col(f"r{i}") - p * F.col("n_rows")) <= tol).alias(name)
        for i, (p, name) in enumerate([(0.5, "p50_ok"), (0.9, "p90_ok"), (0.99, "p99_ok")])
    ]
    return ranked.select("event_type", "n_rows", *cols).orderBy("event_type")


# --------------------------------------------------------------------------
# KMV (bottom-k / k-minimum-values) distinct-count sketch.
# --------------------------------------------------------------------------
_KMV_K = 256
_KMV_DOMAIN = 268435456  # 2^28: the 7-hex-digit md5 hash space
_KMV_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT c_mktsegment AS seg,
         CAST(concat('0x', substring(md5(CAST(c_custkey AS VARCHAR)),1,7)) AS BIGINT) AS hv
  FROM customer
),
ranked AS (SELECT seg, hv, ROW_NUMBER() OVER (PARTITION BY seg ORDER BY hv) AS rn FROM h),
stats AS (
  SELECT seg, COUNT(*) AS n_h, MAX(CASE WHEN rn <= {_KMV_K} THEN hv END) AS kth
  FROM ranked GROUP BY seg
),
exact AS (SELECT c_mktsegment AS seg, COUNT(DISTINCT c_custkey) AS exact_distinct FROM customer GROUP BY seg)
SELECT s.seg AS c_mktsegment,
       CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
       CAST(CASE WHEN s.n_h < {_KMV_K} THEN s.n_h
                 ELSE (CAST({_KMV_K - 1} AS BIGINT) * {_KMV_DOMAIN}) // s.kth END AS BIGINT) AS kmv_est,
       (ABS(CAST(CASE WHEN s.n_h < {_KMV_K} THEN s.n_h
                 ELSE (CAST({_KMV_K - 1} AS BIGINT) * {_KMV_DOMAIN}) // s.kth END AS BIGINT)
            - e.exact_distinct) * 5 <= e.exact_distinct) AS est_within_tol
FROM stats s JOIN exact e ON e.seg = s.seg ORDER BY c_mktsegment
"""


@query("q_sketch_kmv", oracle=_KMV_ORACLE, tags=("sketch", "distinct"))
def q_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct-count sketch per segment: keep the k
    smallest hash values; when fewer than k distinct hashes exist the
    sketch is exact, otherwise est = (k-1) * D / kth_min. Unlike HLL
    (fixed registers), KMV sketches of different groups also merge by
    a k-smallest union — the classic partition-then-merge distinct
    estimator. The estimate itself is hash-compared (deterministic md5
    hash space), plus the tolerance contract: |est - exact| <= 20% of
    exact — an EMPIRICAL margin for k=256 on this data (max observed
    14% at sf0.1; the analytic std err is ~1/sqrt(k) ~ 6%, so 20% is
    ~3 sigma), mirrored literally by the oracle like the HLL entry.

    Scale shape: per-group the shuffle carries at most k hash values
    (rank <= k plans as WindowGroupLimit heaps after the distinct) —
    sketch size is independent of group cardinality."""
    cust = load_table(spark, sf_dir, "customer")
    h = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 7), 16, 10)
        .cast("long")
        .alias("hv"),
    ).distinct()
    from pyspark.sql.window import Window

    w = Window.partitionBy("seg").orderBy("hv")
    ranked = h.withColumn("rn", F.row_number().over(w))
    stats = ranked.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.max(F.when(F.col("rn") <= _KMV_K, F.col("hv"))).alias("kth"),
    )
    exact = cust.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.countDistinct("c_custkey").alias("exact_distinct")
    )
    est = F.when(F.col("n_h") < _KMV_K, F.col("n_h")).otherwise(
        F.expr(f"(CAST({_KMV_K - 1} AS BIGINT) * {_KMV_DOMAIN}) div kth")
    ).cast("long")
    return (
        stats.join(exact, "seg")
        .select(
            F.col("seg").alias("c_mktsegment"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            est.alias("kmv_est"),
            (F.abs(est - F.col("exact_distinct")) * 5 <= F.col("exact_distinct")).alias(
                "est_within_tol"
            ),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# KMV union-merge: pairwise audience overlap (Jaccard) between event
# types from mergeable bottom-k sketches, vs the exact answer.
# --------------------------------------------------------------------------
_KMVJ_K = 128
_KMVJ_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type AS seg,
         CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)),1,7)) AS BIGINT) AS hv
  FROM events
),
ranked AS (SELECT seg, hv, ROW_NUMBER() OVER (PARTITION BY seg ORDER BY hv) AS rn FROM h),
bottomk AS (SELECT seg, hv FROM ranked WHERE rn <= {_KMVJ_K}),
stats AS (
  SELECT seg, COUNT(*) AS n_h, MAX(CASE WHEN rn <= {_KMVJ_K} THEN hv END) AS kth
  FROM ranked GROUP BY seg
),
est AS (
  SELECT seg, n_h,
         CAST(CASE WHEN n_h < {_KMVJ_K} THEN n_h
              ELSE (CAST({_KMVJ_K - 1} AS BIGINT) * {_KMV_DOMAIN}) // kth END AS BIGINT) AS est_n
  FROM stats
),
pairs AS (
  SELECT a.seg AS type_a, b.seg AS type_b, a.est_n AS est_a, b.est_n AS est_b,
         a.n_h AS nha, b.n_h AS nhb
  FROM est a JOIN est b ON a.seg < b.seg
),
merged AS (
  SELECT p.type_a, p.type_b, k.hv
  FROM pairs p JOIN bottomk k ON k.seg = p.type_a
  UNION
  SELECT p.type_a, p.type_b, k.hv
  FROM pairs p JOIN bottomk k ON k.seg = p.type_b
),
mranked AS (SELECT type_a, type_b, hv,
                   ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY hv) AS rn
            FROM merged),
mstats AS (
  SELECT type_a, type_b, COUNT(*) AS n_hu,
         MAX(CASE WHEN rn <= {_KMVJ_K} THEN hv END) AS kthu
  FROM mranked GROUP BY type_a, type_b
),
uest AS (
  SELECT p.type_a, p.type_b, p.est_a, p.est_b,
         CAST(CASE WHEN p.nha < {_KMVJ_K} AND p.nhb < {_KMVJ_K} THEN m.n_hu
              ELSE (CAST({_KMVJ_K - 1} AS BIGINT) * {_KMV_DOMAIN}) // m.kthu END AS BIGINT) AS est_union
  FROM pairs p JOIN mstats m ON m.type_a = p.type_a AND m.type_b = p.type_b
),
u AS (SELECT DISTINCT event_type AS seg, user_id FROM events),
xinter AS (
  SELECT a.seg AS type_a, b.seg AS type_b, COUNT(*) AS n_inter
  FROM u a JOIN u b ON a.user_id = b.user_id AND a.seg < b.seg
  GROUP BY a.seg, b.seg
),
xsize AS (SELECT seg, COUNT(*) AS n FROM u GROUP BY seg)
SELECT e.type_a AS type_a, e.type_b AS type_b,
       e.est_union,
       CAST(sa.n + sb.n - COALESCE(i.n_inter, 0) AS BIGINT) AS exact_union,
       CAST((GREATEST(e.est_a + e.est_b - e.est_union, 0) * 1000000) // e.est_union AS BIGINT) AS kmv_jaccard_ppm,
       CAST((COALESCE(i.n_inter, 0) * 1000000) // (sa.n + sb.n - COALESCE(i.n_inter, 0)) AS BIGINT) AS exact_jaccard_ppm
FROM uest e
JOIN xsize sa ON sa.seg = e.type_a
JOIN xsize sb ON sb.seg = e.type_b
LEFT JOIN xinter i ON i.type_a = e.type_a AND i.type_b = e.type_b
ORDER BY type_a, type_b
"""


@query("q_sketch_kmv_jaccard", oracle=_KMVJ_ORACLE, tags=("sketch", "distinct", "similarity"))
def q_sketch_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types estimated from
    MERGED KMV sketches — the property HLL registers lack: two bottom-k
    sketches union by re-taking the k smallest of their union, giving
    |A u B| and hence Jaccard by inclusion-exclusion, without revisiting
    the raw data. Exact values computed alongside for the audit.

    Scale shape: each sketch is <= k hash values (WindowGroupLimit
    heaps after the per-type distinct); the pairwise stage runs over
    |event_types|^2 sketch pairs of <= 2k longs each — constant-size
    regardless of user cardinality. The exact check is one distinct +
    one equi-join on user_id, dropped in production."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        F.col("event_type").alias("seg"),
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 7), 16, 10)
        .cast("long")
        .alias("hv"),
    ).distinct()
    w = Window.partitionBy("seg").orderBy("hv")
    ranked = h.withColumn("rn", F.row_number().over(w))
    bottomk = ranked.filter(F.col("rn") <= _KMVJ_K).select("seg", "hv")
    stats = ranked.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.max(F.when(F.col("rn") <= _KMVJ_K, F.col("hv"))).alias("kth"),
    )
    est = stats.select(
        "seg",
        "n_h",
        F.when(F.col("n_h") < _KMVJ_K, F.col("n_h"))
        .otherwise(F.expr(f"(CAST({_KMVJ_K - 1} AS BIGINT) * {_KMV_DOMAIN}) div kth"))
        .cast("long")
        .alias("est_n"),
    )
    ea = est.select(
        F.col("seg").alias("type_a"), F.col("est_n").alias("est_a"), F.col("n_h").alias("nha")
    )
    eb = est.select(
        F.col("seg").alias("type_b"), F.col("est_n").alias("est_b"), F.col("n_h").alias("nhb")
    )
    pairs = ea.join(F.broadcast(eb), F.col("type_a") < F.col("type_b"))
    ka = bottomk.select(F.col("seg").alias("type_a"), "hv")
    kb = bottomk.select(F.col("seg").alias("type_b"), "hv")
    merged = (
        pairs.select("type_a", "type_b")
        .join(ka, "type_a")
        .select("type_a", "type_b", "hv")
        .union(pairs.select("type_a", "type_b").join(kb, "type_b").select("type_a", "type_b", "hv"))
        .distinct()
    )
    wm = Window.partitionBy("type_a", "type_b").orderBy("hv")
    mstats = (
        merged.withColumn("rn", F.row_number().over(wm))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n_hu"),
            F.max(F.when(F.col("rn") <= _KMVJ_K, F.col("hv"))).alias("kthu"),
        )
    )
    uest = pairs.join(mstats, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "est_a",
        "est_b",
        F.when((F.col("nha") < _KMVJ_K) & (F.col("nhb") < _KMVJ_K), F.col("n_hu"))
        .otherwise(F.expr(f"(CAST({_KMVJ_K - 1} AS BIGINT) * {_KMV_DOMAIN}) div kthu"))
        .cast("long")
        .alias("est_union"),
    )
    u = ev.select(F.col("event_type").alias("seg"), "user_id").distinct()
    ua = u.select(F.col("seg").alias("type_a"), "user_id")
    ub = u.select(F.col("seg").alias("type_b"), "user_id")
    xinter = (
        ua.join(ub, ["user_id"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    xsize = u.groupBy("seg").agg(F.count(F.lit(1)).alias("n"))
    sa = xsize.select(F.col("seg").alias("type_a"), F.col("n").alias("na"))
    sb = xsize.select(F.col("seg").alias("type_b"), F.col("n").alias("nb"))
    return (
        uest.join(xinter, ["type_a", "type_b"], "left")
        .join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            "est_union",
            (F.col("na") + F.col("nb") - F.coalesce(F.col("n_inter"), F.lit(0)))
            .cast("long")
            .alias("exact_union"),
            F.expr(
                "greatest(est_a + est_b - est_union, 0) * 1000000 div est_union"
            ).cast("long").alias("kmv_jaccard_ppm"),
            F.expr(
                "coalesce(n_inter, 0) * 1000000 div (na + nb - coalesce(n_inter, 0))"
            ).cast("long").alias("exact_jaccard_ppm"),
        )
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------------------------------------
# Join-size estimation from CMS inner products — the optimizer-style
# cardinality estimate, vs the exact join size.
# --------------------------------------------------------------------------
_JS_DEPTH = 4
_JS_WIDTH = 256
_JS_ORACLE = f"""
WITH a AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events WHERE event_type = 'click'),
b AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events WHERE event_type = 'purchase'),
ea AS (
  {" UNION ALL ".join(
    f"SELECT {j} AS row, {sql_cms_bucket('k', j, _JS_WIDTH)} AS bucket FROM a"
    for j in range(_JS_DEPTH)
  )}
),
sa AS (SELECT row, bucket, COUNT(*) AS cnt FROM ea GROUP BY row, bucket),
eb AS (
  {" UNION ALL ".join(
    f"SELECT {j} AS row, {sql_cms_bucket('k', j, _JS_WIDTH)} AS bucket FROM b"
    for j in range(_JS_DEPTH)
  )}
),
sb AS (SELECT row, bucket, COUNT(*) AS cnt FROM eb GROUP BY row, bucket),
prod AS (
  SELECT sa.row, SUM(sa.cnt * sb.cnt) AS p
  FROM sa JOIN sb ON sb.row = sa.row AND sb.bucket = sa.bucket
  GROUP BY sa.row
),
est AS (SELECT CAST(MIN(p) AS BIGINT) AS est_join_size FROM prod),
ga AS (SELECT k, COUNT(*) AS c FROM a GROUP BY k),
gb AS (SELECT k, COUNT(*) AS c FROM b GROUP BY k),
exact AS (SELECT CAST(COALESCE(SUM(ga.c * gb.c), 0) AS BIGINT) AS exact_join_size
          FROM ga JOIN gb ON gb.k = ga.k),
tot AS (SELECT (SELECT COUNT(*) FROM a) AS na, (SELECT COUNT(*) FROM b) AS nb)
SELECT CAST(t.na AS BIGINT) AS na, CAST(t.nb AS BIGINT) AS nb,
       e.est_join_size, x.exact_join_size,
       CAST(e.est_join_size - x.exact_join_size AS BIGINT) AS overestimate,
       ((e.est_join_size - x.exact_join_size) * {_JS_WIDTH} <= 3 * t.na * t.nb) AS within_bound
FROM est e, exact x, tot t
"""


@query("q_sketch_join_size", oracle=_JS_ORACLE, tags=("sketch", "cms", "optimizer"))
def q_sketch_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from COUNT-MIN INNER PRODUCTS — the
    sketch-based estimate a distributed optimizer uses to choose join
    strategies without touching the data: |A join B| = sum_k f_A(k) *
    f_B(k), estimated as min over sketch rows of the bucket-wise
    counter product. Always an overestimate (collisions only add);
    the error bound e/w * |A|*|B| is asserted as the ``within_bound``
    contract, and the md5 bucket family makes even the collision error
    bit-replayable in DuckDB.

    Scale shape: each sketch is <= depth*width counter rows regardless
    of stream size (partial aggregation collapses per-partition
    first); the inner product joins two 1k-row sketches. The exact
    check (one equi-join) exists only for the audit and is dropped in
    production. The int64 bound product na*nb overflows past ~3e9 rows
    per side — swap the bound (not the estimate) to DECIMAL(38) there."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").cast("string").alias("k")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").cast("string").alias("k")
    )
    sa = cms_build(a, "k", depth=_JS_DEPTH, width=_JS_WIDTH).withColumnRenamed("cnt", "ca")
    sb = cms_build(b, "k", depth=_JS_DEPTH, width=_JS_WIDTH).withColumnRenamed("cnt", "cb")
    prod = (
        sa.join(sb, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("p"))
    )
    est = prod.agg(F.min("p").cast("long").alias("est_join_size"))
    ga = a.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    gb = b.groupBy("k").agg(F.count(F.lit(1)).alias("cb"))
    exact = (
        ga.join(gb, "k")
        .agg(F.coalesce(F.sum(F.col("c") * F.col("cb")), F.lit(0)).cast("long").alias("exact_join_size"))
    )
    tot = a.agg(F.count(F.lit(1)).alias("na")).crossJoin(
        F.broadcast(b.agg(F.count(F.lit(1)).alias("nb")))
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            "est_join_size",
            "exact_join_size",
            (F.col("est_join_size") - F.col("exact_join_size")).cast("long").alias("overestimate"),
            (
                (F.col("est_join_size") - F.col("exact_join_size")) * _JS_WIDTH
                <= 3 * F.col("na") * F.col("nb")
            ).alias("within_bound"),
        )
    )
