"""Corpus-statistics queries on ``documents`` — boilerplate detection,
unigram-LM surprisal scoring, and estimator-error audits. These are the
corpus-health tools a training-data pipeline runs between dedup and
packing: find template/boilerplate contamination, score documents by
how "surprising" their tokens are under the corpus's own unigram model
(the integer-exact cousin of CCNet's LM-perplexity filter), and measure
how far the MinHash Jaccard *estimate* drifts from the exact value on
real candidate pairs.

Every query is fully DuckDB-replayable: hashing is md5-based, ratios
are integer ppm, and the log2 in the surprisal score is the exact
integer ``length(bin(n)) - 1`` — no floating point anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.texthash import tokens, word_shingles
from ..operators.dedup import (
    doc_shingle_hashes,
    lsh_band_buckets,
    minhash_signatures,
)
from ..registry import REGISTRY, load_table, query

_TOKS = r"string_split_regex(trim(text), '\s+')"

# --------------------------------------------------------------------------
# Boilerplate n-grams: shingles shared by many documents are template
# text; flag documents dominated by them.
# --------------------------------------------------------------------------

_BOILER_DF = 4  # a 3-gram present in >= this many docs counts as boilerplate
_BOILER_FLAG_PPM = 300000  # flag docs whose boilerplate share >= 30%

_BOILER_ORACLE = f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id,
              CAST(concat('0x', substring(md5(array_to_string(list_slice(toks, i, i+2), ' ')),1,15)) AS BIGINT) AS h
       FROM tok, UNNEST(range(1, len(toks)-1)) AS u(i)
       WHERE len(toks) >= 3),
dfreq AS (SELECT h, COUNT(*) AS df FROM sh GROUP BY h),
pd AS (SELECT s.doc_id, COUNT(*) AS n_shingles,
              SUM(CASE WHEN f.df >= {_BOILER_DF} THEN 1 ELSE 0 END) AS n_boiler
       FROM sh s JOIN dfreq f USING (h) GROUP BY s.doc_id),
x AS (SELECT d.source, (pd.n_boiler * 1000000) // pd.n_shingles AS ppm
      FROM pd JOIN documents d USING (doc_id))
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(ppm) AS BIGINT) AS sum_boiler_ppm,
       CAST(SUM(CASE WHEN ppm >= {_BOILER_FLAG_PPM} THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM x GROUP BY source ORDER BY source
"""


@query("q_text_boilerplate_ngrams", oracle=_BOILER_ORACLE, tags=("text", "quality", "dedup"))
def q_text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/template detection: a distinct 3-gram appearing in
    >= 4 documents is 'boilerplate'; each doc's boilerplate share (ppm
    of its distinct shingles) rolls up per source with a >=30% flag
    count.

    Scale shape: shingles are md5-hashed to 60-bit longs INSIDE the
    scan projection (map-side ``array_distinct`` before the explode),
    so the doc-frequency groupBy and the join back to per-doc shingles
    shuffle 8-byte keys, never shingle strings — measured 2x on the
    10x corpus vs the string-keyed formulation. Hash collisions fold
    two shingles into one (~n^2/2^61, nil in practice); the oracle
    applies the identical md5 reduction so results match bit-for-bit
    regardless. Docs with < 3 tokens have no shingles and drop out
    (mirrored by the oracle's ``len(toks) >= 3``).
    """
    docs = load_table(spark, sf_dir, "documents")
    arr = F.array_distinct(
        F.transform(
            word_shingles(tokens("text"), 3),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )
    sh = docs.select("doc_id", F.explode(arr).alias("h"))
    dfreq = sh.groupBy("h").agg(F.count("*").alias("df"))
    # NOTE (r5): joining only the filtered df>=threshold subset back
    # (novelty-style) was tried and measured SLOWER here (6.1/52.7 vs
    # 3.7/28.1) — on a low-diversity corpus most shingles pass the
    # boilerplate threshold, so the "filtered" join keeps ~all rows
    # and the reformulation just adds an aggregate and loses the
    # reused exchange. The full-dfreq join stays.
    per_doc = (
        sh.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("df") >= _BOILER_DF, 1).otherwise(0)).alias("n_boiler"),
        )
    )
    ppm = per_doc.join(docs.select("doc_id", "source"), "doc_id").select(
        "source", F.expr("n_boiler * 1000000 div n_shingles").alias("ppm")
    )
    return (
        ppm.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ppm").alias("sum_boiler_ppm"),
            F.sum(F.when(F.col("ppm") >= _BOILER_FLAG_PPM, 1).otherwise(0)).alias("n_flagged"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Unigram-LM surprisal: integer-exact perplexity proxy. Each token costs
# floor(log2(N / count(w))) bits under the corpus's own unigram model;
# documents full of rare words cost more bits per token.
# --------------------------------------------------------------------------

_SURPRISAL_ORACLE = f"""
WITH tok AS (SELECT doc_id, source, UNNEST({_TOKS}) AS w FROM documents),
wc AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
tot AS (SELECT SUM(cnt) AS n_total FROM wc),
cost AS (SELECT w, CAST(length(bin(n_total // cnt)) - 1 AS BIGINT) AS bits FROM wc, tot),
pd AS (SELECT t.doc_id, t.source, COUNT(*) AS n_toks, SUM(c.bits) AS bits
       FROM tok t JOIN cost c USING (w) GROUP BY t.doc_id, t.source)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(SUM(bits) AS BIGINT) AS total_bits,
       CAST((SUM(bits) * 1000000) // SUM(n_toks) AS BIGINT) AS avg_bits_ppm
FROM pd GROUP BY source ORDER BY source
"""


@query("q_text_unigram_surprisal", oracle=_SURPRISAL_ORACLE, tags=("text", "quality", "model"))
def q_text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal scoring, the integer-exact analogue of
    perplexity filtering: token cost = floor(log2(N / count(w))) bits,
    computed as ``length(bin(N div cnt)) - 1`` so Spark and DuckDB
    agree bit-for-bit (no float log anywhere).

    Scale shape: the model is ONE vocabulary-sized aggregate; the
    grand total broadcasts as a single row; the token->cost join
    shuffles on the word (vocabulary-bounded, AQE broadcasts it when
    small). Per-doc and per-source rollups are ordinary partial aggs.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "source", F.explode(tokens("text")).alias("w"))
    wc = tok.groupBy("w").agg(F.count("*").alias("cnt"))
    total = wc.agg(F.sum("cnt").alias("n_total"))
    cost = wc.crossJoin(F.broadcast(total)).select(
        "w", (F.length(F.bin(F.expr("n_total div cnt"))) - 1).cast("long").alias("bits")
    )
    per_doc = (
        tok.join(cost, "w")
        .groupBy("doc_id", "source")
        .agg(F.count("*").alias("n_toks"), F.sum("bits").alias("bits"))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.sum("bits").alias("total_bits"),
            F.expr("sum(bits) * 1000000 div sum(n_toks)").alias("avg_bits_ppm"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# MinHash estimator-error audit: on LSH candidate pairs, compare the
# 8-hash signature estimate of Jaccard against the exact hashed-shingle
# Jaccard, grouped by the number of matching signature slots.
# --------------------------------------------------------------------------

_MINHASH_ERR_ORACLE = r"""
WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i+2), ' ') AS shingle
       FROM tok, UNNEST(range(1, len(toks)-1)) AS u(i)
       WHERE len(toks) >= 3),
hh AS (SELECT DISTINCT doc_id,
              CAST(concat('0x', substring(md5(shingle),1,7)) AS BIGINT) AS h
       FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM hh GROUP BY doc_id),
mh AS (SELECT doc_id,
              MIN((1299721*h + 12345)   % 1000000007) AS h0,
              MIN((15485863*h + 678910) % 1000000007) AS h1,
              MIN((32452843*h + 1112131) % 1000000007) AS h2,
              MIN((49979687*h + 1415161) % 1000000007) AS h3,
              MIN((67867967*h + 1718192) % 1000000007) AS h4,
              MIN((86028121*h + 2021222) % 1000000007) AS h5,
              MIN((104395301*h + 2324252) % 1000000007) AS h6,
              MIN((122949823*h + 2627282) % 1000000007) AS h7
       FROM hh GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, h0 * 1000000007 + h1 AS sig FROM mh UNION ALL
  SELECT doc_id, 1, h2 * 1000000007 + h3 FROM mh UNION ALL
  SELECT doc_id, 2, h4 * 1000000007 + h5 FROM mh UNION ALL
  SELECT doc_id, 3, h6 * 1000000007 + h7 FROM mh),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a
         JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
est AS (SELECT c.id_a, c.id_b,
               (CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END + CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END
              + CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END + CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END
              + CASE WHEN a.h4 = b.h4 THEN 1 ELSE 0 END + CASE WHEN a.h5 = b.h5 THEN 1 ELSE 0 END
              + CASE WHEN a.h6 = b.h6 THEN 1 ELSE 0 END + CASE WHEN a.h7 = b.h7 THEN 1 ELSE 0 END
               ) AS matches
        FROM cand c JOIN mh a ON a.doc_id = c.id_a JOIN mh b ON b.doc_id = c.id_b),
inter AS (SELECT c.id_a, c.id_b, COUNT(b.h) AS nc
          FROM cand c
          JOIN hh a ON a.doc_id = c.id_a
          LEFT JOIN hh b ON b.doc_id = c.id_b AND b.h = a.h
          GROUP BY c.id_a, c.id_b),
pairs AS (SELECT e.id_a, e.id_b, e.matches,
                 (i.nc * 1000000) // (sa.n + sb.n - i.nc) AS exact_ppm,
                 e.matches * 125000 AS est_ppm
          FROM est e
          JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
          JOIN sizes sa ON sa.doc_id = e.id_a
          JOIN sizes sb ON sb.doc_id = e.id_b)
SELECT matches,
       COUNT(*) AS n_pairs,
       CAST(SUM(exact_ppm) // COUNT(*) AS BIGINT) AS avg_exact_ppm,
       CAST(SUM(ABS(est_ppm - exact_ppm)) // COUNT(*) AS BIGINT) AS avg_abs_err_ppm
FROM pairs GROUP BY matches ORDER BY matches
"""


@query("q_dedup_minhash_error", oracle=_MINHASH_ERR_ORACLE, tags=("dedup", "lsh", "quality"))
def q_dedup_minhash_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-error audit for MinHash: on every LSH candidate pair,
    compare the signature estimate (matching slots / 8, in ppm) to the
    exact hashed-shingle Jaccard, grouped by matching-slot count. This
    is the calibration table that tells you whether the (bands, rows)
    configuration is honest at your similarity threshold.

    Scale shape: identical to the production MinHash pipeline — the
    pair space is only LSH collisions, signature joins carry 8 longs,
    and the exact-Jaccard verify joins on the 28-bit shingle hash. No
    stage is pairwise over the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    hashes = doc_shingle_hashes(docs, "doc_id", "text", k=3)
    sizes = hashes.groupBy("doc_id").agg(F.count("*").alias("n"))
    sigs = minhash_signatures(hashes, "doc_id", n_hashes=8)
    bands = lsh_band_buckets(sigs, "doc_id", bands=4, rows=2)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("id_a"), *[F.col(f"h{j}").alias(f"a{j}") for j in range(8)])
    sb = sigs.select(F.col("doc_id").alias("id_b"), *[F.col(f"h{j}").alias(f"b{j}") for j in range(8)])
    match_expr = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0) for j in range(8)
    )
    est = cand.join(sa, "id_a").join(sb, "id_b").select(
        "id_a", "id_b", match_expr.cast("long").alias("matches")
    )
    ha = hashes.select(F.col("doc_id").alias("id_a"), "h")
    hb = hashes.select(F.col("doc_id").alias("_id_b2"), F.col("h").alias("hb"))
    inter = (
        cand.join(ha, "id_a")
        .join(hb, (F.col("id_b") == F.col("_id_b2")) & (F.col("h") == F.col("hb")), "left")
        .groupBy("id_a", "id_b")
        .agg(F.count("hb").alias("nc"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    pairs = (
        est.join(inter, ["id_a", "id_b"])
        .join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "matches",
            F.expr("nc * 1000000 div (na + nb - nc)").alias("exact_ppm"),
            (F.col("matches") * 125000).alias("est_ppm"),
        )
    )
    return (
        pairs.groupBy("matches")
        .agg(
            F.count("*").alias("n_pairs"),
            F.expr("sum(exact_ppm) div count(*)").alias("avg_exact_ppm"),
            F.expr("sum(abs(est_ppm - exact_ppm)) div count(*)").alias("avg_abs_err_ppm"),
        )
        .orderBy("matches")
    )


# --------------------------------------------------------------------------
# Exact set-similarity join via prefix filtering (AllPairs/PPJoin):
# the deterministic, no-false-negative alternative to MinHash-LSH.
# --------------------------------------------------------------------------
_PP_T_NUM, _PP_T_DEN = 4, 5  # jaccard threshold 0.8 as an exact rational

# The exact join is the audit path: prefix-bucket candidates grow
# superlinearly with corpus size on low-diversity vocabularies, so past
# this many documents the job fails fast (in-plan assert, same contract
# as the ANN brute-force query cap) instead of melting the cluster —
# run MinHash-LSH (q_dedup_minhash_lsh) at corpus scale and PPJoin on
# samples/partitions.
MAX_EXACT_JOIN_DOCS = 1_000_000

_PPJOIN_ORACLE = rf"""
WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i+2), ' ') AS shingle
       FROM tok, UNNEST(range(1, len(toks)-1)) AS u(i)
       WHERE len(toks) >= 3),
hh AS (SELECT DISTINCT doc_id,
              CAST(concat('0x', substring(md5(shingle),1,7)) AS BIGINT) AS h
       FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM hh GROUP BY doc_id),
dfreq AS (SELECT h, COUNT(*) AS df FROM hh GROUP BY h),
ordered AS (
  SELECT hh.doc_id, hh.h,
         ROW_NUMBER() OVER (PARTITION BY hh.doc_id ORDER BY d.df, hh.h) AS rn
  FROM hh JOIN dfreq d USING (h)
),
pref AS (
  SELECT o.doc_id, o.h, o.rn, s.n
  FROM ordered o JOIN sizes s USING (doc_id)
  WHERE o.rn <= s.n - ({_PP_T_NUM} * s.n + {_PP_T_NUM}) // {_PP_T_DEN} + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pref a JOIN pref b
    ON a.h = b.h AND a.doc_id < b.doc_id
   AND {_PP_T_DEN} * LEAST(a.n, b.n) >= {_PP_T_NUM} * GREATEST(a.n, b.n)
   AND 1 + LEAST(a.n - a.rn, b.n - b.rn) >= ({_PP_T_NUM} * (a.n + b.n) + 8) // 9
),
inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS nc
          FROM cand c
          JOIN hh a ON a.doc_id = c.id_a
          JOIN hh b ON b.doc_id = c.id_b AND b.h = a.h
          GROUP BY c.id_a, c.id_b)
SELECT i.id_a, i.id_b,
       CAST(i.nc AS DOUBLE) / (sa.n + sb.n - i.nc) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE {_PP_T_DEN} * i.nc >= {_PP_T_NUM} * (sa.n + sb.n - i.nc)
ORDER BY id_a, id_b
"""


@query("q_dedup_prefix_filter_join", oracle=_PPJOIN_ORACLE, tags=("dedup", "similarity"))
def q_dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join at jaccard >= 0.8 via prefix
    filtering (AllPairs/PPJoin): order each doc's shingle hashes by
    global rarity, keep only the |S| - ceil(0.8|S|) + 1 rarest as its
    'prefix', and generate candidates ONLY from shared prefix tokens
    plus the size-compatibility bound 5*min(|A|,|B|) >= 4*max(|A|,|B|)
    and the PPJoin positional filter (the overlap still reachable from
    the matched prefix positions must meet the threshold's required
    alpha = ceil(4(|A|+|B|)/9)).
    Unlike MinHash-LSH this has NO false negatives — the candidate set
    provably contains every qualifying pair — at the cost of candidate
    counts that grow with token-frequency skew. The threshold is the
    exact rational 4/5 so every filter is integer arithmetic.

    Scale shape: candidates come from a join on the composite key
    (28-bit prefix hash, length stratum); three exact prunes keep
    buckets small: (1) ASYMMETRIC prefixes — pairs are generated
    larger-probes-smaller, and the indexed (smaller) side only needs
    its |B| - ceil(2t/(1+t)|B|) + 1 = |B| - ceil(8|B|/9) + 1 rarest
    tokens (PPJoin index prefix; valid because |A| >= |B| implies
    required overlap alpha >= 2t/(1+t)|B|), roughly halving indexed
    bucket populations vs the symmetric ceil(0.2|B|)+1 prefix;
    (2) LENGTH STRATIFICATION — the join key carries a geometric
    (base-1.25) size stratum, so a common token's bucket splits by
    doc length and incompatible-size pairs never materialize (the
    index side replicates to strata {g, g+1, g+2}, covering the
    exact-math bound g(na)-g(nb) <= 1 for na/nb <= 1.25 plus one
    stratum of float-floor slack, so no qualifying pair can be
    missed); (3) the PPJoin positional filter. The per-doc rarity
    sort is a window partitioned by doc_id; all shuffles carry
    integer keys. Even so, candidates grow superlinearly on a
    low-diversity token distribution — that is the exactness tax —
    so the plan carries an in-plan corpus-size guard (assert fails
    past MAX_EXACT_JOIN_DOCS, the same contract as the ANN
    brute-force cap): MinHash-LSH (q_dedup_minhash_lsh) is the scale
    path; PPJoin is the audit/ground-truth path you run on samples
    or high-diversity corpora."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    hh = doc_shingle_hashes(docs, "doc_id", "text", k=3)
    sizes = hh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = hh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "h")
    ordered = (
        hh.join(dfreq, "h")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        # geometric length stratum; both sides derive it from the same
        # deterministic expression, so equality is consistent
        .withColumn("g", F.floor(F.log(F.col("n").cast("double")) / math.log(1.25)))
    )
    # probing prefix (larger side): the |A| - ceil(t|A|) + 1 rarest tokens
    pa = ordered.filter(
        F.col("rn")
        <= F.col("n") - F.expr(f"({_PP_T_NUM} * n + {_PP_T_NUM}) div {_PP_T_DEN}") + 1
    ).select(
        F.col("doc_id").alias("id_a"), "h", F.col("n").alias("na"),
        F.col("rn").alias("ra"), F.col("g").alias("ga"),
    )
    # in-plan corpus-size guard: 1-row count broadcast into the probe
    # side; assert_true fails the job with a clear message past the cap
    # (NULL on success, so the filter passes every row)
    n_docs = sizes.agg(F.count(F.lit(1)).alias("_ndocs"))
    pa = (
        pa.crossJoin(F.broadcast(n_docs))
        .filter(
            F.assert_true(
                F.col("_ndocs") <= MAX_EXACT_JOIN_DOCS,
                F.lit(
                    "q_dedup_prefix_filter_join: corpus exceeds "
                    f"MAX_EXACT_JOIN_DOCS={MAX_EXACT_JOIN_DOCS}; the exact "
                    "set-similarity join is the audit path — use "
                    "q_dedup_minhash_lsh at corpus scale or run PPJoin on a "
                    "sample/partition"
                ),
            ).isNull()
        )
        .drop("_ndocs")
    )
    # index prefix (smaller side): only |B| - ceil(8|B|/9) + 1 rarest
    # tokens, replicated into the up-to-3 strata a larger partner can
    # occupy
    pb = (
        ordered.filter(
            F.col("rn") <= F.col("n") - F.expr("(8 * n + 8) div 9") + 1
        )
        .select(
            F.col("doc_id").alias("id_b"),
            F.col("h").alias("hb"),
            F.col("n").alias("nb"),
            F.col("rn").alias("rb"),
            F.explode(F.array(F.col("g"), F.col("g") + 1, F.col("g") + 2)).alias("gb"),
        )
    )
    cand = (
        pa.join(
            pb,
            (F.col("h") == F.col("hb"))
            & (F.col("ga") == F.col("gb"))
            # larger-probes-smaller orientation (ties broken by doc_id)
            & (
                (F.col("na") > F.col("nb"))
                | ((F.col("na") == F.col("nb")) & (F.col("id_a") < F.col("id_b")))
            )
            & (_PP_T_DEN * F.col("nb") >= _PP_T_NUM * F.col("na"))
            # PPJoin positional filter: the overlap still reachable from
            # these prefix positions must meet the required alpha =
            # ceil(t/(1+t) * (|A|+|B|)) = ceil(4(na+nb)/9) for t = 4/5.
            & (
                1 + F.least(F.col("na") - F.col("ra"), F.col("nb") - F.col("rb"))
                >= F.expr("(4 * (na + nb) + 8) div 9")
            ),
        )
        # canonicalize to id_a < id_b (orientation was by size, not id)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    # verification: per-doc shingle-hash ARRAYS (avg ~55 longs each)
    # joined to the candidate pairs, intersected JVM-side — two joins of
    # |cand| rows instead of exploding every pair back into pair x
    # shingle rows (a ~50x larger shuffle at this corpus' mean doc size)
    packs = hh.groupBy("doc_id").agg(F.collect_list("h").alias("hs"))
    inter = (
        cand.join(packs.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(packs.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("hs_a", "hs_b")).cast("long").alias("nc"),
            F.size("hs_a").cast("long").alias("na"),
            F.size("hs_b").cast("long").alias("nb"),
        )
    )
    return (
        inter.filter(_PP_T_DEN * F.col("nc") >= _PP_T_NUM * (F.col("na") + F.col("nb") - F.col("nc")))
        .select(
            "id_a",
            "id_b",
            (F.col("nc").cast("double") / (F.col("na") + F.col("nb") - F.col("nc"))).alias(
                "jaccard"
            ),
        )
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# N-gram novelty: how much genuinely-new content each doc adds, in
# ingestion (doc_id) order — the corpus growth curve.
# --------------------------------------------------------------------------
_NOVELTY_ORACLE = f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id,
              CAST(concat('0x', substring(md5(array_to_string(list_slice(toks, i, i+2), ' ')),1,15)) AS BIGINT) AS h
       FROM tok, UNNEST(range(1, len(toks)-1)) AS u(i)
       WHERE len(toks) >= 3),
owner AS (SELECT h, MIN(doc_id) AS first_doc FROM sh GROUP BY h),
pd AS (
  SELECT s.doc_id, COUNT(*) AS n_shingles,
         SUM(CASE WHEN o.first_doc = s.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM sh s JOIN owner o USING (h) GROUP BY s.doc_id
),
x AS (SELECT d.source, (pd.n_novel * 1000000) // pd.n_shingles AS ppm
      FROM pd JOIN documents d USING (doc_id))
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(ppm) AS BIGINT) AS sum_novelty_ppm,
       CAST(MIN(ppm) AS BIGINT) AS min_novelty_ppm
FROM x GROUP BY source ORDER BY source
"""


@query("q_text_ngram_novelty", oracle=_NOVELTY_ORACLE, tags=("text", "dedup", "quality"))
def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty rate: the share of each document's distinct
    3-grams whose FIRST corpus occurrence (min doc_id) is this
    document — the growth-curve metric that tells you when a crawl
    stops adding new content (novelty trending to zero = stop
    crawling, start dedup). Ingestion order is the doc_id order.

    Scale shape (r5 rewrite): NO join back of the shingle stream.
    n_novel is just the owner table re-aggregated by its first_doc
    column and n_shingles a map-side-combinable count per doc — the
    original join of every (doc, shingle) row against the owner table
    re-shuffled the full shingle stream a second time to compute
    counts both sides already contained (measured: 10x point 56.0s ->
    27.2s, ratio 9.9x -> 7.3x; the residual ratio is 10x shingle
    volume through the owner MIN, which is the query's irreducible
    work). Three aggregates, all map-side combinable; the only wide
    shuffle left is the owner MIN on 60-bit hash keys."""
    docs = load_table(spark, sf_dir, "documents")
    arr = F.array_distinct(
        F.transform(
            word_shingles(tokens("text"), 3),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )
    sh = docs.select("doc_id", F.explode(arr).alias("h"))
    owner = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    totals = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    novel = owner.groupBy("first_doc").agg(F.count(F.lit(1)).alias("n_novel"))
    pd_ = (
        totals.join(novel, totals.doc_id == novel.first_doc, "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
        )
    )
    ppm = pd_.join(docs.select("doc_id", "source"), "doc_id").select(
        "source", F.expr("n_novel * 1000000 div n_shingles").alias("ppm")
    )
    return (
        ppm.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ppm").alias("sum_novelty_ppm"),
            F.min("ppm").alias("min_novelty_ppm"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Dedup recall audit: MinHash-LSH pairs vs the exact PPJoin ground
# truth at the same threshold.
# --------------------------------------------------------------------------
_RECALL_ORACLE = rf"""
WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i+2), ' ') AS shingle
       FROM tok, UNNEST(range(1, len(toks)-1)) AS u(i)
       WHERE len(toks) >= 3),
hh AS (SELECT DISTINCT doc_id,
              CAST(concat('0x', substring(md5(shingle),1,7)) AS BIGINT) AS h
       FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM hh GROUP BY doc_id),
-- exact ground truth: every pair with jaccard >= 0.8 (via PPJoin prefix filter)
dfreq AS (SELECT h, COUNT(*) AS df FROM hh GROUP BY h),
ordered AS (
  SELECT hh.doc_id, hh.h,
         ROW_NUMBER() OVER (PARTITION BY hh.doc_id ORDER BY d.df, hh.h) AS rn
  FROM hh JOIN dfreq d USING (h)
),
pref AS (
  SELECT o.doc_id, o.h FROM ordered o JOIN sizes s USING (doc_id)
  WHERE o.rn <= s.n - (4 * s.n + 4) // 5 + 1
),
pcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM pref a JOIN pref b ON a.h = b.h AND a.doc_id < b.doc_id),
pinter AS (SELECT c.id_a, c.id_b, COUNT(*) AS nc
           FROM pcand c JOIN hh a ON a.doc_id = c.id_a
           JOIN hh b ON b.doc_id = c.id_b AND b.h = a.h
           GROUP BY c.id_a, c.id_b),
exact_pairs AS (
  SELECT i.id_a, i.id_b FROM pinter i
  JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE 5 * i.nc >= 4 * (sa.n + sb.n - i.nc)
),
-- LSH pipeline at the same threshold
mh AS (SELECT doc_id,
              MIN((1299721*h + 12345)   % 1000000007) AS h0,
              MIN((15485863*h + 678910) % 1000000007) AS h1,
              MIN((32452843*h + 1112131) % 1000000007) AS h2,
              MIN((49979687*h + 1415161) % 1000000007) AS h3,
              MIN((67867967*h + 1718192) % 1000000007) AS h4,
              MIN((86028121*h + 2021222) % 1000000007) AS h5,
              MIN((104395301*h + 2324252) % 1000000007) AS h6,
              MIN((122949823*h + 2627282) % 1000000007) AS h7
       FROM hh GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, h0 * 1000000007 + h1 AS sig FROM mh UNION ALL
  SELECT doc_id, 1, h2 * 1000000007 + h3 FROM mh UNION ALL
  SELECT doc_id, 2, h4 * 1000000007 + h5 FROM mh UNION ALL
  SELECT doc_id, 3, h6 * 1000000007 + h7 FROM mh),
lcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
linter AS (SELECT c.id_a, c.id_b, COUNT(*) AS nc
           FROM lcand c JOIN hh a ON a.doc_id = c.id_a
           JOIN hh b ON b.doc_id = c.id_b AND b.h = a.h
           GROUP BY c.id_a, c.id_b),
lsh_pairs AS (
  SELECT i.id_a, i.id_b FROM linter i
  JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE 5 * i.nc >= 4 * (sa.n + sb.n - i.nc)
)
SELECT CAST((SELECT COUNT(*) FROM exact_pairs) AS BIGINT) AS n_exact,
       CAST((SELECT COUNT(*) FROM lsh_pairs) AS BIGINT) AS n_lsh,
       CAST(((SELECT COUNT(*) FROM lsh_pairs) * 1000000)
            // (SELECT COUNT(*) FROM exact_pairs) AS BIGINT) AS recall_ppm
"""


@query("q_dedup_lsh_recall", oracle=_RECALL_ORACLE, tags=("dedup", "lsh", "quality"))
def q_dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup-recall audit that closes the estimator loop: the
    MinHash-LSH pair set measured against the EXACT PPJoin ground
    truth at the same jaccard >= 0.8 threshold. LSH verifies candidate
    pairs exactly, so its precision is 1 by construction — the metric
    that matters is recall (pairs whose signatures never collided in
    any band), and this query pins it as an integer ppm the oracle
    reproduces bit-for-bit. Run it when tuning (bands, rows).

    Scale shape: both pipelines are the production subquadratic paths
    (prefix-bucket and band-bucket joins); the comparison is a count
    of two pair sets."""
    from ..operators.dedup import minhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    lsh = minhash_near_dup_pairs(
        docs, "doc_id", "text", shingle_k=3, n_hashes=8, bands=4, threshold=0.8
    ).select("id_a", "id_b")
    exact = REGISTRY["q_dedup_prefix_filter_join"].fn(spark, sf_dir).select("id_a", "id_b")
    ne = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    nl = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    return ne.crossJoin(F.broadcast(nl)).select(
        F.col("n_exact").cast("long"),
        F.col("n_lsh").cast("long"),
        F.expr("n_lsh * 1000000 div n_exact").cast("long").alias("recall_ppm"),
    )


# --------------------------------------------------------------------------
# Source-level content overlap: pairwise Jaccard between the SOURCES'
# shingle sets — the mixture-planning dedup signal.
# --------------------------------------------------------------------------
_SRC_JACCARD_ORACLE = f"""
WITH tok AS (SELECT source, {_TOKS} AS toks FROM documents),
sh AS (SELECT DISTINCT source,
              CAST(concat('0x', substring(md5(array_to_string(list_slice(toks, i, i+2), ' ')),1,15)) AS BIGINT) AS h
       FROM tok, UNNEST(range(1, len(toks)-1)) AS u(i)
       WHERE len(toks) >= 3),
sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS nc
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY a.source, b.source
),
pairs AS (
  SELECT i.src_a, i.src_b,
         CAST((i.nc * 1000000) // (sa.n + sb.n - i.nc) AS BIGINT) AS jaccard_ppm
  FROM inter i
  JOIN sizes sa ON sa.source = i.src_a
  JOIN sizes sb ON sb.source = i.src_b
)
SELECT src_a, src_b, jaccard_ppm
FROM pairs WHERE jaccard_ppm >= 10000
ORDER BY src_a, src_b
"""


@query("q_text_source_overlap", oracle=_SRC_JACCARD_ORACLE, tags=("text", "dedup", "mixture"))
def q_text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level content overlap: pairwise Jaccard between each
    SOURCE's 3-gram shingle set (>= 1% only) — the corpus-granularity
    dedup signal mixture planning needs BEFORE doc-level dedup: two
    mirrored sources show up here as one near-1e6 cell, telling you to
    drop a whole source rather than fight millions of doc pairs.

    Scale shape: per-source shingle sets are one distinct aggregate on
    (source, 60-bit hash); the intersection join is keyed on the hash
    and the pair space is |sources|^2 cells — corpus size only enters
    through the linear shingle scan."""
    docs = load_table(spark, sf_dir, "documents")
    arr = F.array_distinct(
        F.transform(
            word_shingles(tokens("text"), 3),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )
    sh = docs.select("source", F.explode(arr).alias("h")).distinct()
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("src_a"), "h")
    b = sh.select(F.col("source").alias("src_b"), F.col("h").alias("hb"))
    inter = (
        a.join(b, (F.col("h") == F.col("hb")) & (F.col("src_a") < F.col("src_b")))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            F.expr("nc * 1000000 div (na + nb - nc)").cast("long").alias("jaccard_ppm"),
        )
        .filter(F.col("jaccard_ppm") >= 10000)
        .orderBy("src_a", "src_b")
    )
