"""Text-analysis queries on ``documents`` — token statistics, quality
scoring, language-ID, and fingerprinting (north-star extension), each
with an exact DuckDB oracle replaying the same heuristics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stable import sql_davg, davg
from ..functions import bounded_window_key
from ..functions.texthash import tokens
from ..operators.text import STOPWORDS, fingerprint, lang_id, quality_score, token_stats
from ..registry import load_table, query

_TOKS = r"string_split_regex(trim(text), '\s+')"


def _sql_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({_TOKS}, t -> list_contains([{words}], t)))"


# --------------------------------------------------------------------------
# Token statistics per language.
# --------------------------------------------------------------------------
_STATS_ORACLE = f"""
WITH t AS (
  SELECT lang,
         len({_TOKS}) AS n_tokens,
         length(text) AS n_chars_actual,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform({_TOKS}, s -> CAST(length(s) AS BIGINT))), (a, b) -> a + b) AS DOUBLE)
           / len({_TOKS}) AS mean_token_len
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       {sql_davg('n_chars_actual')} AS avg_chars,
       {sql_davg('mean_token_len')} AS avg_token_len
FROM t GROUP BY lang ORDER BY lang
"""


@query("q_text_token_stats", oracle=_STATS_ORACLE, headline=True, tags=("text",))
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + length statistics, aggregated per
    language — all array expressions inside codegen, no Python."""
    docs = token_stats(load_table(spark, sf_dir, "documents"))
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            davg("n_chars_actual").alias("avg_chars"),
            davg("mean_token_len").alias("avg_token_len"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Quality-score buckets.
# --------------------------------------------------------------------------
_QUALITY_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         0.4 * least(CAST(length(text) AS DOUBLE) / 400.0, 1.0)
       + 0.3 * (CAST({_sql_hits('en')} AS DOUBLE) / len({_TOKS}))
       + 0.3 * least((CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform({_TOKS}, s -> CAST(length(s) AS BIGINT))), (a, b) -> a + b) AS DOUBLE)
                 / len({_TOKS})) / 8.0, 1.0) AS quality
  FROM documents
)
SELECT CAST(FLOOR(quality * 10) AS BIGINT) AS quality_bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(FLOOR(quality * 1000) AS BIGINT)) AS BIGINT) AS quality_millis
FROM scored
GROUP BY quality_bucket
ORDER BY quality_bucket
"""


@query("q_text_quality_score", oracle=_QUALITY_ORACLE, tags=("text",))
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score (length fit + stopword ratio + token
    length), bucketed. The formula is the plumbing a model-based
    scorer (Pandas UDF) drops into.

    Aggregates stay integer (floor-of-millis): quality is a computed
    ratio that can land EXACTLY on a decimal rounding boundary, where
    Spark's HALF_UP and DuckDB's rounding disagree — floor of an
    identical double is mode-independent, so the sums match bitwise.
    """
    docs = quality_score(load_table(spark, sf_dir, "documents"))
    return (
        docs.groupBy(F.floor(F.col("quality") * 10).cast("bigint").alias("quality_bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.floor(F.col("quality") * 1000).cast("bigint")).alias("quality_millis"),
        )
        .orderBy("quality_bucket")
    )


# --------------------------------------------------------------------------
# Language identification vs the labelled lang column.
# --------------------------------------------------------------------------
_LANGID_ORACLE = f"""
WITH pred AS (
  SELECT lang,
         CASE
           WHEN {_sql_hits('en')} >= {_sql_hits('es')} AND {_sql_hits('en')} >= {_sql_hits('fr')}
                AND {_sql_hits('en')} >= {_sql_hits('de')} AND {_sql_hits('en')} > 0 THEN 'en'
           WHEN {_sql_hits('es')} >= {_sql_hits('fr')} AND {_sql_hits('es')} >= {_sql_hits('de')}
                AND {_sql_hits('es')} > 0 THEN 'es'
           WHEN {_sql_hits('fr')} >= {_sql_hits('de')} AND {_sql_hits('fr')} > 0 THEN 'fr'
           WHEN {_sql_hits('de')} > 0 THEN 'de'
           ELSE 'und'
         END AS pred_lang
  FROM documents
)
SELECT lang, pred_lang, COUNT(*) AS n_docs
FROM pred
GROUP BY lang, pred_lang
ORDER BY lang, pred_lang
"""


@query("q_text_lang_id", oracle=_LANGID_ORACLE, tags=("text",))
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language id crossed against the labelled lang —
    the confusion-matrix shape a real n-gram model would report into."""
    docs = lang_id(load_table(spark, sf_dir, "documents"))
    return (
        docs.groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


# --------------------------------------------------------------------------
# Document fingerprints (md5 + order-sensitive rolling hash).
# --------------------------------------------------------------------------
_FP_ORACLE = f"""
SELECT doc_id,
       md5(text) AS fp_md5,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform({_TOKS}, t -> ascii(t) * 7 + CAST(length(t) AS BIGINT))),
            (acc, v) -> (acc * 31 + v) % 1000000007) AS fp_roll
FROM documents
WHERE doc_id % 5 = 0
ORDER BY doc_id
"""


@query("q_text_fingerprint", oracle=_FP_ORACLE, tags=("text",))
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (md5) + rolling polynomial token-hash fingerprints; the
    rolling hash is order-sensitive so reordered-token docs diverge —
    a cheap blocking key for near-dup passes."""
    docs = fingerprint(load_table(spark, sf_dir, "documents")).filter(F.col("doc_id") % 5 == 0)
    return docs.select("doc_id", "fp_md5", "fp_roll").orderBy("doc_id")


# --------------------------------------------------------------------------
# End-to-end corpus curation: the composed training-data pipeline —
# lang filter -> quality gate -> token-count gate -> exact dedup ->
# per-source yield report. One declarative plan: Catalyst fuses the
# scalar stages into a single scan pass, the dedup is the only shuffle.
# --------------------------------------------------------------------------
_CURATE_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, text,
         len({_TOKS}) AS n_tokens,
         CASE
           WHEN {_sql_hits('en')} >= {_sql_hits('es')} AND {_sql_hits('en')} >= {_sql_hits('fr')}
                AND {_sql_hits('en')} >= {_sql_hits('de')} AND {_sql_hits('en')} > 0 THEN 'en'
           WHEN {_sql_hits('es')} >= {_sql_hits('fr')} AND {_sql_hits('es')} >= {_sql_hits('de')}
                AND {_sql_hits('es')} > 0 THEN 'es'
           WHEN {_sql_hits('fr')} >= {_sql_hits('de')} AND {_sql_hits('fr')} > 0 THEN 'fr'
           WHEN {_sql_hits('de')} > 0 THEN 'de'
           ELSE 'und'
         END AS pred_lang,
         0.4 * least(CAST(length(text) AS DOUBLE) / 400.0, 1.0)
       + 0.3 * (CAST({_sql_hits('en')} AS DOUBLE) / len({_TOKS}))
       + 0.3 * least((CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform({_TOKS}, s -> CAST(length(s) AS BIGINT))), (a, b) -> a + b) AS DOUBLE)
                 / len({_TOKS})) / 8.0, 1.0) AS quality
  FROM documents
),
gated AS (
  SELECT * FROM scored
  WHERE pred_lang = 'en' AND quality >= 0.5 AND n_tokens >= 5
),
deduped AS (
  SELECT md5(text) AS fp, MIN(doc_id) AS kept_id, COUNT(*) AS n_copies
  FROM gated GROUP BY md5(text)
)
SELECT g.source,
       COUNT(*) AS n_kept,
       CAST(SUM(d.n_copies) - COUNT(*) AS BIGINT) AS n_dropped_dups,
       CAST(SUM(g.n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(FLOOR(g.quality * 1000) AS BIGINT)) AS BIGINT) AS quality_millis
FROM deduped d JOIN gated g ON g.doc_id = d.kept_id
GROUP BY g.source
ORDER BY g.source
"""


@query("q_text_curation_pipeline", oracle=_CURATE_ORACLE, headline=True, tags=("text", "pipeline"))
def q_text_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pass a training-data pipeline runs per
    snapshot: language filter, quality gate, minimum-length gate, exact
    dedup (min-id survivor), per-source yield accounting. All scalar
    stages fuse into one codegen'd scan; the content-hash dedup is the
    single shuffle, carrying (hash, id, source, counters) — never text."""
    from ..operators.dedup import exact_dedup_survivors

    docs = load_table(spark, sf_dir, "documents")
    scored = token_stats(quality_score(lang_id(docs)))
    gated = scored.filter(
        (F.col("pred_lang") == "en") & (F.col("quality") >= 0.5) & (F.col("n_tokens") >= 5)
    )
    return (
        exact_dedup_survivors(gated, ["text"], "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            (F.sum("n_copies") - F.count("*")).alias("n_dropped_dups"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.floor(F.col("quality") * 1000).cast("bigint")).alias("quality_millis"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Trained trigram language classifier: learn per-language trigram
# weights on an 80% split, classify the held-out 20%, report the
# confusion matrix. Integer-weight voting — no FP anywhere, so train
# AND inference are bit-replayable by the oracle.
# --------------------------------------------------------------------------
_LANGS = ["en", "es", "fr", "de"]

_TRIGRAM_MODEL_CTE = """
train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
tr_tri AS (SELECT lang, substring(lower(text), CAST(i AS INT), 3) AS g
           FROM train, UNNEST(range(1, length(text) - 1)) AS u(i)
           WHERE length(text) >= 3),
counts AS (SELECT lang, g, COUNT(*) AS c FROM tr_tri GROUP BY 1, 2),
totals AS (SELECT lang, SUM(c) AS t FROM counts GROUP BY 1),
w AS (SELECT c.lang, c.g, c.c * 1000000000 // t.t AS w
      FROM counts c JOIN totals t USING (lang)),
model AS (SELECT g,
                 SUM(CASE WHEN lang = 'en' THEN w ELSE 0 END) AS w_en,
                 SUM(CASE WHEN lang = 'es' THEN w ELSE 0 END) AS w_es,
                 SUM(CASE WHEN lang = 'fr' THEN w ELSE 0 END) AS w_fr,
                 SUM(CASE WHEN lang = 'de' THEN w ELSE 0 END) AS w_de
          FROM w GROUP BY g),
te_tri AS (SELECT doc_id, lang, substring(lower(text), CAST(i AS INT), 3) AS g
           FROM test, UNNEST(range(1, length(text) - 1)) AS u(i)
           WHERE length(text) >= 3),
scored AS (SELECT t.doc_id, t.lang,
                  SUM(COALESCE(m.w_en, 0)) AS s_en,
                  SUM(COALESCE(m.w_es, 0)) AS s_es,
                  SUM(COALESCE(m.w_fr, 0)) AS s_fr,
                  SUM(COALESCE(m.w_de, 0)) AS s_de
           FROM te_tri t LEFT JOIN model m USING (g)
           GROUP BY 1, 2)
"""

_TRIGRAM_ORACLE = f"""
WITH {_TRIGRAM_MODEL_CTE}
SELECT lang,
       CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
            WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
            WHEN s_fr >= s_de THEN 'fr'
            ELSE 'de' END AS pred_lang,
       COUNT(*) AS n_docs
FROM scored
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q_text_trigram_classifier", oracle=_TRIGRAM_ORACLE, tags=("text", "model"))
def q_text_trigram_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-on-80/score-on-20 trigram language classifier: the model
    is a broadcastable (trigram -> weights) table, inference is one
    broadcast join + integer argmax — the distributed train/apply loop
    with zero floating point and zero Python in the row path."""
    from ..operators.langmodel import classify_by_trigrams, train_trigram_model

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    model = train_trigram_model(train, _LANGS)
    preds = classify_by_trigrams(test, model, _LANGS)
    return (
        preds.join(test.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test splitting — hash-bucket sampling that is
# stable under repartitioning and engines (unlike seeded sample()).
# --------------------------------------------------------------------------
from ..operators.sampling import sql_hash_bucket, sql_hash_priority  # noqa: E402

_SPLIT_ORACLE = f"""
WITH b AS (
  SELECT source, {sql_hash_bucket('doc_id')} AS bucket FROM documents
),
labeled AS (
  SELECT source,
         CASE WHEN bucket < 8000 THEN 'train'
              WHEN bucket < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM b
)
SELECT source, split, COUNT(*) AS n_docs
FROM labeled
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q_text_hash_split", oracle=_SPLIT_ORACLE, tags=("text", "sampling"))
def q_text_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split by doc-id hash bucket: disjoint,
    exhaustive, and identical on every rerun/repartition/engine — the
    reproducibility property seeded ``sample()`` cannot give."""
    from ..operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    splits = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    parts = [
        d.select("source").withColumn("split", F.lit(name)) for name, d in splits.items()
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return allp.groupBy("source", "split").agg(F.count("*").alias("n_docs")).orderBy("source", "split")


# --------------------------------------------------------------------------
# Sequence packing: lay docs out in id order per source and cut into
# 2048-token packs — the LLM pre-training batching step.
# --------------------------------------------------------------------------
_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, len({_TOKS}) AS n_tokens FROM documents
),
c AS (
  SELECT source, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
),
p AS (
  SELECT source, doc_id, n_tokens,
         CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id FROM c
)
SELECT source, pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM p
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q_text_pack_sequences", oracle=_PACK_ORACLE, tags=("text", "packing"))
def q_text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 2048-token sequence packing via one window cumsum —
    pack sizes land in [budget, budget + max_doc_tokens); a single
    shuffle per partition key, deterministic layout."""
    from ..operators.text import pack_documents

    docs = token_stats(load_table(spark, sf_dir, "documents"))
    packed = pack_documents(docs, budget=2048, partition_col="source")
    return (
        packed.groupBy("source", "pack_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("pack_tokens"))
        .orderBy("source", "pack_id")
    )


# --------------------------------------------------------------------------
# Gopher/C4-style rule filtering: type-token ratio, top-token share,
# mean word length, length gates — the published heuristic battery for
# pre-training corpora, as one declarative pass. Ratios reported as
# floored millis (integers) for cross-engine bit-stability.
# --------------------------------------------------------------------------
_GOPHER_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         {_TOKS} AS toks,
         len({_TOKS}) AS n_tok
  FROM documents
),
m AS (
  SELECT doc_id, source, n_tok,
         len(list_distinct(toks)) AS n_types,
         (SELECT MAX(cnt) FROM (
            SELECT COUNT(*) AS cnt FROM UNNEST(toks) AS u(tok) GROUP BY tok)) AS top_tok,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(toks, s -> CAST(length(s) AS BIGINT))), (a, b) -> a + b) AS DOUBLE)
           / n_tok AS mwl
  FROM t WHERE n_tok > 0
),
rules AS (
  SELECT doc_id, source,
         CAST(FLOOR(CAST(n_types AS DOUBLE) / n_tok * 1000) AS BIGINT) AS ttr_millis,
         CAST(FLOOR(CAST(top_tok AS DOUBLE) / n_tok * 1000) AS BIGINT) AS topshare_millis,
         CASE WHEN n_tok >= 20 AND n_tok <= 100000
               AND mwl >= 3.0 AND mwl <= 12.0
               AND CAST(n_types AS DOUBLE) / n_tok >= 0.2
               AND CAST(top_tok AS DOUBLE) / n_tok <= 0.2
              THEN 1 ELSE 0 END AS keep
  FROM m
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(SUM(ttr_millis) AS BIGINT) AS ttr_millis_sum,
       CAST(SUM(topshare_millis) AS BIGINT) AS topshare_millis_sum
FROM rules
GROUP BY source
ORDER BY source
"""


@query("q_text_gopher_rules", oracle=_GOPHER_ORACLE, tags=("text", "quality"))
def q_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality rules in one scan: type-token
    ratio (vocabulary diversity), top-token share (repetition), mean
    word length, and length gates — each doc keeps or drops in a
    single codegen'd pass; the per-source yield is what a curation
    run reports."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tok = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    # top token frequency via sorted-array run-length: aggregate over
    # the sorted tokens counting the longest equal run — pure array
    # expressions, no explode/shuffle.
    sorted_toks = F.array_sort(toks)
    top_tok = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"), F.lit(0).cast("long").alias("best")
        ),
        lambda acc, tok: F.struct(
            tok.alias("prev"),
            F.when(tok == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(tok == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    mwl = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).cast(
        "double"
    ) / n_tok
    ttr = n_types.cast("double") / n_tok
    share = top_tok.cast("double") / n_tok
    keep = (
        (n_tok >= 20) & (n_tok <= 100000)
        & (mwl >= 3.0) & (mwl <= 12.0)
        & (ttr >= 0.2) & (share <= 0.2)
    )
    rules = docs.filter(F.size(toks) > 0).select(
        "source",
        F.floor(ttr * 1000).cast("bigint").alias("ttr_millis"),
        F.floor(share * 1000).cast("bigint").alias("topshare_millis"),
        F.when(keep, 1).otherwise(0).alias("keep"),
    )
    return (
        rules.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").alias("n_kept"),
            F.sum("ttr_millis").alias("ttr_millis_sum"),
            F.sum("topshare_millis").alias("topshare_millis_sum"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Normalization-aware dedup: case/punct/whitespace variants collapse.
# --------------------------------------------------------------------------
_NORM_DEDUP_ORACLE = r"""
WITH norm AS (
  SELECT doc_id, source,
         trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:''"()\-]', '', 'g'),
                             '\s+', ' ', 'g')) AS norm_text
  FROM documents
),
g AS (
  SELECT md5(norm_text) AS h, MIN(doc_id) AS kept_id, COUNT(*) AS n_copies
  FROM norm GROUP BY 1
)
SELECT n.source, COUNT(*) AS n_kept, CAST(SUM(g.n_copies) AS BIGINT) AS n_rows
FROM g JOIN norm n ON n.doc_id = g.kept_id
GROUP BY n.source
ORDER BY n.source
"""


@query("q_dedup_normalized", oracle=_NORM_DEDUP_ORACLE, tags=("dedup", "normalize"))
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the CANONICAL text form (lowercase, punctuation
    stripped, whitespace collapsed): catches the near-dups raw hashing
    misses — the cheap normalization pass every corpus dedup runs
    before MinHash."""
    from ..operators.dedup import exact_dedup
    from ..operators.text import normalize_text

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "norm_text", normalize_text("text")
    )
    groups = exact_dedup(docs, ["norm_text"], "doc_id")
    return (
        groups.join(docs, groups.kept_id == docs.doc_id)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_copies").alias("n_rows"))
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# PII scan: per-source pattern hit counts (the pre-redaction report).
# --------------------------------------------------------------------------
_PII_ORACLE = r"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))) AS BIGINT) AS n_email,
       CAST(SUM(len(regexp_extract_all(text, '\+?[0-9][0-9()\- ]{7,}[0-9]'))) AS BIGINT) AS n_phone,
       CAST(SUM(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))) AS BIGINT) AS n_ipv4
FROM documents
GROUP BY source
ORDER BY source
"""


@query("q_text_pii_scan", oracle=_PII_ORACLE, tags=("text", "pii"))
def q_text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pattern scan (emails, phones, IPv4) per source — the audit
    report a redaction pass starts from; patterns are RE2-safe so the
    same regexes run on any engine."""
    from ..operators.text import pii_scan

    docs = pii_scan(load_table(spark, sf_dir, "documents"))
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_email").alias("n_email"),
            F.sum("n_phone").alias("n_phone"),
            F.sum("n_ipv4").alias("n_ipv4"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# TF-IDF — the classic term-weighting pass of a text-indexing pipeline.
# --------------------------------------------------------------------------
_TFIDF_ORACLE = rf"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
  WHERE term <> ''
  GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         CAST(t.tf AS DOUBLE) * n.n_docs / d.df AS tfidf,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id
                            ORDER BY CAST(t.tf AS DOUBLE) * n.n_docs / d.df DESC,
                                     t.term) AS rank
  FROM tf t JOIN df d USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf, rank
FROM scored
WHERE rank <= 3 AND doc_id % 20 = 0
ORDER BY doc_id, rank
"""


@query("q_text_tfidf", oracle=_TFIDF_ORACLE, tags=("text", "tfidf"))
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms. The idf is kept as the exact
    ratio tf * N / df (one double division of integers — bit-identical
    cross-engine; a log-scaled idf would hit libm rounding skew).

    Scale shape: term frequencies partial-aggregate map-side before
    one shuffle on (doc_id, term); document frequencies are a second
    small shuffle on term; the df join broadcasts when the vocabulary
    fits (typical: vocab << corpus), else it's a shuffle join on term
    with AQE handling stopword-ish hot terms. The rank<=3 filter plans
    as WindowGroupLimit (per-partition heaps, no full sort).
    """
    from ..functions.texthash import tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf").cast("double") * F.col("n_docs") / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= 3) & (F.col("doc_id") % 20 == 0))
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
        .orderBy("doc_id", "rank")
    )


# --------------------------------------------------------------------------
# Within-document repetition filter (Gopher duplicate-n-gram rule).
# --------------------------------------------------------------------------
_REPETITION_ORACLE = f"""
WITH g AS (
  SELECT source,
         CASE WHEN len({_TOKS}) >= 10 THEN len({_TOKS}) - 9 ELSE 0 END AS ng,
         CASE WHEN len({_TOKS}) >= 10 THEN
           len(list_distinct(list_transform(range(1, len({_TOKS}) - 8),
               i -> array_to_string(list_slice({_TOKS}, i, i + 9), ' '))))
         ELSE 0 END AS nd
  FROM documents
),
scored AS (
  SELECT source,
         CASE WHEN ng > 0 THEN (1000000 * (ng - nd)) // ng ELSE 0 END AS dup_ppm
  FROM g
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN dup_ppm > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(SUM(dup_ppm) AS BIGINT) AS dup_ppm_sum
FROM scored
GROUP BY source
ORDER BY source
"""


@query("q_text_repetition_filter", oracle=_REPETITION_ORACLE, tags=("text", "quality", "repetition"))
def q_text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition removal (Gopher's duplicate 10-gram share):
    flag docs where >10% of 10-word shingles are repeats — the filter
    that catches boilerplate/template spam exact- and near-dedup both
    miss (the repetition is INSIDE one doc). Shingles stay in an array
    expression (no explode), so the per-doc score is one codegen'd
    projection and the only shuffle carries (source, two int64 sums)."""
    from ..operators.text import repetition_stats

    d = repetition_stats(load_table(spark, sf_dir, "documents"))
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("dup_ngram_ppm") > 100000, 1).otherwise(0)).alias("n_flagged"),
            F.sum("dup_ngram_ppm").alias("dup_ppm_sum"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Training-mixture planning: epochs per source to hit a uniform target.
# --------------------------------------------------------------------------
_MIXTURE_ORACLE = f"""
WITH s AS (
  SELECT source, CAST(SUM(len({_TOKS})) AS BIGINT) AS src_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM s
)
SELECT s.source, s.src_tokens,
       CAST(((tot.total_tokens // tot.n_sources) * 1000000) // s.src_tokens AS BIGINT)
         AS repeat_ppm
FROM s, tot
ORDER BY s.source
"""


@query("q_text_mixture_plan", oracle=_MIXTURE_ORACLE, tags=("text", "sampling", "mixture"))
def q_text_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning: how many epochs (ppm repeat factor) of each
    source yield a UNIFORM token budget per source — the table a
    data-loading config is generated from. One agg to per-source token
    counts, a one-row broadcast of the global budget, integer ppm
    arithmetic end to end. At 100 TB the plan input is the same
    per-source agg, so cost is one scan + one tiny shuffle."""
    from ..operators.text import token_stats

    s = (
        token_stats(load_table(spark, sf_dir, "documents"))
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("src_tokens"))
    )
    tot = s.agg(
        F.sum("src_tokens").alias("total_tokens"), F.count("*").alias("n_sources")
    )
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "src_tokens",
            F.expr("((total_tokens div n_sources) * 1000000) div src_tokens").alias("repeat_ppm"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Deterministic temperature sampling (alpha=0.5 source rebalancing).
# --------------------------------------------------------------------------
_TEMPERATURE_ORACLE = f"""
WITH s AS (
  SELECT source, CAST(SUM(len({_TOKS})) AS BIGINT) AS src_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT source, CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS wgt FROM s
),
tot AS (SELECT CAST(SUM(wgt) AS BIGINT) AS tw FROM w),
r AS (SELECT source, CAST((1000000 * wgt) // tw AS BIGINT) AS rate_ppm FROM w, tot)
SELECT d.source,
       COUNT(*) AS n_sampled,
       CAST(MAX(r.rate_ppm) AS BIGINT) AS rate_ppm
FROM documents d
JOIN r ON r.source = d.source
WHERE (CAST(concat('0x', substring(md5(CAST(d.doc_id AS VARCHAR)),1,7)) AS BIGINT) % 1000000)
      < r.rate_ppm
GROUP BY d.source
ORDER BY d.source
"""


@query("q_sample_temperature", oracle=_TEMPERATURE_ORACLE, tags=("sampling", "mixture"))
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source sampling (rate ∝ sqrt(tokens),
    alpha=0.5): the standard rebalancing that keeps big sources from
    drowning small ones. Rates are exact integer ppm (floor-sqrt
    weights, integer normalization — engine-independent bits), the
    keep/drop decision is a pure hash of doc_id (reproducible under
    any partitioning, any rerun), and the tiny rate table broadcasts
    onto the corpus — the scan never shuffles."""
    from ..operators.sampling import hash_bucket, temperature_rates
    from ..operators.text import token_stats

    docs = load_table(spark, sf_dir, "documents")
    s = (
        token_stats(docs)
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("src_tokens"))
    )
    rates = temperature_rates(s)
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(hash_bucket(F.col("doc_id"), 1_000_000) < F.col("rate_ppm"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"), F.max("rate_ppm").alias("rate_ppm"))
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Token-budgeted mixture selection: materialize the temperature mix.
# --------------------------------------------------------------------------
_TOKEN_BUDGET_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
),
s AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens FROM t GROUP BY source),
w AS (SELECT source, CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS wgt FROM s),
tot AS (SELECT CAST(SUM(wgt) AS BIGINT) AS tw FROM w),
r AS (SELECT source, CAST((1000000 * wgt) // tw AS BIGINT) AS rate_ppm FROM w, tot),
b AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 10 AS budget FROM t),
q AS (SELECT source, (budget * rate_ppm) // 1000000 AS quota FROM r, b),
o AS (
  SELECT t.*, SUM(n_tokens) OVER (
           PARTITION BY source
           ORDER BY {sql_hash_priority('doc_id')}, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT o.doc_id, o.source, o.n_tokens
FROM o JOIN q USING (source)
WHERE o.cum - o.n_tokens < q.quota
ORDER BY o.doc_id
"""


@query(
    "q_sample_token_budget",
    oracle=_TOKEN_BUDGET_ORACLE,
    tags=("sampling", "mixture", "training"),
)
def q_sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted mixture SELECTION — the step q_sample_temperature
    stops short of: rates say how much of each source the mix wants,
    this picks the actual documents. Budget = corpus tokens div 10
    (data-derived, shipped as a one-row broadcast frame — no driver
    round-trip); each source's quota fills in deterministic
    hash-priority order via the two-phase grouped cumsum (source is
    low-cardinality, exactly where a partitioned window would funnel
    each source through one task). The crossing doc lands, so quotas
    fill exactly with <= 1 doc overshoot per source."""
    from ..operators.sampling import sample_to_token_budget, temperature_rates
    from ..operators.text import token_stats

    docs = token_stats(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", F.col("n_tokens").cast("long").alias("n_tokens")
    )
    per_src = docs.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    rates = temperature_rates(per_src)
    budget = docs.agg(F.expr("CAST(sum(n_tokens) AS BIGINT) div 10").alias("budget"))
    return sample_to_token_budget(docs, rates, budget).orderBy("doc_id")


# --------------------------------------------------------------------------
# BPE-style pre-tokenizer counting (regex, not whitespace).
# --------------------------------------------------------------------------
# Disjoint alternatives (letter runs / single digits / single punct), so
# greedy-match semantics agree between Java regex (Spark) and RE2 (DuckDB).
_BPE_PAT = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"

_BPE_ORACLE = rf"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]'))) AS BIGINT)
         AS bpe_tokens,
       CAST(SUM(len({_TOKS})) AS BIGINT) AS ws_tokens
FROM documents
GROUP BY source
ORDER BY source
"""


@query("q_text_bpe_token_count", oracle=_BPE_ORACLE, tags=("text", "tokenizer"))
def q_text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-style pre-tokenizer regex (letter runs,
    single digits, single punctuation — the GPT-2-family pre-split)
    next to the whitespace count: the budget number every mixture /
    packing decision is denominated in. Pure regexp_extract_all column
    expressions — counts happen inside the scan projection, the only
    shuffle carries (source, two int64 counters)."""
    from ..functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PAT), 0))).alias(
                "bpe_tokens"
            ),
            F.sum(F.size(tokens("text"))).alias("ws_tokens"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# PII redaction: the transform half of the scan/redact pair.
# --------------------------------------------------------------------------
_PII_REDACT_ORACLE = r"""
WITH red AS (
  SELECT source, text,
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
             '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g'),
           '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IPV4>', 'g')
         AS redacted
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN redacted <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_redacted,
       CAST(SUM(len(redacted)) AS BIGINT) AS redacted_chars,
       CAST(SUM(len(text)) AS BIGINT) AS original_chars
FROM red GROUP BY source ORDER BY source
"""


@query("q_text_pii_redact", oracle=_PII_REDACT_ORACLE, tags=("text", "pii"))
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus (sibling of ``q_text_pii_scan``):
    every email/phone/ipv4 hit becomes a ``<KIND>`` token, applied in
    fixed pattern order so both engines produce byte-identical
    redacted text — verified here through per-source changed-doc
    counts and exact redacted/original char totals. Pure codegen
    projection, zero shuffles before the final small agg."""
    from ..operators.text import pii_redact

    docs = load_table(spark, sf_dir, "documents")
    red = pii_redact(docs, "text", "redacted")
    return (
        red.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("redacted") != F.col("text"), 1).otherwise(0))
            .cast("long")
            .alias("n_docs_redacted"),
            F.sum(F.length("redacted")).cast("long").alias("redacted_chars"),
            F.sum(F.length("text")).cast("long").alias("original_chars"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Vocabulary statistics: type counts, hapax legomena, Heaps-law ratio.
# --------------------------------------------------------------------------
_VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest({_TOKS}) AS tok FROM documents
),
freq AS (
  SELECT source, tok, COUNT(*) AS f FROM toks WHERE tok <> '' GROUP BY 1, 2
)
SELECT source,
       COUNT(*) AS vocab_size,
       CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
       CAST(SUM(f) AS BIGINT) AS total_tokens,
       CAST((1000000 * COUNT(*)) // SUM(f) AS BIGINT) AS type_token_ppm
FROM freq GROUP BY source ORDER BY source
"""


@query("q_text_vocab_hapax", oracle=_VOCAB_ORACLE, tags=("text", "stats", "quality"))
def q_text_vocab_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile per source: distinct token types,
    hapax legomena (tokens seen exactly once — the Heaps-law tail that
    dominates vocabulary growth and signals OCR noise / boilerplate
    when it collapses), total token mass, and the type/token ratio in
    integer ppm. The lexical-diversity cut of corpus QA that the
    per-doc Gopher rules can't see (they never aggregate across docs).

    Scale shape: explode -> (source, token) hash aggregate with
    map-side partial counts, then a per-source rollup; the only
    shuffle carries distinct (source, token) partials. No windows,
    no sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("f"))
    return (
        freq.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("long").alias("hapax_count"),
            F.sum("f").cast("long").alias("total_tokens"),
            F.expr("(1000000 * count(*)) div sum(f)").cast("long").alias("type_token_ppm"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# BM25 ranked retrieval for a fixed keyword query — integer-exact.
# --------------------------------------------------------------------------
_BM25_TERMS = ("dup", "merge", "window")
_BM25_K1 = 1200  # k1 = 1.2 in milli
_BM25_B = 750  # b = 0.75 in milli
_BM25_TOPK = 20

_BM25_ORACLE = f"""
WITH tok AS (SELECT doc_id, UNNEST({_TOKS}) AS w FROM documents),
lens AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_toks FROM lens),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM tok
  WHERE w IN ('dup', 'merge', 'window') GROUP BY doc_id, w
),
docfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
avgdl AS (SELECT total_toks // n_docs AS adl, n_docs FROM stats),
scored AS (
  SELECT t.doc_id,
         CAST(length(bin(a.n_docs // d.df)) - 1 AS BIGINT)
           * ((t.tf * {_BM25_K1 + 1000} * 1000000)
              // (t.tf * 1000000
                  + {_BM25_K1} * (1000 - {_BM25_B}
                                  + ({_BM25_B} * ((l.dl * 1000) // a.adl)) // 1000)))
           AS term_score
  FROM tf t
  JOIN docfreq d USING (w)
  JOIN lens l USING (doc_id)
  CROSS JOIN avgdl a
),
agg AS (SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS bm25_ppm FROM scored GROUP BY doc_id),
ranked AS (
  SELECT doc_id, bm25_ppm,
         ROW_NUMBER() OVER (ORDER BY bm25_ppm DESC, doc_id) AS rank
  FROM agg
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, bm25_ppm
FROM ranked WHERE rank <= {_BM25_TOPK}
ORDER BY rank
"""


@query("q_text_bm25_search", oracle=_BM25_ORACLE, tags=("text", "search"))
def q_text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for the fixed keyword query ('dup',
    'merge', 'window'): idf = floor(log2(N/df)) bits (integer-exact via
    ``bin()``, 1-bit granularity — common terms weigh 0, the rare term
    dominates, which is BM25 doing its job on this corpus), tf
    saturation k1=1.2 and length normalization b=0.75 carried in
    milli/ppm integer arithmetic so both engines rank identically with
    no float division anywhere.

    Scale shape: term postings are ONE filtered aggregate (the WHERE
    prunes before the shuffle — only query-term rows leave the scan);
    doc lengths are a second aggregate on the same scan; df and avgdl
    are tiny broadcasts. The final top-k is a WindowGroupLimit rank
    over docs that matched at least one term. An inverted index is
    unnecessary — this IS the query-time plan a search engine runs
    per keyword set."""
    from ..functions.texthash import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    lens = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_toks")
    ).select("n_docs", F.expr("total_toks div n_docs").alias("adl"))
    tf = (
        tok.filter(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(docfreq), "w")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                (F.length(F.bin(F.expr("n_docs div df"))) - 1).cast("long")
                * F.expr(
                    f"tf * {_BM25_K1 + 1000} * 1000000 div "
                    f"(tf * 1000000 + {_BM25_K1} * (1000 - {_BM25_B} "
                    f"+ ({_BM25_B} * (dl * 1000 div adl)) div 1000))"
                )
            ).alias("term_score"),
        )
    )
    agg = scored.groupBy("doc_id").agg(F.sum("term_score").cast("long").alias("bm25_ppm"))
    # top-k FIRST via distributed TakeOrdered (per-partition heaps, no
    # global sort); the rank window then runs over <= k rows.
    top = agg.orderBy(F.desc("bm25_ppm"), F.col("doc_id")).limit(_BM25_TOPK)
    from pyspark.sql.window import Window

    # constant partition key: frame is bounded (<= _BM25_TOPK rows after
    # the limit) — silences WindowExec's unpartitioned-window warning so
    # a REAL unbounded one in a bench tail stays visible.
    w = Window.partitionBy(bounded_window_key()).orderBy(F.desc("bm25_ppm"), F.col("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "bm25_ppm")
        .orderBy("rank")
    )


# --------------------------------------------------------------------------
# Python UDTF surface: lateral text chunking as a table function.
# --------------------------------------------------------------------------
_UDTF_CHUNK = 256
_UDTF_ORACLE = f"""
WITH pieces AS (
  SELECT d.doc_id, d.source,
         CAST(u.i AS BIGINT) AS chunk_idx,
         substring(d.text, CAST(u.i * {_UDTF_CHUNK} + 1 AS INT), {_UDTF_CHUNK}) AS piece
  FROM documents d,
       UNNEST(range(0, (length(d.text) + {_UDTF_CHUNK - 1}) // {_UDTF_CHUNK})) AS u(i)
  WHERE length(d.text) > 0
)
SELECT source,
       COUNT(*) AS n_chunks,
       CAST(SUM(length(piece)) AS BIGINT) AS total_chars,
       CAST(SUM(CAST(concat('0x', substring(md5(piece),1,7)) AS BIGINT)) AS BIGINT) AS content_hash_sum
FROM pieces GROUP BY source ORDER BY source
"""


@query("q_text_udtf_chunks", oracle=_UDTF_ORACLE, tags=("text", "udf", "sql"))
def q_text_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function) exercised as a
    lateral chunker: each document row fans out to one row per
    256-char piece inside the SQL engine's lateral-join machinery —
    the surface that lets Python logic produce ROWS, not just columns.
    The md5 content-hash sum proves every piece's exact bytes arrived.
    The same chunking is expressible in pure codegen (see
    q_multimodal_chunking's mapInPandas and the oracle's substring
    arithmetic) — a real pipeline keeps UDTFs for logic that genuinely
    needs Python (parsers, tokenizers); this query pins the plumbing.

    Scale shape: the UDTF runs once per input row inside the scan
    stage (no shuffle to reach it); everything after is one hash
    aggregate. Python-row cost applies — the documented slow path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, piece string")
    class Chunker:
        def eval(self, s: str, n: int):
            if s:
                for i in range(0, len(s), n):
                    yield i // n, s[i : i + n]

    spark.udtf.register("pas_chunker", Chunker)
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.length("text") > 0).createOrReplaceTempView("docs_for_udtf")
    pieces = spark.sql(
        f"SELECT d.source, c.chunk_idx, c.piece "
        f"FROM docs_for_udtf d, LATERAL pas_chunker(d.text, {_UDTF_CHUNK}) c"
    )
    return (
        pieces.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.length("piece")).cast("long").alias("total_chars"),
            F.sum(F.conv(F.substring(F.md5("piece"), 1, 7), 16, 10).cast("long"))
            .cast("long")
            .alias("content_hash_sum"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Model-based quality scoring with FROZEN weights: a linear classifier
# over engineered features, in integer ppm arithmetic. The production
# pattern (fasttext/logreg quality filters ahead of pretraining) with
# the trained coefficients replaced by fixed public ones — the scoring
# plumbing, feature extraction, and band-bucketed routing are the real
# thing; retraining only swaps three constants.
# --------------------------------------------------------------------------
_LOGIT_ORACLE = f"""
WITH f AS (
  SELECT source,
         len({_TOKS}) AS nw,
         {_sql_hits('en')} AS stop_hits,
         length(text) AS nch
  FROM documents
),
s AS (
  SELECT source,
         (400000 * LEAST(nw, 120)) // 120
         + (300000 * LEAST(stop_hits * 1000000 // nw, 400000)) // 400000
         + (300000 * LEAST(nch * 1000 // nw, 6000)) // 6000 AS score_ppm
  FROM f
)
SELECT source,
       CAST(score_ppm // 200000 AS BIGINT) AS band,
       COUNT(*) AS n_docs,
       CAST(MIN(score_ppm) AS BIGINT) AS min_score_ppm,
       CAST(MAX(score_ppm) AS BIGINT) AS max_score_ppm
FROM s GROUP BY source, band ORDER BY source, band
"""


@query("q_text_quality_logit", oracle=_LOGIT_ORACLE, tags=("text", "quality", "model"))
def q_text_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-weight linear quality classifier: three engineered
    features (length credit capped at 120 tokens, stopword-rate credit
    capped at 40%, mean-word-length credit capped at 6 chars) combine
    into a 0..1e6 ppm score, bucketed into 200k-wide bands per source —
    the routing signal a curation pipeline thresholds on. All feature
    scaling is integer div on non-negative values, so the score is
    bit-identical across engines; swapping the frozen coefficients for
    trained ones changes no plan shape.

    Scale shape: pure map-side expression work (no UDF, no explode)
    over one documents scan + one 2-key hash aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS["en"]))
    )
    f = docs.select(
        "source",
        F.size(toks).alias("nw"),
        stop_hits.alias("stop_hits"),
        F.length("text").alias("nch"),
    )
    s = f.select(
        "source",
        (
            F.expr("(400000 * LEAST(nw, 120)) div 120")
            + F.expr("(300000 * LEAST(stop_hits * 1000000 div nw, 400000)) div 400000")
            + F.expr("(300000 * LEAST(nch * 1000 div nw, 6000)) div 6000")
        ).alias("score_ppm"),
    )
    return (
        s.groupBy("source", F.expr("score_ppm div 200000").cast("long").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score_ppm").cast("long").alias("min_score_ppm"),
            F.max("score_ppm").cast("long").alias("max_score_ppm"),
        )
        .orderBy("source", "band")
    )
