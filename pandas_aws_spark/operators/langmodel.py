"""Corpus-trained character-trigram language classifier.

The heuristic stopword ``lang_id`` (operators/text.py) needs no
training; this is the step up a real pipeline takes: *learn* per-
language trigram statistics from a labelled split, then classify by
weighted trigram voting. Train and score are both plain DataFrame
ops — groupBy counts, one broadcastable model table, one join — so the
whole "train a model on 100 TB, apply it to 100 TB" loop is two scans
and two shuffles, no Python in the row path.

Determinism: weights are integer micro-probabilities
(``count * 1e9 div lang_total``) and scores are integer sums, so
training and scoring are exactly reproducible AND replayable by the
DuckDB oracle — no floating point anywhere (the reason this uses
linear voting rather than log-likelihood: portable integer arithmetic
beats a 1-ULP-sensitive ``log`` race across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texthash import char_ngrams

__all__ = ["doc_trigrams", "train_trigram_model", "classify_by_trigrams", "WEIGHT_SCALE"]

WEIGHT_SCALE = 1_000_000_000


def doc_trigrams(df: DataFrame, id_col: str, text_col: str, *extra_cols: str) -> DataFrame:
    """Explode each doc into its lowercase character trigrams
    (multiset — repeats vote repeatedly)."""
    return df.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        F.explode(char_ngrams(F.lower(F.col(text_col)), 3)).alias("g"),
    )


def train_trigram_model(train: DataFrame, langs: list[str], text_col: str = "text") -> DataFrame:
    """Per-trigram integer weights, one column per language:
    ``w_<lang> = count(lang, g) * SCALE div total(lang)``.

    The model is a (trigram -> weights) table of at most |distinct
    trigrams| rows — broadcastable at any corpus size (trigram space is
    bounded), which is what keeps scoring shuffle-free."""
    tri = doc_trigrams(train, "doc_id", text_col, "lang")
    counts = tri.groupBy("lang", "g").agg(F.count("*").alias("c"))
    totals = counts.groupBy("lang").agg(F.sum("c").alias("t"))
    w = counts.join(totals, "lang").select(
        "lang", "g", F.expr(f"c * {WEIGHT_SCALE} div t").alias("w")
    )
    agg = [
        F.sum(F.when(F.col("lang") == lang, F.col("w")).otherwise(F.lit(0))).alias(f"w_{lang}")
        for lang in langs
    ]
    return w.groupBy("g").agg(*agg)


def classify_by_trigrams(
    test: DataFrame, model: DataFrame, langs: list[str], id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Score every doc against every language (sum of its trigrams'
    weights; unseen trigrams vote 0) and pick the argmax, ties to the
    earlier language in ``langs``. Returns (id, score_<lang>...,
    pred_lang)."""
    tri = doc_trigrams(test, id_col, text_col)
    scored = (
        tri.join(F.broadcast(model), "g", "left")
        .groupBy(id_col)
        .agg(
            *[
                F.sum(F.coalesce(F.col(f"w_{lang}"), F.lit(0))).alias(f"score_{lang}")
                for lang in langs
            ]
        )
    )
    pred = None
    for i, lang in enumerate(langs):
        cond = None
        for other in langs[i + 1 :]:
            c = F.col(f"score_{lang}") >= F.col(f"score_{other}")
            cond = c if cond is None else (cond & c)
        branch = F.lit(lang)
        if pred is None:
            pred = F.when(cond, branch) if cond is not None else branch
        else:
            pred = pred.when(cond, branch) if cond is not None else pred.otherwise(branch)
    return scored.withColumn("pred_lang", pred)
