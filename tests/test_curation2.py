"""Unit tests for the round-6 curation queries: duplicated-span
coverage (interval-union semantics on a hand-built fixture),
incremental batch-vs-corpus dedup (asymmetry), backtest folds
(expanding-window invariants)."""

from __future__ import annotations

from pandas_aws_spark.operators.dedup import incremental_near_dup_pairs


def test_incremental_near_dup_is_asymmetric(spark):
    """A batch doc near-identical to an EXISTING doc pairs; two
    identical BATCH docs never pair with each other (the whole point:
    no batch or corpus self-join)."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    existing = spark.createDataFrame(
        [(1, base), (2, "completely different words nothing shared here at all whatsoever")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, base), (11, base), (12, "unrelated content about streams windows and state stores")],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in incremental_near_dup_pairs(
            batch, existing, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert pairs[(10, 1)] == 1.0 and pairs[(11, 1)] == 1.0
    assert all(b == 1 for (_, b) in pairs)  # only existing docs on the right
    assert (10, 11) not in pairs and (11, 10) not in pairs  # no batch self-pairs
    assert all(a != 12 for (a, _) in pairs)  # unrelated batch doc matches nothing


def test_dup_span_coverage_interval_union(spark, tmp_path):
    """Hand-built corpus: doc2 copies tokens 1..12 of doc1, so its
    duplicated 10-token windows start at 1, 2, 3 and the interval
    union [1,12] covers 12 of its 15 tokens. doc1 (the owner) has no
    duplicated spans."""
    from pandas_aws_spark.queries.curation2 import q_text_dup_span_coverage
    from pandas_aws_spark.registry import load_table

    toks1 = [f"w{i}" for i in range(1, 16)]  # w1..w15
    toks2 = toks1[:12] + ["x1", "x2", "x3"]
    docs = spark.createDataFrame(
        [(1, " ".join(toks1), "en", "s1", 0), (2, " ".join(toks2), "en", "s2", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.source: (r.total_tokens, r.covered_tokens)
        for r in q_text_dup_span_coverage(spark, str(tmp_path)).collect()
    }
    assert out["s1"] == (15, 0)
    assert out["s2"] == (15, 12)


def test_backtest_folds_expanding_window(spark, sf_dir):
    """Rolling-origin invariants: train grows monotonically with the
    fold, test slices are disjoint quarters, cold-start users are a
    subset of test users."""
    from pandas_aws_spark.queries.curation2 import q_events_backtest_folds

    rows = sorted(
        (r.fold, r.train_rows, r.test_rows, r.test_users, r.cold_users)
        for r in q_events_backtest_folds(spark, sf_dir).collect()
    )
    assert [r[0] for r in rows] == [1, 2, 3]
    train = [r[1] for r in rows]
    assert train == sorted(train) and train[0] > 0
    for _f, tr, te, tu, cu in rows:
        assert tr >= 0 and te >= 0
        assert 0 <= cu <= tu
    # fold 2's train includes fold 1's train plus fold 1's test slice
    assert rows[1][1] == rows[0][1] + rows[0][2]
