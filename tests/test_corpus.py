"""Semantic invariants for the corpus-statistics family (the oracle
hash-parity for these queries is covered by test_oracle_parity)."""

from __future__ import annotations

from pandas_aws_spark.registry import load_registry

REGISTRY = load_registry()


def test_boilerplate_shares_are_valid_ppm(spark, sf_dir):
    rows = REGISTRY["q_text_boilerplate_ngrams"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.sum_boiler_ppm <= r.n_docs * 1_000_000
        assert 0 <= r.n_flagged <= r.n_docs


def test_surprisal_bits_bounded_by_corpus_entropy_ceiling(spark, sf_dir):
    rows = REGISTRY["q_text_unigram_surprisal"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # each token's cost is floor(log2(N/cnt)) in [0, 63]
        assert 0 <= r.total_bits <= r.total_tokens * 63
        assert 0 < r.avg_bits_ppm < 63 * 1_000_000


def test_minhash_error_groups_are_calibrated(spark, sf_dir):
    rows = REGISTRY["q_dedup_minhash_error"].fn(spark, sf_dir).collect()
    assert rows
    by_matches = {r.matches: r for r in rows}
    for m, r in by_matches.items():
        assert 0 <= m <= 8
        assert 0 <= r.avg_exact_ppm <= 1_000_000
        assert 0 <= r.avg_abs_err_ppm <= 1_000_000
    # candidate pairs share at least one full band (2 slots) by construction
    assert min(by_matches) >= 2
    # monotone calibration: more matching slots -> higher exact jaccard
    ms = sorted(by_matches)
    exacts = [by_matches[m].avg_exact_ppm for m in ms]
    assert exacts == sorted(exacts)


def test_markov_rows_normalize_per_prev(spark, sf_dir):
    rows = REGISTRY["q_events_markov_chain"].fn(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    per_prev = defaultdict(int)
    n_next = defaultdict(int)
    for r in rows:
        assert 0 <= r.prob_ppm <= 1_000_000
        per_prev[r.prev] += r.prob_ppm
        n_next[r.prev] += 1
    for prev, total in per_prev.items():
        # floor-division rounding loses < 1 ppm per next-state
        assert 1_000_000 - n_next[prev] <= total <= 1_000_000


def test_kmv_jaccard_exact_when_sets_fit_in_sketch(spark, sf_dir):
    """At sf0.001 every event type has fewer distinct users than k, so
    the sketches are exact and the merged estimate must equal the exact
    Jaccard bit-for-bit."""
    rows = REGISTRY["q_sketch_kmv_jaccard"].fn(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5 event types, 2)
    for r in rows:
        assert r.est_union == r.exact_union
        assert r.kmv_jaccard_ppm == r.exact_jaccard_ppm


def test_importance_sampling_keeps_value_mass(spark, sf_dir):
    """Weighted sampling must keep a larger share of value than of
    rows (that is the point of importance sampling)."""
    rows = load_registry()["q_sample_importance"].fn(spark, sf_dir).collect()
    assert rows
    n = sum(r.n_rows for r in rows)
    kept = sum(r.n_kept for r in rows)
    w = sum(r.sum_w_milli for r in rows)
    kw = sum(r.kept_w_milli for r in rows)
    assert 0 < kept < n
    assert kw / w > kept / n


def test_ab_lift_arms_cover_all_users(spark, sf_dir):
    from pandas_aws_spark.registry import load_table

    r = load_registry()["q_events_ab_lift"].fn(spark, sf_dir).collect()[0]
    total = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert r.users_a + r.users_b == total
    assert 0 <= r.conv_a_ppm <= 1_000_000 and 0 <= r.conv_b_ppm <= 1_000_000
    assert r.lift_ppm == r.conv_b_ppm - r.conv_a_ppm


def test_acf_is_a_valid_correlation(spark, sf_dir):
    rows = load_registry()["q_events_acf_hourly"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # |r1| <= 1 up to the integer-mean approximation at the edges
        assert abs(r.acf1_ppm) <= 1_050_000
        assert r.n_buckets > 1


def test_prefix_filter_join_is_superset_of_lsh(spark, sf_dir):
    """PPJoin is exact (no false negatives), so its pair set must
    contain every pair MinHash-LSH verified at the same threshold."""
    pp = {
        (r.id_a, r.id_b)
        for r in load_registry()["q_dedup_prefix_filter_join"].fn(spark, sf_dir).collect()
    }
    assert pp, "no qualifying pairs at all"
    from pandas_aws_spark.operators.dedup import minhash_near_dup_pairs
    from pandas_aws_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_near_dup_pairs(
            docs, "doc_id", "text", shingle_k=3, n_hashes=8, bands=4, threshold=0.8
        ).collect()
    }
    assert lsh <= pp


def test_prefix_filter_join_corpus_cap_guard(spark, sf_dir, monkeypatch):
    """The exact set-similarity join is the audit path: past
    MAX_EXACT_JOIN_DOCS the in-plan assert must fail the job with a
    clear message pointing at the LSH scale path — a clean capped error
    instead of an unbounded candidate blowup (same contract as the ANN
    brute-force query cap)."""
    import pytest

    from pandas_aws_spark.queries import corpus

    monkeypatch.setattr(corpus, "MAX_EXACT_JOIN_DOCS", 3)
    df = load_registry()["q_dedup_prefix_filter_join"].fn(spark, sf_dir)
    with pytest.raises(Exception, match="MAX_EXACT_JOIN_DOCS"):
        df.collect()


def test_bm25_ranks_rare_term_docs_first(spark, sf_dir):
    from pandas_aws_spark.registry import load_table
    from pyspark.sql import functions as F

    rows = load_registry()["q_text_bm25_search"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    scores = [r.bm25_ppm for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > 0
    # the top hit must actually contain the rare query term
    docs = load_table(spark, sf_dir, "documents")
    top_text = docs.filter(F.col("doc_id") == rows[0].doc_id).collect()[0].text
    assert "dup" in top_text.split()


def test_range_search_matches_bounded_by_candidates(spark, sf_dir):
    rows = load_registry()["q_sim_range_search"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_matches <= r.n_candidates


def test_heatmap_covers_all_events(spark, sf_dir):
    from pandas_aws_spark.registry import load_table

    rows = load_registry()["q_events_heatmap"].fn(spark, sf_dir).collect()
    assert all(1 <= r.dow <= 7 and 0 <= r.hod <= 23 for r in rows)
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == total


def test_funnel_steps_monotone(spark, sf_dir):
    r = load_registry()["q_events_funnel_steps"].fn(spark, sf_dir).collect()[0]
    assert r.n_users >= r.n_step1 >= r.n_step2 >= r.n_step3 >= 0


def test_attribution_linear_conserves_credit(spark, sf_dir):
    rows = load_registry()["q_attribution_linear"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n_touch > 0:
            # each purchase distributes (1e6 div n) * n ppm: within one
            # floor-division remainder of full credit
            per = r.distributed_ppm // r.n_purchases
            assert 1_000_000 - r.n_touch < per <= 1_000_000


def test_lag_features_are_causal(spark, sf_dir):
    """First event of every user must have zero trailing counts —
    checked via the operator shape on a single user."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pandas_aws_spark.registry import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") == 1)
    base = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"))
    first_cnt = (
        ev.select(
            F.count(F.lit(1)).over(base.rangeBetween(-86_400_000_000, -1)).alias("c"),
            F.row_number().over(base.orderBy(F.unix_micros("ts"), "event_id")).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .collect()
    )
    assert first_cnt and first_cnt[0].c == 0


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    rows = load_registry()["q_stats_bootstrap_ci"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ci_low_centi <= r.boot_mean_centi <= r.ci_high_centi
        assert r.ci_low_centi < r.ci_high_centi  # 32 resamples never degenerate here


def test_novelty_first_doc_is_fully_novel(spark, sf_dir):
    rows = load_registry()["q_text_ngram_novelty"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.min_novelty_ppm <= 1_000_000
        assert r.sum_novelty_ppm <= r.n_docs * 1_000_000
