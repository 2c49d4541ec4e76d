"""Unit tests for text-analysis and multimodal operators."""

from __future__ import annotations

import hashlib

import pytest

from pandas_aws_spark.operators.multimodal import (
    decode_image,
    extract_byte_features,
    sample_frame_offsets,
    with_binary_payload,
)
from pandas_aws_spark.operators.text import fingerprint, lang_id, quality_score, token_stats


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the cat and the dog", "en"),
        (2, "el gato y la casa de los perros", "es"),
        (3, "zzz qqq xxx", "xx"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_token_stats(spark, docs):
    out = {r.doc_id: r for r in token_stats(docs).collect()}
    assert out[1].n_tokens == 5
    assert out[1].n_chars_actual == len("the cat and the dog")
    assert out[1].mean_token_len == pytest.approx((3 + 3 + 3 + 3 + 3) / 5)


def test_lang_id_heuristic(spark, docs):
    out = {r.doc_id: r.pred_lang for r in lang_id(docs).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "und"


def test_quality_score_bounds(spark, docs):
    out = quality_score(docs).collect()
    for r in out:
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0


def test_fingerprint_order_sensitivity(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.fp_md5, r.fp_roll) for r in fingerprint(df).collect()}
    assert out[1] == out[3]  # identical text -> identical fingerprints
    assert out[1][1] != out[2][1]  # reordered tokens -> different rolling hash
    assert out[1][0] == hashlib.md5(b"alpha beta gamma").hexdigest()


def test_binary_payload_metadata(spark, docs):
    out = {r.doc_id: r for r in with_binary_payload(docs, "text").collect()}
    text = "the cat and the dog"
    assert bytes(out[1].payload) == text.encode()
    assert out[1].media_meta.n_bytes == len(text.encode())
    assert out[1].media_meta.checksum == hashlib.md5(text.encode()).hexdigest()


def test_extract_byte_features_matches_local_computation(spark, docs):
    payloads = with_binary_payload(docs, "text")
    out = {r.doc_id: r for r in extract_byte_features(payloads).collect()}
    raw = "the cat and the dog".encode()
    assert out[1].n_bytes == len(raw)
    assert out[1].byte_sum == sum(raw)
    assert out[1].first_byte == raw[0]
    assert out[1].byte_mean == pytest.approx(sum(raw) / len(raw))


def test_decode_image_is_clearly_stubbed(spark, docs):
    with pytest.raises(NotImplementedError, match="imaging library"):
        decode_image(with_binary_payload(docs, "text"))


def test_sample_frame_offsets(spark, docs):
    out = {r.doc_id: r.frame_offsets for r in
           sample_frame_offsets(with_binary_payload(docs, "text"), n_frames=4).collect()}
    n = len("the cat and the dog".encode())
    assert out[1] == [0, n // 4, n * 2 // 4, n * 3 // 4]


def test_quality_udf_matches_expression_path(spark, docs):
    """The Pandas-UDF scorer template must reproduce the expression
    path's scores (float tolerance — pandas sums reorder)."""
    from pandas_aws_spark.operators.text import quality_score, quality_score_udf

    a = quality_score(docs).select("doc_id", "quality").toPandas().set_index("doc_id")
    b = quality_score_udf(docs).select("doc_id", "quality").toPandas().set_index("doc_id")
    diff = (a["quality"] - b["quality"]).abs().max()
    assert diff < 1e-12, f"max divergence {diff}"


def test_operators_tolerate_null_and_empty_text(spark):
    """Production corpora have NULL/empty documents; the scalar text
    operators must pass them through (null stats) rather than crash,
    and dedup shingling must yield zero shingles for them."""
    from pandas_aws_spark.operators.dedup import doc_shingle_hashes
    from pandas_aws_spark.operators.text import lang_id, quality_score, token_stats

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "the quick brown fox jumps")],
        "doc_id long, text string",
    )
    stats = token_stats(quality_score(lang_id(df))).collect()
    assert len(stats) == 3  # nothing dropped, nothing thrown
    by_id = {r["doc_id"]: r for r in stats}
    assert by_id[1]["pred_lang"] == "und" or by_id[1]["pred_lang"] is None
    assert by_id[3]["n_tokens"] == 5

    sh = doc_shingle_hashes(df, "doc_id", "text", 3)
    ids = {r["doc_id"] for r in sh.collect()}
    assert ids == {3}, "null/empty docs contribute no shingles"


def test_hash_split_disjoint_exhaustive_and_stable(spark, docs):
    """Splits must partition the corpus (disjoint + exhaustive) and be
    invariant under repartitioning — the property seeded sample() lacks."""
    from pandas_aws_spark.operators.sampling import hash_split

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = hash_split(docs, "doc_id", fr)
    n = docs.count()
    counts = {k: v.count() for k, v in s1.items()}
    assert sum(counts.values()) == n, "exhaustive"
    ids = [set(r["doc_id"] for r in v.select("doc_id").collect()) for v in s1.values()]
    assert not (ids[0] & ids[1]) and not (ids[0] & ids[2]) and not (ids[1] & ids[2])

    s2 = hash_split(docs.repartition(7), "doc_id", fr)
    for k in fr:
        a = {r["doc_id"] for r in s1[k].select("doc_id").collect()}
        b = {r["doc_id"] for r in s2[k].select("doc_id").collect()}
        assert a == b, f"split {k} changed under repartition"


def test_repetition_stats_scores_repeats(spark):
    from pandas_aws_spark.operators.text import repetition_stats

    rep = " ".join(["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 5)
    uniq = " ".join(f"w{i}" for i in range(50))
    short = "too short"
    df = spark.createDataFrame(
        [(1, rep), (2, uniq), (3, short)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["dup_ngram_ppm"] for r in repetition_stats(df).collect()}
    assert got[1] > 500000  # heavy 10-gram repetition
    assert got[2] == 0  # all shingles unique
    assert got[3] == 0  # under 10 tokens -> no shingles, score 0


def test_temperature_rates_flatten_toward_small_sources(spark):
    from pandas_aws_spark.operators.sampling import temperature_rates

    s = spark.createDataFrame(
        [("big", 1000000), ("small", 10000)], "source string, src_tokens long"
    )
    rates = {r["source"]: r["rate_ppm"] for r in temperature_rates(s).collect()}
    # sqrt flattening: big/small token ratio 100x -> rate ratio 10x
    assert 9 <= rates["big"] / rates["small"] <= 11
    assert sum(rates.values()) <= 1000000


def test_byte_histogram_conserves_bytes(spark, sf_dir):
    """Histogram counts must re-sum to payload length per doc."""
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.multimodal import byte_histogram, with_binary_payload
    from pandas_aws_spark.registry import load_table

    docs = with_binary_payload(load_table(spark, sf_dir, "documents").limit(50), "text")
    h = byte_histogram(docs, n_bins=256)
    bad = h.filter(
        F.aggregate("hist", F.lit(0).cast("long"), lambda a, x: a + x) != F.col("n_bytes")
    ).count()
    assert bad == 0


def test_hist_signature_counts_are_consistent(spark, sf_dir):
    from pandas_aws_spark.registry import load_registry

    rows = load_registry()["q_multimodal_hist_signature"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_signatures <= r.n_payloads
        assert r.max_group <= r.n_payloads
        assert 0 <= r.n_collided <= r.n_payloads


def test_quality_logit_bands_partition_corpus(spark, sf_dir):
    """Band arithmetic: scores in [0, 1e6], bands consistent with the
    min/max inside them, doc counts summing to the corpus size."""
    from pandas_aws_spark.registry import load_registry, load_table

    rows = load_registry()["q_text_quality_logit"].fn(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    assert total == load_table(spark, sf_dir, "documents").count()
    for r in rows:
        assert 0 <= r.band <= 5
        assert 0 <= r.min_score_ppm <= r.max_score_ppm <= 1_000_000
        assert r.min_score_ppm // 200_000 == r.band
        assert r.max_score_ppm // 200_000 == r.band


def test_phash_near_dup_within_cap(spark, sf_dir):
    """Verified pairs respect the Hamming cap, and identical payload
    histograms (distance 0) exist in this duplicate-bearing corpus."""
    from pandas_aws_spark.registry import load_registry

    rows = load_registry()["q_multimodal_phash_near_dup"].fn(spark, sf_dir).collect()
    assert rows, "corpus with replicas must produce near-dup pairs"
    for r in rows:
        assert 0 <= r.hamming <= 6
        assert r.n_pairs >= 1
    assert min(r.hamming for r in rows) == 0


def test_pack_documents_global_matches_window_semantics(spark):
    """The partition_col=None path (two-phase cumsum, r11 verdict ask
    #4) must produce the exact pack layout the naive global-window
    cumsum defines: docs in id order, cut when the running total
    crosses the budget."""
    from pandas_aws_spark.operators.text import pack_documents

    rows = [(i, (i * 7919) % 900 + 100) for i in range(1, 201)]  # 100..999 tokens
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: r.pack_id
        for r in pack_documents(df, budget=2048).collect()
    }
    cum, want = 0, {}
    for doc_id, n in rows:  # already in id order
        want[doc_id] = cum // 2048
        cum += n
    assert got == want


def test_pack_documents_global_plan_has_no_data_path_global_window(spark):
    """partition_col=None must NOT plan an unpartitioned window over
    the input rows — only the two-phase summary windows (bounded by
    the partition count, marked _tp_pid) may appear."""
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.text import pack_documents
    from pandas_aws_spark.plans.inspect import unpartitioned_windows

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 512 + 1).alias("n_tokens")
    )
    flagged = unpartitioned_windows(pack_documents(df, budget=2048))
    for line in flagged:
        assert "_tp_pid" in line, f"global window over the data path: {line}"


def test_sample_to_token_budget_fills_quota_deterministically(spark):
    """Each source's selection (taken in hash-priority order) fills its
    token quota: pre-crossing total < quota, post-crossing total >=
    quota (unless the source ran out of docs), never more than one doc
    past the boundary. Rerunning under a different partitioning picks
    the identical doc set."""
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.sampling import (
        sample_to_token_budget,
        temperature_rates,
    )

    rows = [(i, f"s{i % 3}", (i * 37) % 200 + 20) for i in range(1, 301)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    per_src = docs.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    rates = temperature_rates(per_src)
    budget = 5_000
    got = sample_to_token_budget(docs, rates, budget)

    quota = {
        r.source: budget * r.rate_ppm // 1_000_000 for r in rates.collect()
    }
    src_total = {r.source: r.src_tokens for r in per_src.collect()}
    picked = got.groupBy("source").agg(
        F.sum("n_tokens").alias("tok"), F.count("*").alias("n"),
        F.max("n_tokens").alias("max_tok"),
    )
    for r in picked.collect():
        q = quota[r.source]
        if src_total[r.source] >= q:
            assert r.tok >= q, f"{r.source}: quota underfilled {r.tok} < {q}"
            assert r.tok - r.max_tok < q, f"{r.source}: overshot past one doc"
        else:
            assert r.tok == src_total[r.source]

    again = sample_to_token_budget(docs.repartition(7), rates, budget)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, again.collect()))


def test_sample_to_token_budget_plan_has_no_data_path_global_window(spark):
    """The grouped cumsum must come from the two-phase helper — no
    per-source single-task window over the corpus."""
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.sampling import (
        sample_to_token_budget,
        temperature_rates,
    )
    from pandas_aws_spark.plans.inspect import unpartitioned_windows

    docs = spark.range(1, 500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
        (F.col("id") % 100 + 10).alias("n_tokens"),
    )
    per_src = docs.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    out = sample_to_token_budget(docs, temperature_rates(per_src), 10_000)
    for line in unpartitioned_windows(out):
        assert "_tp_pid" in line, f"global window over the data path: {line}"


def test_sample_to_token_budget_rejects_bad_budget_frames(spark):
    """A multi-row budget frame would silently duplicate every quota
    row (and every selected doc); the in-plan guard fails the job
    instead. Multi-column frames fail at build time."""
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.sampling import (
        sample_to_token_budget,
        temperature_rates,
    )

    docs = spark.range(1, 50).select(
        F.col("id").alias("doc_id"),
        F.lit("s0").alias("source"),
        (F.col("id") % 40 + 10).alias("n_tokens"),
    )
    rates = temperature_rates(
        docs.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    )
    two_rows = spark.createDataFrame([(100,), (200,)], "budget long")
    out = sample_to_token_budget(docs, rates, two_rows)
    with pytest.raises(Exception, match="must be exactly one row"):
        out.collect()

    empty = spark.createDataFrame([], "budget long")
    with pytest.raises(Exception, match="must be exactly one row"):
        sample_to_token_budget(docs, rates, empty).collect()

    two_cols = spark.createDataFrame([(100, 1)], "budget long, extra long")
    with pytest.raises(ValueError, match="exactly one column"):
        sample_to_token_budget(docs, rates, two_cols)

    # a budget column named like the guard's old count alias must work
    # (r12 review: the scratch namespace re-alias prevents collisions)
    awkward = spark.createDataFrame([(10_000,)], "_bn long")
    assert sample_to_token_budget(docs, rates, awkward).count() > 0
