"""Plan-shape regression gates for the 100 TB design rules.

These tests pin the *physical plan*, not the result: a change that
keeps answers correct but degrades a broadcast join to sort-merge, or
loses filter pushdown, fails here first — on 60k rows instead of on a
1000-executor cluster.
"""

from __future__ import annotations

from pandas_aws_spark.plans.inspect import (
    assert_broadcast_only,
    assert_max_scan_columns,
    assert_pushed_filter,
    codegen_ids,
    join_strategies,
    num_shuffles,
    scans,
)
from pandas_aws_spark.registry import load_registry


def _q(spark, sf_dir, name):
    return load_registry()[name].fn(spark, sf_dir)


def test_q05_all_dims_broadcast(spark, sf_dir):
    """TPC-H Q5 joins lineitem against 5 small tables — every one must
    broadcast; a single sort-merge join here means shuffling the fact
    table once per dim at scale."""
    df = _q(spark, sf_dir, "q05_region_revenue")
    assert_broadcast_only(df)
    assert join_strategies(df)["BroadcastHashJoin"] == 5


def test_q05_pushdown_and_pruning(spark, sf_dir):
    df = _q(spark, sf_dir, "q05_region_revenue")
    # the region filter is the most selective — it must reach the scan
    assert_pushed_filter(df, "region.parquet", "EqualTo(r_name,ASIA)")
    assert_pushed_filter(df, "orders.parquet", "GreaterThanOrEqual(o_orderdate")
    # lineitem has 16 columns; the query needs 4
    assert_max_scan_columns(df, "lineitem.parquet", 4)


def test_q03_pushdown(spark, sf_dir):
    df = _q(spark, sf_dir, "q03_shipping_priority")
    assert_broadcast_only(df)
    assert_pushed_filter(df, "lineitem.parquet", "GreaterThan(l_shipdate")
    assert_pushed_filter(df, "customer.parquet", "EqualTo(c_mktsegment,BUILDING)")
    assert_max_scan_columns(df, "customer.parquet", 2)


def test_q01_scan_pruned_and_codegen(spark, sf_dir):
    """Q1 is scan+agg: it must read only the 7 needed lineitem columns
    and run inside whole-stage codegen."""
    df = _q(spark, sf_dir, "q01_pricing_summary")
    assert_max_scan_columns(df, "lineitem.parquet", 7)
    assert len(codegen_ids(df)) >= 1
    assert_pushed_filter(df, "lineitem.parquet", "LessThanOrEqual(l_shipdate")


def test_minhash_no_cartesian(spark, sf_dir):
    """The LSH candidate join must never degenerate to a cartesian
    product — that is the whole point of LSH."""
    df = _q(spark, sf_dir, "q_dedup_minhash_lsh")
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    assert js.get("BroadcastNestedLoopJoin", 0) == 0


def test_upsert_no_shuffle_explosion(spark, sf_dir):
    """Anti-join + union upsert: bounded shuffle count (target scan,
    update scan, one join)."""
    df = _q(spark, sf_dir, "q_upsert_merge")
    assert num_shuffles(df) <= 6, f"unexpected shuffle count {num_shuffles(df)}"


def test_scan_inspection_surface(spark, sf_dir):
    """scans() extracts location/filters/schema for every file scan."""
    df = _q(spark, sf_dir, "q05_region_revenue")
    infos = scans(df)
    assert len(infos) == 6
    assert all(s.location and s.read_schema for s in infos)


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-partitioned layout + a partition-key filter must prune at
    the FILE INDEX (PartitionFilters), not post-scan — the storage-side
    analogue of the reference's S3 prefix pushdown (s3.py:33-35)."""
    from pyspark.sql import functions as F

    from pandas_aws_spark.plans.inspect import formatted_plan
    from pandas_aws_spark.registry import load_table

    path = str(tmp_path / "orders_by_status")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(path)
    df = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    # the filter must appear in PartitionFilters on the scan line set
    pf_lines = [line for line in plan.splitlines() if "PartitionFilters" in line]
    assert any("o_orderstatus" in line for line in pf_lines), pf_lines
    got = df.count()
    want = (
        load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").count()
    )
    assert got == want


# Allowlisted nested-loop joins: name -> max rows the BROADCAST (build)
# side may carry, with the claim. The cap is not a comment — the audit
# test below EXECUTES each query at sf0.01 and checks the build side's
# actual numOutputRows metric against it, so a regression that swells a
# "one-row scalar" into a corpus-sized broadcast fails here.
NLJ_ALLOWED: dict[str, int] = {
    "q_sim_bruteforce_topk": 16,  # capped query-side broadcast (5 at sf0.01)
    "q_sim_ivf_fullprobe": 16,  # 8 coarse centroids
    "q_sim_ivf_probe2": 16,  # 8 coarse centroids
    "q_dedup_embedding_cosine": 16,  # query-side broadcast (plan may fold it)
    "q22_global_sales_opportunity": 1,  # scalar-avg broadcast
    "q11_important_parts": 1,  # threshold broadcast
    "q_bloom_semi_join": 1,  # bitmap broadcast (the whole point)
    "q_sim_ivf_kmeans": 16,  # trained centroids (same as fullprobe)
    "q_sim_ivf_pq": 16,  # coarse cells + kilobyte codebook fan-out
    "q_sim_ivf_pq_trained": 16,  # same shape, Lloyd-trained coarse cells
    # r15: pq_topk's ADC LUT rides a per-query broadcast map over the
    # 1-row codebook array — the capped-query-side class (3 queries at
    # any sf; the pre-r15 shape hid the same cross inside a broadcast
    # hash join on the exploded (sub, code) keys)
    "q_sim_pq_adc": 16,
    "q_events_backtest_folds": 3,  # 3-row fold-cutoff table x events (range predicate)
    "q_text_tfidf": 1,  # corpus-size broadcast
    "q_text_pmi_bigrams": 1,  # corpus-size broadcast
    "q_sketch_hll_distinct": 1,  # merged-sketch estimate x global exact count
    "q_feature_binning": 1,  # quantile-bounds broadcast
    "q_events_gap_fill": 8,  # 1-row bounds explode x tiny event-type dim
    "q_text_mixture_plan": 1,  # global-budget broadcast
    "q_sample_temperature": 1,  # weight-total broadcast
    "q_sample_token_budget": 1,  # weight-total + 1-row data-derived budget
    "q_customer_rfm": 1,  # NTILE total-count broadcast (two-phase ntile)
    "q_supplier_pareto": 1,  # revenue grand-total broadcast
    "q_drift_tvd": 1,  # time-range-midpoint broadcast
    "q_feature_target_encode": 1,  # global-positive-rate broadcast
    "q_dedup_semantic": 16,  # centroid fan-out (same as other IVF entries)
    "q_sample_negative": 1,  # n_parts-domain broadcast
    "q_text_unigram_surprisal": 1,  # corpus-token-total broadcast
    "q_embed_matryoshka_recall": 16,  # capped query side, twice
    "q_sample_importance": 1,  # max-weight broadcast
    "q_events_ab_lift": 1,  # arm-aggregate x arm-aggregate
    "q_text_bm25_search": 1,  # n_docs/avgdl broadcast
    "q_sketch_join_size": 1,  # three 1-row scalar cross joins
    "q_null_semantics": 1,  # three 1-row contract-aggregate cross joins
    "q_events_funnel_steps": 1,  # three 1-row step-count cross joins
    "q_label_churn": 1,  # observation-horizon broadcast
    "q_sim_knn_classify": 16,  # capped query-side broadcast
    "q_orders_seasonal_index": 1,  # revenue-total broadcast
    "q_dedup_lsh_recall": 1,  # pair-count x pair-count
    "q_sketch_kmv_jaccard": 32,  # |event_types| sketch dim (pairs form post-join)
    "q_dedup_prefix_filter_join": 1,  # corpus-size guard broadcast
    "q_sim_eval_rank_quality": 16,  # capped query side + centroid fan-out (brute + IVF passes)
    "q_sim_index_ingest": 16,  # stored coarse centroids (8 kilobyte rows) fan-out
    "q_sim_index_filtered": 16,  # same stored-centroid fan-out, filtered search
    "q_sim_index_delete": 16,  # same stored-centroid fan-out, three searches
    # drift-signal components: stored-centroid fan-out for the two
    # assignment passes + deliberate 1-row/2-row scalar cross joins
    # (row-count totals attached to the <=2*NCENT-row occupancy frame)
    "q_sim_index_drift_signal": 16,
    "q_sim_index_rebuild": 16,  # stored-centroid fan-out, post-retrain search
    # adaptive rebuild: the retrain derives ceil(live/100) centroids —
    # still a kilobyte broadcast fan-out. SF ASSUMPTION (r14 advice):
    # this gate runs at sf0.001 (sf_dir fixture), where the entry's
    # live set derives 2-5 centroids; the cap's headroom covers the
    # sf0.1 bench sizing (20) too, but the derivation crosses 32 at
    # sf >= ~0.16 — if the gate's scale factor ever grows past that,
    # bump this cap DELIBERATELY from the entry's sizing formula
    # (recommended_n_centroids(live_rows, _ADAPT_TARGET)) rather than
    # treating the failure as a plan regression.
    "q_sim_index_rebuild_adaptive": 32,
    # adaptive BUILD (r15): same derived-centroid fan-out as the
    # adaptive rebuild (ceil(base/100): 4 at sf0.01, 15 at sf0.1),
    # same sf assumption as the cap above
    "q_sim_index_build_adaptive": 32,
    "q_sim_index_snapshot": 16,  # same fan-out, snapshot + current searches
    "q_sim_index_evolved": 16,  # same fan-out, evolved-payload filtered searches
    # r15: ann_index_radius now pins its probe frame by COLLECTION
    # (the centroid fan-out runs eagerly at call time, outside the
    # returned plan), so q_dedup_semantic_decontaminate_indexed no
    # longer plans a BNLJ at all and left this allowlist — the
    # cartesian gate below will flag it if one ever reappears.
}
# r6: q_dedup_simhash (banded 60-bit signature) and q_dedup_ngram_jaccard
# (size-routed LSH-within-block) no longer carry scalar guard broadcasts —
# their scale safety is structural, so they left the NLJ allowlist.


def test_no_accidental_cartesian_anywhere(spark, sf_dir, query_frames):
    """Repo-wide guard: no registered query may plan a CartesianProduct,
    and nested-loop joins are allowed only where intended (the ANN
    scoring passes, which broadcast the small query side on purpose)."""
    from pandas_aws_spark.plans.inspect import join_strategies

    streaming_prefixes = ("q_stream_",)  # streaming plans need execution; covered elsewhere
    io_side_effects = ("q_io_", "q_warehouse_", "q_upsert_", "q_multimodal_byte")
    skipped, bad = [], {}
    for name in sorted(load_registry()):
        if name.startswith(streaming_prefixes) or name.startswith(io_side_effects):
            skipped.append(name)
            continue
        js = join_strategies(query_frames[name])
        if js.get("CartesianProduct", 0):
            bad[name] = dict(js)
        if js.get("BroadcastNestedLoopJoin", 0) and name not in NLJ_ALLOWED:
            bad[name] = dict(js)
    assert not bad, f"unintended cartesian/NLJ plans: {bad}"
    # sanity cap: the skip list must stay the enumerable side-effect set
    # (streaming + io/warehouse writers), not silently absorb new queries.
    # Raised 25 -> 28 for q_io_bucketed_join + q_io_roundtrip_jsonl +
    # q_stream_upsert_foreachbatch; 28 -> 29 for q_io_mixed_prefix_lineage
    # (r8 — a genuine writer: it materializes the mixed-format prefix
    # before auditing it); 29 -> 30 for q_stream_ann_ingest (r9 — a
    # genuine streaming writer: foreachBatch appends micro-batches into
    # the stored ANN index; its final search plan is the same shape the
    # gate-run q_sim_index_ingest entry covers); 30 -> 31 for
    # q_stream_dedup_ingest (r12 — a genuine streaming writer:
    # foreachBatch appends micro-batches into the stored dedup index
    # and folds cluster-label deltas; its read-back label plan is the
    # same shape the gate-run q_dedup_cluster_incremental covers).
    assert len(skipped) < 31


def test_nlj_allowlist_build_sides_are_tiny(spark, sf_dir, query_frames):
    """Executable audit of the NLJ allowlist (r4 verdict ask #7): run
    every allowlisted query and verify each BroadcastNestedLoopJoin's
    build side ACTUALLY broadcast at most its claimed row count — the
    comment claims above become measured facts, so the allowlist cannot
    quietly shelter a corpus-sized broadcast."""
    from pandas_aws_spark.plans.inspect import bnlj_build_side_rows

    bad = {}
    for name, cap in sorted(NLJ_ALLOWED.items()):
        rows = bnlj_build_side_rows(query_frames[name])
        over = [r for r in rows if r > cap]
        if over:
            bad[name] = {"cap": cap, "build_rows": rows}
    assert not bad, f"allowlisted NLJ build sides exceed their claimed caps: {bad}"


def test_no_unpartitioned_window_over_unbounded_input(spark, sf_dir, query_frames):
    """Repo-wide guard (sibling of the cartesian gate above): no
    registered query may plan a Window with an empty partition spec
    over an unbounded input — that funnels the whole input through ONE
    task at cluster scale. Allowlisted sites must be provably bounded,
    with the bound stated here; each flagged plan line must carry the
    expected marker so a new global window can't hide behind an
    existing allowlist entry."""
    from pandas_aws_spark.plans.inspect import unpartitioned_windows

    bounded_ok = {
        # two-phase rank/cumsum summary windows: input is the
        # per-range-partition counts table, <= shuffle-partitions rows
        "q_customer_rfm": "_tp_pid",
        "q_supplier_pareto": "_tp_pid",
        # (every other formerly-allowlisted bounded window — the <= C-row
        # centroid inits, the BM25 top-k rank, the capped-query-side
        # guard counts — now carries bounded_window_key(), a NON-FOLDABLE
        # always-0 key; a plain lit(0) would be stripped by Catalyst's
        # EliminateWindowPartitions. r11 verdict ask #8; only the
        # two-phase summary windows remain listed)
    }
    streaming_prefixes = ("q_stream_",)
    io_side_effects = ("q_io_", "q_warehouse_", "q_upsert_", "q_multimodal_byte")
    bad = {}
    for name in sorted(load_registry()):
        if name.startswith(streaming_prefixes) or name.startswith(io_side_effects):
            continue
        flagged = unpartitioned_windows(query_frames[name])
        if not flagged:
            continue
        marker = bounded_ok.get(name)
        markers = marker if isinstance(marker, tuple) else (marker,)
        if marker is None or not all(
            any(m in line for m in markers) for line in flagged
        ):
            bad[name] = flagged
    assert not bad, f"unpartitioned windows over unbounded input: {bad}"


def test_tfidf_plans_window_group_limit(spark, sf_dir):
    """The rank<=3 filter must push into WindowGroupLimit (per-
    partition top-k heaps) instead of ranking every (doc, term) pair
    and filtering afterwards — at corpus scale that's the difference
    between a bounded and an unbounded window sort."""
    from pandas_aws_spark.plans.inspect import physical_plan

    df = load_registry()["q_text_tfidf"].fn(spark, sf_dir)
    assert "WindowGroupLimit" in physical_plan(df)


def test_q09_joins_part_before_orders(spark, sf_dir):
    """Q9's selective part filter must semi-reduce lineitem BEFORE the
    orders join: in the physical plan the part join appears deeper
    (earlier) than the orders join. At 100 TB this ordering shuffles
    ~4% of lineitem instead of all of it."""
    from pandas_aws_spark.plans.inspect import formatted_plan

    df = load_registry()["q09_product_profit"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    # formatted plan lists scans in join order: lineitem, part, ... orders last
    import re

    scan_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    part_idx = next(i for i, f in enumerate(scan_filters) if "p_name" in f)
    orders_idx = next(i for i, f in enumerate(scan_filters) if "o_orderkey" in f)
    assert part_idx < orders_idx


def test_asof_join_is_single_shuffle(spark, sf_dir):
    """The as-of rewrite must cost ONE exchange on the key (the union
    sweep), never a join explosion: no join nodes at all, exactly one
    shuffle below the window."""
    from pyspark.sql import functions as F

    from pandas_aws_spark.operators.asof import asof_join
    from pandas_aws_spark.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    out = asof_join(buys, clicks, ["user_id"], right_cols=["event_id"])
    assert sum(join_strategies(out).values()) == 0
    assert num_shuffles(out) == 1


def test_gap_fill_dimension_join_is_broadcast(spark, sf_dir):
    """The calendar x event_type dimension join is intentionally a
    nested loop, but it must be the BROADCAST variant — plan-pinned so
    a stats mis-estimate can never pick a non-broadcast path."""
    df = _q(spark, sf_dir, "q_events_gap_fill")
    js = join_strategies(df)
    assert js.get("CartesianProduct", 0) == 0
    assert js.get("BroadcastNestedLoopJoin", 0) >= 1
