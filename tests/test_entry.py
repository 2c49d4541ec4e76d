"""Smoke tests for the driver contract in __spark_entry__.py."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
)
entry_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and entry_mod)


def test_entry_runs_and_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert len(qs) >= 20
    # every oracle key must have a matching query
    assert set(os_) <= set(qs)


def test_all_queries_return_dataframes(spark, sf_dir):
    """Every registry fn builds a plan; driver-window entries must also
    emit scalar-only columns — the driver canonicalizes results with a
    pandas row sort, which cannot handle array/map/struct cells (the
    r2 q_multimodal_frame_offsets failure mode)."""
    from pyspark.sql import types as T

    from pandas_aws_spark.registry import _DRIVER_WINDOW

    window = set(_DRIVER_WINDOW)
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.schema is not None, name
        if name in window:
            complex_cols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
            ]
            assert not complex_cols, (
                f"{name}: driver-window query outputs non-scalar columns "
                f"{complex_cols}; reshape (explode / concat_ws) for the "
                "driver's row-sort canonicalization"
            )


def test_driver_window_curated_and_first():
    """The driver's correctness gate verifies registry slots 1-50 in
    insertion order; pin that the curated window IS those slots, covers
    every north-star family, and is (almost) fully oracle-backed."""
    from pandas_aws_spark.registry import _DRIVER_WINDOW, load_registry

    reg = load_registry()
    names = list(reg)
    assert len(_DRIVER_WINDOW) == 50
    assert names[:50] == list(_DRIVER_WINDOW)
    # r4 charter: every entry the driver has never hash-verified across
    # r1-r3 must sit in this window (external proof is the bar), led by
    # the flagship IVF-PQ composition; the rest of the window re-checks
    # the rewritten-this-round plans and the oldest (r1-only) evidence.
    never_verified = {
        "q_sim_ivf_pq", "q_stream_curation", "q_profile_orders",
        "q_stratified_sample", "q_events_zscore_outliers",
        "q_events_mad_outliers", "q_events_streaks", "q_events_twap",
        "q_attribution_last_touch", "q_histogram_prices",
        "q_text_pmi_bigrams", "q_graph_triangles", "q_skew_report",
        "q_expectations", "q_events_decayed_engagement",
        "q_feature_binning", "q_text_chunk_overlap",
        "q_revenue_share_ppm", "q_events_wau_rolling",
        "q_supplier_pareto", "q_events_max_drawdown",
        "q_events_path_analysis", "q_events_user_diversity",
    }
    missing = never_verified - set(_DRIVER_WINDOW)
    assert not missing, f"never-verified entries left out of the window: {missing}"
    rewritten_this_round = {"q_customer_rfm", "q_supplier_pareto"}
    assert rewritten_this_round <= set(_DRIVER_WINDOW)
    # every window slot is a verified slot: no rows-only entries (PQ and
    # HLL gained real oracles in round 3)
    rows_only = {n for n in _DRIVER_WINDOW if reg[n].oracle is None}
    assert rows_only == set(), f"window entries without oracles: {rows_only}"
