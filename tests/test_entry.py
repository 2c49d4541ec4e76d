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


def test_all_queries_return_dataframes(spark, sf_dir, query_frames):
    """Every registry fn builds a plan; driver-window entries must also
    emit scalar-only columns — the driver canonicalizes results with a
    pandas row sort, which cannot handle array/map/struct cells (the
    r2 q_multimodal_frame_offsets failure mode). Frames come from the
    shared session build (conftest.query_frames — the entry module's
    queries() delegates to the same registry; the keyset equality below
    keeps that delegation honest)."""
    from pyspark.sql import types as T

    from pandas_aws_spark.registry import _DRIVER_WINDOW

    window = set(_DRIVER_WINDOW)
    assert set(entry_mod.queries()) == set(query_frames)
    for name, df in query_frames.items():
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


def _evidence_rounds() -> dict[str, int]:
    """name -> LATEST round hash-verified green, recomputed from the
    CORRECTNESS_r*.json files on disk (no hand-maintained lists)."""
    import glob
    import json
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            for name, rec in json.load(fh).items():
                if (
                    rec.get("rows_match")
                    and rec.get("schema_match")
                    and rec.get("hash_match")
                    and not rec.get("err")
                ):
                    latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _externally_verified() -> set[str]:
    """Names hash-verified green in any driver round."""
    return set(_evidence_rounds())


def test_rewritten_entries_expire():
    """_REWRITTEN_THIS_ROUND is self-expiring (r7 verdict ask #3): each
    entry records the round its physical plan was rewritten in, and it
    is only live while its latest on-disk evidence PREDATES that round
    (the old evidence attests a plan that no longer exists). The moment
    the rewrite re-verifies — its own round's CORRECTNESS file lands
    green — this test goes red at round start until the entry is
    cleared, exactly the tripwire that forced the window derivation to
    be automated in r7."""
    from pandas_aws_spark.registry import _REWRITTEN_THIS_ROUND

    latest = _evidence_rounds()
    stale = {
        name: (latest[name], rewritten_in)
        for name, rewritten_in in _REWRITTEN_THIS_ROUND.items()
        if latest.get(name, -1) >= rewritten_in
    }
    assert not stale, (
        f"_REWRITTEN_THIS_ROUND entries already re-verified at/after their "
        f"rewrite round (latest_evidence, rewrite_round): {stale} — clear "
        "them from the mapping; their slots belong to stale re-checks now"
    )


def test_driver_window_curated_and_first():
    """The driver's correctness gate verifies registry slots 1-50 in
    insertion order; pin that the curated window IS those slots and is
    fully oracle-backed."""
    from pandas_aws_spark.registry import _DRIVER_WINDOW, load_registry

    reg = load_registry()
    names = list(reg)
    assert len(_DRIVER_WINDOW) == 50
    assert names[:50] == list(_DRIVER_WINDOW)
    # every window slot is a verified slot: no rows-only entries (PQ and
    # HLL gained real oracles in round 3)
    rows_only = {n for n in _DRIVER_WINDOW if reg[n].oracle is None}
    assert rows_only == set(), f"window entries without oracles: {rows_only}"


def test_driver_window_covers_never_verified():
    """The rotation invariant, checked against disk (r4 verdict ask #3):
    recompute the never-externally-verified set from CORRECTNESS_r*.json
    and assert the current window covers it. Two regimes:

    * never-verified entries fit in the 50-slot window -> ALL of them
      must be in it (remaining slots are re-checks of old evidence);
    * more than 50 -> the window must be entirely never-verified names
      (no slot wasted on a re-check while a queue exists).

    Once the union hits the full registry (r5), the never-verified set
    is empty and the window becomes pure re-checks; regime 2 (below)
    then requires those re-checks to rotate OLDEST-EVIDENCE-FIRST: no
    slot may hold evidence fresher than an entry still waiting outside
    the window (ties by round make the boundary round shareable).
    """
    from pandas_aws_spark.registry import _DRIVER_WINDOW, load_registry

    reg = load_registry()
    latest = _evidence_rounds()
    verified = set(latest)
    # Sanity: the correctness files reference real registry names.
    assert verified & set(reg), "no CORRECTNESS_r*.json evidence found on disk"
    never = [n for n in reg if n not in verified]
    window = set(_DRIVER_WINDOW)
    if len(never) <= len(_DRIVER_WINDOW):
        missing = set(never) - window
        assert not missing, (
            f"{len(missing)} never-externally-verified queries left out of "
            f"the driver window: {sorted(missing)}"
        )
        # Plan-rewritten entries are verify-first obligations like new
        # queries (their old hash evidence attests plans that no longer
        # exist): they must hold a slot and are exempt from the
        # stalest-first comparison below. LIVE rewrites only — an entry
        # whose evidence already postdates its rewrite round has been
        # auto-expired by derive_driver_window() (c3c9f88) and no longer
        # claims a slot; test_rewritten_entries_expire is the SOLE
        # tripwire for the stale-mapping cleanup (r9 verdict ask #1:
        # evidence landing must red exactly one designed test, not two).
        from pandas_aws_spark.registry import _REWRITTEN_THIS_ROUND

        live_rw = {
            n
            for n, rewritten_in in _REWRITTEN_THIS_ROUND.items()
            if latest.get(n, -1) < rewritten_in
        }
        missing_rw = live_rw - window
        assert not missing_rw, (
            f"plan-rewritten entries left out of the window: {sorted(missing_rw)}"
        )
        # Substrate-changed entries (r10 verdict ask #1) are rewrite-
        # class obligations too: their owning procedural module changed
        # this round, so their old evidence attests behavior that no
        # longer exists even though the plan diff is silent. They hold
        # slots and are exempt from the stalest-first comparison.
        from pandas_aws_spark.registry import substrate_rewritten

        sub_rw = substrate_rewritten() & set(reg)
        missing_sub = sub_rw - window
        assert not missing_sub, (
            f"substrate-changed entries left out of the window: "
            f"{sorted(missing_sub)}"
        )
        # regime 2: re-check slots must carry the STALEST evidence —
        # the freshest evidence inside the window may not postdate the
        # stalest evidence left outside it.
        recheck = window & verified - live_rw - sub_rw
        outside = verified & set(reg) - window
        if recheck and outside:
            newest_in = max(latest[n] for n in recheck)
            oldest_out = min(latest[n] for n in outside)
            offenders = sorted(
                n for n in recheck if latest[n] > oldest_out
            )
            assert newest_in <= oldest_out, (
                f"re-check slots hold r{newest_in} evidence while r{oldest_out} "
                f"evidence waits outside the window; fresher-than-necessary "
                f"slots: {offenders}"
            )
    else:
        recheck_slots = window - set(never)
        assert not recheck_slots, (
            f"queue of {len(never)} never-verified queries exceeds the window "
            f"but these slots are spent on re-checks: {sorted(recheck_slots)}"
        )


def test_substrate_module_change_claims_window_slot(monkeypatch):
    """r10 verdict ask #1 (the rewrite-enumeration blind spot): an
    entry whose owning OPERATOR MODULE changed this round must claim a
    driver-window slot even when its optimized plan is byte-identical
    — exactly the class of change (generation layout, commit markers,
    ALTER statements) tools/dump_plans.py cannot see. Simulated by
    patching the round-diff probe to report a genstore-only change."""
    from pandas_aws_spark import registry

    monkeypatch.setattr(
        registry,
        "_round_changed_files",
        lambda: {"pandas_aws_spark/operators/genstore.py"},
    )
    window = registry.derive_driver_window()
    owned = set(
        registry._SUBSTRATE_OWNERSHIP["pandas_aws_spark/operators/genstore.py"]
    )
    missing = owned - set(window)
    assert not missing, (
        f"genstore.py changed but its owned entries hold no window slot: "
        f"{sorted(missing)}"
    )
    # and a diff that touches no substrate module claims nothing
    monkeypatch.setattr(
        registry, "_round_changed_files", lambda: {"pandas_aws_spark/queries/events.py"}
    )
    assert registry.substrate_rewritten() == set()


def test_substrate_ownership_maps_real_modules():
    """Every _SUBSTRATE_OWNERSHIP key is a file that exists (a renamed
    module would silently stop flagging its entries) and every owned
    name is a registered query (validated harder at derive time)."""
    from pandas_aws_spark import registry

    reg = registry.load_registry()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for mod, names in registry._SUBSTRATE_OWNERSHIP.items():
        assert os.path.isfile(os.path.join(root, mod)), f"missing module {mod}"
        unknown = [n for n in names if n not in reg]
        assert not unknown, f"{mod} owns unregistered entries {unknown}"


def test_derive_driver_window_overflow_regimes(monkeypatch):
    """r7 ADVICE (medium): when never-verified + rewritten entries
    exceed the window, the old code sliced the verified pool with a
    NEGATIVE index — appending ~the whole pool and never truncating.
    Pin the fixed semantics on synthetic registries: the window is
    always exactly _WINDOW_SIZE (or the registry size if smaller),
    never-verified entries rank first in registration order, rewritten
    entries wait behind them, and re-checks fill what remains
    oldest-first."""
    import pandas_aws_spark.registry as reg

    def fake_registry(names):
        return {n: None for n in names}

    # regime A: 60 never-verified, 3 rewritten (verified) -> window is
    # the first 50 never-verified, rewritten entries wait.
    never = [f"new_{i:03d}" for i in range(60)]
    rewritten = {f"rw_{i}": 8 for i in range(3)}
    verified = {f"rw_{i}": 7 for i in range(3)}
    monkeypatch.setattr(reg, "REGISTRY", fake_registry(never + list(rewritten)))
    monkeypatch.setattr(reg, "_QUERY_MODULES", ())
    monkeypatch.setattr(reg, "evidence_rounds", lambda: dict(verified))
    monkeypatch.setattr(reg, "_REWRITTEN_THIS_ROUND", rewritten)
    w = reg.derive_driver_window()
    assert len(w) == 50
    assert list(w) == never[:50]

    # regime B: 48 never-verified + 3 rewritten -> 48 + 2 of 3
    # rewritten fit; truncation keeps the window at exactly 50.
    never_b = [f"new_{i:03d}" for i in range(48)]
    monkeypatch.setattr(reg, "REGISTRY", fake_registry(never_b + list(rewritten)))
    w = reg.derive_driver_window()
    assert len(w) == 50
    assert list(w)[:48] == never_b
    assert set(w[48:]) <= set(rewritten)

    # regime C: plenty of room -> never-verified, then rewritten, then
    # oldest-evidence re-checks by (round, name).
    olds = {f"old_{i:02d}": 3 + (i % 2) for i in range(10)}
    monkeypatch.setattr(
        reg, "REGISTRY", fake_registry(["new_000"] + list(rewritten) + list(olds))
    )
    monkeypatch.setattr(reg, "evidence_rounds", lambda: {**verified, **olds})
    w = reg.derive_driver_window()
    assert len(w) == 14  # whole registry fits
    assert w[0] == "new_000"
    assert set(w[1:4]) == set(rewritten)
    recheck = list(w[4:])
    ages = [olds[n] for n in recheck]
    assert ages == sorted(ages), "re-checks must be oldest-evidence-first"


def test_stale_rewrite_reds_only_expiry_tripwire(monkeypatch):
    """r9 verdict ask #1: when a rewrite's own round's evidence lands
    green before the mapping is cleared, exactly ONE test may go red —
    test_rewritten_entries_expire. Pin on a synthetic registry that the
    window derivation auto-expires the stale entry (it takes no slot)
    and that the window-coverage assertions, given the same liveness
    rule, stay green: the stale rewrite is treated as an ordinary
    re-check, subject to oldest-evidence-first like everything else."""
    import pandas_aws_spark.registry as reg

    names = [f"q_{i:02d}" for i in range(6)]
    evidence = {n: 5 + i for i, n in enumerate(names)}  # q_00 stalest
    # q_05 was rewritten in r9 but its r10 evidence already landed:
    # the mapping entry is STALE and must be inert in the window.
    stale_rw = {"q_05": 9}
    evidence["q_05"] = 10
    monkeypatch.setattr(reg, "REGISTRY", {n: None for n in names})
    monkeypatch.setattr(reg, "_QUERY_MODULES", ())
    monkeypatch.setattr(reg, "evidence_rounds", lambda: dict(evidence))
    monkeypatch.setattr(reg, "_REWRITTEN_THIS_ROUND", stale_rw)
    monkeypatch.setattr(reg, "_WINDOW_SIZE", 3)
    w = reg.derive_driver_window()
    # 0 never-verified, 0 LIVE rewrites -> pure oldest-first re-checks;
    # q_05 (freshest evidence) must NOT be pulled in by the stale entry.
    assert list(w) == ["q_00", "q_01", "q_02"]

    # The coverage test's liveness filter: a stale rewrite outside the
    # window is NOT a violation (live_rw is empty), and the stalest-first
    # comparison holds because q_05's slot was never granted.
    latest = evidence
    live_rw = {
        n for n, r in stale_rw.items() if latest.get(n, -1) < r
    }
    assert not live_rw - set(w)
    recheck = set(w) - live_rw
    outside = set(names) - set(w)
    assert max(latest[n] for n in recheck) <= min(latest[n] for n in outside)

    # The expiry tripwire DOES fire for exactly this entry — the one
    # designed red that forces the round-start cleanup commit.
    stale = {
        n: (latest[n], r)
        for n, r in stale_rw.items()
        if latest.get(n, -1) >= r
    }
    assert stale == {"q_05": (10, 9)}


def test_headline_set_is_deliberate():
    """bench.py runs every headline-tagged entry; the set is a
    PROTOCOL artifact (cross-round drift comparisons assume it).
    r10 added q_sim_index_ingest, r12 added q_dedup_cluster_incremental
    — deliberate series breaks recorded in SCALE.md's protocol notes
    (and since r12 bench.py emits headline_legacy_total so the stable
    r4 ten-query series survives membership changes mechanically). Any
    other change must be equally deliberate: update this list AND the
    SCALE.md protocol note."""
    from pandas_aws_spark.registry import load_registry

    headline = sorted(n for n, s in load_registry().items() if s.headline)
    assert headline == [
        "q01_pricing_summary",
        "q03_shipping_priority",
        "q05_region_revenue",
        "q_dedup_cluster_incremental",
        "q_dedup_minhash_lsh",
        "q_events_sessionize",
        "q_events_tumbling_hourly",
        "q_sim_bruteforce_topk",
        "q_sim_index_ingest",
        "q_text_curation_pipeline",
        "q_text_token_stats",
        "q_top_customers_per_segment",
    ]
