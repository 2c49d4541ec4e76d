"""Generation-versioned commit protocol (operators/genstore.py):
crash-injection for both index compactions, legacy flat-layout
migration, and the tombstone-set scale guards (r9 verdict asks #2/#3).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pandas_aws_spark.operators import genstore
from pandas_aws_spark.operators.annindex import (
    ann_index_topk,
    append_ann_index,
    build_ann_index,
    compact_ann_index,
    delete_from_ann_index,
    read_ann_index,
    write_ann_index,
)
from pandas_aws_spark.operators.dedup import (
    append_dedup_index,
    build_dedup_index,
    compact_dedup_index,
    delete_from_dedup_index,
    indexed_near_dup_pairs,
    read_dedup_index,
    write_dedup_index,
)

SF = "/root/testdata/sf0.001"
_RECIPE = dict(n_centroids=8, m=8, k_codes=16, iters=2)
_SEARCH = dict(nprobe=2, k=10, oversample=5)

BASE = "the quick brown fox jumps over the lazy dog every single day"
NEAR = "the quick brown fox jumps over the lazy dog every single night"


def _splits(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return (
        emb,
        emb.filter(F.col("vec_id") % 4 != 0),
        emb.filter(F.col("vec_id") % 8 == 0),
    )


def _rows(df):
    return [tuple(r) for r in df.orderBy("query_id", "rank").collect()]


def _boom(*_a, **_k):
    raise RuntimeError("injected crash before generation commit")


def test_ann_compaction_crash_before_commit_serves_old_generation(
    spark, tmp_path, monkeypatch
):
    """THE crash window the r9 design documented as open: kill the
    writer between the full-index rewrite and the commit record. The
    reader must keep serving the previous generation (identical counts
    and search results), and a retried compaction must converge to a
    single committed generation with unchanged results."""
    emb, base, b1 = _splits(spark)
    path = str(tmp_path / "idx")
    write_ann_index(build_ann_index(base, **_RECIPE), path)
    append_ann_index(b1, path, batch_id="b1")
    q = emb.filter(F.col("vec_id") < 3)
    n = read_ann_index(spark, path).codes.count()
    before = _rows(ann_index_topk(q, read_ann_index(spark, path), **_SEARCH))

    monkeypatch.setattr(genstore, "commit_generation", _boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_ann_index(spark, path)
    monkeypatch.undo()

    # old generation still committed and serving; the half-written one
    # is uncommitted garbage awaiting GC
    gens = genstore.list_generations(spark, path)
    assert [g for g, ok in gens if ok] == [1]
    assert [g for g, ok in gens if not ok] == [2]
    mid = read_ann_index(spark, path)
    assert mid.codes.count() == n
    assert _rows(ann_index_topk(q, mid, **_SEARCH)) == before

    # retried compaction converges: a FRESH generation number (3, never
    # the crashed dir), exactly one generation remains, results equal
    compact_ann_index(spark, path)
    assert genstore.list_generations(spark, path) == [(3, True)]
    root = genstore.current_root(spark, path)
    assert sorted(os.listdir(f"{root}/codes")) == ["batch=base"]
    after = read_ann_index(spark, path)
    assert after.codes.count() == n
    assert _rows(ann_index_topk(q, after, **_SEARCH)) == before


def test_dedup_compaction_crash_before_commit_serves_old_generation(
    spark, tmp_path, monkeypatch
):
    corpus = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    extra = spark.createDataFrame([(10, NEAR)], "doc_id long, text string")
    path = str(tmp_path / "didx")
    write_dedup_index(build_dedup_index(corpus, "doc_id", "text"), path)
    append_dedup_index(build_dedup_index(extra, "doc_id", "text"), path, batch_id="b1")
    probe = spark.createDataFrame([(20, NEAR)], "doc_id long, text string")

    def matches():
        return {
            (r.id_a, r.id_b)
            for r in indexed_near_dup_pairs(
                probe, read_dedup_index(spark, path), "text", threshold=0.5
            ).collect()
        }

    before = matches()
    assert before  # non-trivial

    monkeypatch.setattr(genstore, "commit_generation", _boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_dedup_index(spark, path)
    monkeypatch.undo()

    assert [g for g, ok in genstore.list_generations(spark, path) if ok] == [1]
    assert matches() == before

    compact_dedup_index(spark, path)
    assert genstore.list_generations(spark, path) == [(3, True)]
    root = genstore.current_root(spark, path)
    assert sorted(os.listdir(f"{root}/packs")) == ["batch=base"]
    assert matches() == before


def test_crash_after_commit_before_gc_highest_generation_wins(spark, tmp_path, monkeypatch):
    """Second crash point: marker written, GC not run. Two committed
    generations coexist; readers deterministically resolve the highest,
    and the next successful base write sweeps the retired one."""
    emb, base, b1 = _splits(spark)
    path = str(tmp_path / "idx")
    write_ann_index(build_ann_index(base, **_RECIPE), path)
    append_ann_index(b1, path, batch_id="b1")
    n = read_ann_index(spark, path).codes.count()

    monkeypatch.setattr(genstore, "gc_generations", _boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_ann_index(spark, path)
    monkeypatch.undo()

    gens = genstore.list_generations(spark, path)
    assert gens == [(1, True), (2, True)]
    assert genstore.current_root(spark, path) == genstore.gen_dir(path, 2)
    idx = read_ann_index(spark, path)
    assert idx.codes.count() == n  # compacted rows, folded batches
    # next compaction GCs the retired generation
    compact_ann_index(spark, path)
    assert genstore.list_generations(spark, path) == [(3, True)]


def test_legacy_flat_layout_reads_appends_and_migrates(spark, tmp_path):
    """A pre-r10 index (artifacts directly under path, no generations)
    stays readable and appendable in place; its first compaction
    migrates it into a committed generation and GCs the flat files."""
    corpus = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    path = str(tmp_path / "flat")
    idx = build_dedup_index(corpus, "doc_id", "text")
    # hand-write the legacy layout (what the pre-r10 writer produced)
    idx.packs.write.parquet(f"{path}/packs/batch=base")
    idx.buckets.write.parquet(f"{path}/buckets/batch=base")
    spark.createDataFrame([idx.params]).write.parquet(f"{path}/params")

    assert genstore.current_root(spark, path) == path
    probe = spark.createDataFrame([(20, NEAR)], "doc_id long, text string")
    got = indexed_near_dup_pairs(
        probe, read_dedup_index(spark, path), "text", threshold=0.5
    )
    assert {(r.id_a, r.id_b) for r in got.collect()} == {(20, 1)}

    # append lands in the flat layout (no generation exists yet)
    extra = spark.createDataFrame([(10, NEAR)], "doc_id long, text string")
    append_dedup_index(build_dedup_index(extra, "doc_id", "text"), path, batch_id="b1")
    assert os.path.isdir(f"{path}/packs/batch=b1")

    compact_dedup_index(spark, path)
    assert genstore.list_generations(spark, path) == [(1, True)]
    assert not os.path.isdir(f"{path}/packs")  # flat artifacts GC'd
    assert not os.path.isdir(f"{path}/params")
    after = indexed_near_dup_pairs(
        probe, read_dedup_index(spark, path), "text", threshold=0.5
    )
    assert {(r.id_a, r.id_b) for r in after.collect()} == {(20, 1), (20, 10)}


def test_tombstone_budget_guard_errors_at_delete_time(spark, tmp_path):
    """r9 verdict ask #3: the broadcast-sized-tombstone-set assumption
    is enforced, not just documented. Exceeding max_tombstone_rows
    raises BEFORE the write (the index keeps serving), naming
    compaction as the way out; compaction then frees the budget."""
    emb, base, _ = _splits(spark)
    path = str(tmp_path / "idx")
    write_ann_index(build_ann_index(base, **_RECIPE), path)
    v1 = base.filter(F.col("vec_id") % 10 == 7)
    delete_from_ann_index(v1, path, batch_id="t1", max_tombstone_rows=1000)
    n_live = read_ann_index(spark, path).codes.count()
    v2 = base.filter(F.col("vec_id") % 10 == 3)
    with pytest.raises(ValueError, match="tombstone budget"):
        delete_from_ann_index(v2, path, batch_id="t2", max_tombstone_rows=2)
    # rejected delete wrote nothing: live view unchanged
    assert read_ann_index(spark, path).codes.count() == n_live
    # ledger-dropping compaction retires the tombstones (the r11
    # default CARRIES them, keeping the budget occupied by design);
    # the budget is free again
    compact_ann_index(spark, path, retain_tombstones=False)
    delete_from_ann_index(
        v2.limit(2), path, batch_id="t2", max_tombstone_rows=2
    )
    assert read_ann_index(spark, path).codes.count() == n_live - 2


def test_dedup_tombstone_budget_guard(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(i, f"{BASE} variant {i}") for i in range(6)], "doc_id long, text string"
    )
    path = str(tmp_path / "didx")
    write_dedup_index(build_dedup_index(corpus, "doc_id", "text"), path)
    ids = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    with pytest.raises(ValueError, match="tombstone budget"):
        delete_from_dedup_index(ids, path, batch_id="t1", max_tombstone_rows=2)
    delete_from_dedup_index(ids, path, batch_id="t1", max_tombstone_rows=3)
    assert read_dedup_index(spark, path).packs.count() == 3


def test_oversized_tombstone_files_warn_at_read(spark, tmp_path, monkeypatch):
    """Read-time metadata guard: legacy/out-of-band tombstones past the
    byte threshold warn (never error — reads must keep serving)."""
    emb, base, _ = _splits(spark)
    path = str(tmp_path / "idx")
    write_ann_index(build_ann_index(base, **_RECIPE), path)
    delete_from_ann_index(
        base.filter(F.col("vec_id") % 10 == 7), path, batch_id="t1"
    )
    monkeypatch.setattr(genstore, "TOMBSTONE_WARN_BYTES", 1)
    with pytest.warns(RuntimeWarning, match="tombstone set is .* bytes"):
        idx = read_ann_index(spark, path)
    assert idx.codes.count() > 0  # still serving


def test_validate_batch_id_rejects_trailing_newline():
    """r9 ADVICE (low): '$' matches before a trailing newline, so
    'b1\\n' used to pass and produce a corrupt partition path."""
    from pandas_aws_spark.operators.dedup import validate_batch_id

    with pytest.raises(ValueError, match="invalid"):
        validate_batch_id("b1\n")
    assert validate_batch_id("b1") == "b1"


def test_empty_input_guards(spark, tmp_path):
    """r9 ADVICE (low): empty corpus -> clear ValueError at build;
    empty batch -> documented no-op at append (nothing written, the
    batch id is not consumed)."""
    emb, base, _ = _splits(spark)
    empty = emb.filter("vec_id < 0")
    with pytest.raises(ValueError, match="corpus is empty"):
        build_ann_index(empty, **_RECIPE)
    path = str(tmp_path / "idx")
    write_ann_index(build_ann_index(base, **_RECIPE), path)
    n = read_ann_index(spark, path).codes.count()
    append_ann_index(empty, path, batch_id="noop")
    assert read_ann_index(spark, path).codes.count() == n
    root = genstore.current_root(spark, path)
    assert not os.path.isdir(f"{root}/codes/batch=noop")


def test_filtered_search_rejects_internal_column_predicates(spark, tmp_path):
    """r9 ADVICE (low): where= may reference only payload columns; a
    predicate touching index internals (cell, codes, the id) changes
    search semantics instead of filtering and must be rejected."""
    emb, base, _ = _splits(spark)
    path = str(tmp_path / "idx")
    payload = base.withColumn("label", (F.col("vec_id") % 3).cast("int"))
    write_ann_index(
        build_ann_index(payload, payload_cols=("label",), **_RECIPE), path
    )
    stored = read_ann_index(spark, path)
    q = emb.filter(F.col("vec_id") < 3)
    ok = ann_index_topk(q, stored, where="label = 1", **_SEARCH)
    assert ok.count() > 0
    for bad in ("cell = 0", "vec_id > 5", "label = 1 AND cell = 0", "no_such > 1"):
        with pytest.raises(ValueError, match="payload"):
            ann_index_topk(q, stored, where=bad, **_SEARCH)


def test_quantizer_staleness_signal_detects_drift(spark, tmp_path):
    """r9 verdict ask #4: the frozen-quantizer drift signal. An
    in-distribution batch scores a coherence ratio near 1.0 against the
    train-time baseline pinned in params; a distribution-shifted batch
    deviates from 1.0 (either direction — here the single-direction
    shift RAISES coherence by collapsing vectors toward one cell) —
    the cheap observable that moves with the silent recall loss
    (magnitude calibrated at 10x in SCALE.md)."""
    from pandas_aws_spark.operators.annindex import quantizer_staleness

    emb, base, b1 = _splits(spark)
    path = str(tmp_path / "idx")
    write_ann_index(build_ann_index(base, **_RECIPE), path)

    clean = quantizer_staleness(b1, path)
    assert clean["base_coherence"] is not None
    assert clean["ratio"] == pytest.approx(1.0, abs=0.1)

    shifted = b1.withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x, i: x + F.when(i % 2 == 0, F.lit(2.0)).otherwise(F.lit(-2.0)),
        ),
    )
    drifted = quantizer_staleness(shifted, path)
    assert abs(drifted["ratio"] - 1.0) > abs(clean["ratio"] - 1.0) + 0.05, (
        clean,
        drifted,
    )
    # occupancy divergence — the monotone trigger statistic (a
    # single-direction shift crowds cells, so TV rises sharply)
    assert clean["occupancy_tv"] is not None
    assert drifted["occupancy_tv"] > clean["occupancy_tv"] + 0.1, (clean, drifted)


def test_rebuild_retrains_on_live_vectors(spark, tmp_path):
    """rebuild_ann_index = the drift trigger's action: retrain the
    quantizers on the current live vectors under the stored recipe,
    committed as a new generation. Search after rebuild is bit-equal to
    an in-memory search whose quantizers were trained on that same live
    corpus; appended and tombstoned state is folded in/out exactly as
    compaction folds it."""
    from pandas_aws_spark.operators.annindex import rebuild_ann_index
    from pandas_aws_spark.operators.pq import ivf_pq_topk

    emb, base, b1 = _splits(spark)
    path = str(tmp_path / "idx")
    write_ann_index(build_ann_index(base, **_RECIPE), path)
    append_ann_index(b1, path, batch_id="b1")
    victims = base.filter(F.col("vec_id") % 10 == 7)
    delete_from_ann_index(victims, path, batch_id="t1")
    live_n = read_ann_index(spark, path).codes.count()

    rebuild_ann_index(spark, path)
    idx = read_ann_index(spark, path)
    # single committed generation, batch dirs folded, tombstones gone
    gens = genstore.list_generations(spark, path)
    assert len(gens) == 1 and gens[0][1]
    assert idx.codes.count() == live_n
    assert os.listdir(f"{genstore.current_root(spark, path)}/codes") == ["batch=base"]
    # tombstoned ids physically absent even though the tombstone dir is gone
    assert idx.codes.filter("vec_id % 10 = 7 AND vec_id < 1000000").count() == 0

    # quantizers really retrained on the live corpus: stored search ==
    # in-memory search trained on exactly the live vectors
    q = emb.filter(F.col("vec_id") < 3)
    got = _rows(ann_index_topk(q, idx, **_SEARCH))
    live = idx.vectors.select("vec_id", "embedding")
    want = _rows(ivf_pq_topk(q, live, **_RECIPE, **_SEARCH))
    assert got == want


def test_rebuild_dedup_index_retunes_banding_from_packs(spark, tmp_path):
    """rebuild_dedup_index re-derives band postings under a NEW
    banding recipe from the stored packs alone — no corpus text scan.
    The retuned stored index must return exactly the matches of an
    index built FRESH from the live text with the same recipe (the
    packs are a sufficient statistic), folded into one committed
    generation with tombstones physically dropped."""
    from pandas_aws_spark.operators.dedup import rebuild_dedup_index

    docs = spark.createDataFrame(
        [(i, f"{BASE} tail {i % 3} marker {i % 2}") for i in range(12)]
        + [(100, BASE), (101, BASE + " x")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "didx")
    write_dedup_index(
        build_dedup_index(docs.filter("doc_id < 8"), "doc_id", "text"), path
    )
    append_dedup_index(
        build_dedup_index(docs.filter("doc_id >= 8"), "doc_id", "text"),
        path,
        batch_id="b1",
    )
    delete_from_dedup_index(
        spark.createDataFrame([(101,)], "doc_id long"), path, batch_id="t1"
    )

    # retune 4x2 -> 8x1 (single-row bands: more candidates, lower
    # effective threshold — the recall-raising operating point);
    # retain_tombstones=False because this test asserts the fully
    # physical fold (the r11 default carries the exclusion ledger)
    rebuild_dedup_index(spark, path, bands=8, retain_tombstones=False)
    idx = read_dedup_index(spark, path)
    assert idx.params["bands"] == 8 and idx.params["n_hashes"] == 8
    root = genstore.current_root(spark, path)
    assert os.listdir(f"{root}/buckets") == ["batch=base"]
    assert not os.path.isdir(f"{root}/tombstones")

    probe = spark.createDataFrame([(500, BASE + " y")], "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in indexed_near_dup_pairs(probe, idx, "text", threshold=0.3).collect()
    }
    # fresh build from the LIVE text (doc 101 deleted) with the SAME recipe
    live = docs.filter("doc_id <> 101")
    fresh = build_dedup_index(live, "doc_id", "text", n_hashes=8, bands=8)
    want = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in indexed_near_dup_pairs(probe, fresh, "text", threshold=0.3).collect()
    }
    assert got == want and got  # identical and non-trivial
    # deleted doc stays gone under the retuned banding
    assert all(b != 101 for _, b, _ in got)


def test_rebuild_dedup_index_rejects_bad_banding(spark, tmp_path):
    from pandas_aws_spark.operators.dedup import rebuild_dedup_index

    corpus = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    path = str(tmp_path / "didx")
    write_dedup_index(build_dedup_index(corpus, "doc_id", "text"), path)
    with pytest.raises(ValueError, match="must divide"):
        rebuild_dedup_index(spark, path, bands=3)


def test_rebuild_dedup_index_has_no_hash_fn_knob(spark, tmp_path):
    """r10 ADVICE: hash_fn looked retunable but the stored packs pin
    the shingle->hash space — a hash_fn 'retune' only rewrote params,
    so later batches hashed into a different space and silently
    matched nothing. The knob is gone; the stored recipe's hash_fn is
    always used."""
    import inspect

    from pandas_aws_spark.operators.dedup import rebuild_dedup_index

    assert "hash_fn" not in inspect.signature(rebuild_dedup_index).parameters
    corpus = spark.createDataFrame(
        [(1, BASE), (2, BASE + " x")], "doc_id long, text string"
    )
    path = str(tmp_path / "didx")
    write_dedup_index(build_dedup_index(corpus, "doc_id", "text"), path)
    with pytest.raises(TypeError):
        rebuild_dedup_index(spark, path, hash_fn="xxhash64")
    # the stored hash_fn survives a banding retune
    rebuild_dedup_index(spark, path, bands=8)
    assert read_dedup_index(spark, path).params["hash_fn"] == "affine"


def test_ledger_ops_reject_reserved_base_batch_id(spark, tmp_path):
    """r11 ADVICE (medium): compaction/rebuild carry the exclusion
    ledger as tombstones/batch=base, and write_tombstone_batch
    overwrites its own batch dir — so a user delete/undelete issued
    with batch_id='base' would clobber the carried exclusions and
    resurrect taken-down ids. All four ledger entry points must
    reserve 'base' the way the appends already do, and the rejection
    must leave the carried ledger intact."""
    from pandas_aws_spark.operators.annindex import undelete_from_ann_index
    from pandas_aws_spark.operators.dedup import undelete_from_dedup_index

    # dedup side: delete -> compact (default CARRIES the ledger) ->
    # base-named ops bounce without touching tombstones/batch=base
    corpus = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    dpath = str(tmp_path / "didx")
    write_dedup_index(build_dedup_index(corpus, "doc_id", "text"), dpath)
    dead = spark.createDataFrame([(1,)], "doc_id long")
    delete_from_dedup_index(dead, dpath, batch_id="t1")
    compact_dedup_index(spark, dpath)  # retain_tombstones=True default
    probe = spark.createDataFrame([(20, BASE)], "doc_id long, text string")

    def _hits():
        return indexed_near_dup_pairs(
            probe, read_dedup_index(spark, dpath), "text", threshold=0.5
        ).count()

    with pytest.raises(ValueError, match="reserved"):
        delete_from_dedup_index(dead, dpath, batch_id="base")
    with pytest.raises(ValueError, match="reserved"):
        undelete_from_dedup_index(dead, dpath, batch_id="base")
    # carried exclusion survived the rejected ops: a re-append of the
    # taken-down doc stays dead (the exact contract the reservation
    # protects)
    append_dedup_index(build_dedup_index(corpus, "doc_id", "text"), dpath,
                       batch_id="re1")
    assert _hits() == 0

    # ann side: the twins reject too (no compaction needed — the
    # reservation is unconditional)
    _, base_emb, _ = _splits(spark)
    apath = str(tmp_path / "aidx")
    write_ann_index(build_ann_index(base_emb, **_RECIPE), apath)
    victims = base_emb.filter(F.col("vec_id") % 10 == 7)
    with pytest.raises(ValueError, match="reserved"):
        delete_from_ann_index(victims, apath, batch_id="base")
    with pytest.raises(ValueError, match="reserved"):
        undelete_from_ann_index(victims, apath, batch_id="base")


def test_vacuum_generations_trims_history_without_rewrite(spark, tmp_path):
    """vacuum_generations (r12): drop retained snapshot generations in
    place — no data rewrite, current generation always survives,
    crashed-uncommitted dirs always go, snapshot reads of vacuumed
    history error with the committed list."""
    from pandas_aws_spark.operators import genstore
    from pandas_aws_spark.operators.annindex import (
        build_ann_index,
        compact_ann_index,
        read_ann_index,
        write_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "idx")
    write_ann_index(
        build_ann_index(emb, n_centroids=8, m=8, k_codes=16, iters=2), path
    )  # gen 1
    compact_ann_index(spark, path, retain_generations=3)  # gen 2, keeps 1
    compact_ann_index(spark, path, retain_generations=3)  # gen 3, keeps 1+2
    assert [g for g, ok in genstore.list_generations(spark, path) if ok] == [1, 2, 3]
    # plus a crashed-uncommitted dir to sweep
    fs, p, jvm = genstore._fs(spark, path)
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(genstore.gen_dir(path, 9)))

    deleted = genstore.vacuum_generations(spark, path, retain=2)
    assert deleted == [1, 9]
    assert [g for g, ok in genstore.list_generations(spark, path) if ok] == [2, 3]
    assert read_ann_index(spark, path, generation=2).codes.count() == emb.count()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="committed history"):
        read_ann_index(spark, path, generation=1)

    # retain clamps at 1: the current generation is never vacuumable
    assert genstore.vacuum_generations(spark, path, retain=0) == [2]
    assert read_ann_index(spark, path).codes.count() == emb.count()
