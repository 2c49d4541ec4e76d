"""Multimodal-column queries — binary payload plumbing on ``documents``
(the container ships no media libraries, so payloads are utf-8 bytes;
schema, metadata, Arrow batching and mapInPandas shape are the real
deliverable — see operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_byte_features, with_binary_payload
from ..registry import load_table, query

_META_ORACLE = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT md5(text)) AS n_checksums,
       MAX(octet_length(encode(text))) AS max_bytes
FROM documents
GROUP BY source
ORDER BY source
"""


@query("q_multimodal_payload_meta", oracle=_META_ORACLE, tags=("multimodal",))
def q_multimodal_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata struct; aggregation runs on the
    metadata only — the pruning layer that keeps media pipelines from
    dragging blobs through every stage."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"), "text")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("media_meta.n_bytes")).alias("total_bytes"),
            F.countDistinct(F.col("media_meta.checksum")).alias("n_checksums"),
            F.max(F.col("media_meta.n_bytes")).alias("max_bytes"),
        )
        .orderBy("source")
    )


_BYTES_ORACLE = """
SELECT COUNT(*) AS n_docs,
       CAST(SUM(bsum) AS BIGINT) AS total_byte_sum,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       MIN(CASE WHEN length(text) > 0 THEN ord(substring(text, 1, 1)) ELSE -1 END) AS min_first_byte
FROM (SELECT text,
             list_sum(list_transform(range(1, length(text) + 1),
                                     i -> ord(substring(text, CAST(i AS INT), 1)))) AS bsum
      FROM documents)
"""


@query("q_multimodal_byte_features", oracle=_BYTES_ORACLE, tags=("multimodal", "udf"))
def q_multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas featurization over binary payloads
    (deterministic byte statistics standing in for a decoder). The
    corpus is pure ASCII, so the oracle replays the per-byte math with
    codepoint arithmetic — even the Python-UDF path stays value-checked
    (payloads with real media bytes would fall back to rows-only)."""
    docs = with_binary_payload(load_table(spark, sf_dir, "documents"), "text")
    feats = extract_byte_features(docs, id_col="doc_id", payload_col="payload")
    return (
        feats.groupBy()
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("byte_sum").alias("total_byte_sum"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("first_byte").alias("min_first_byte"),
        )
    )


_FRAMES_ORACLE = """
SELECT d.doc_id,
       CAST(r.i AS INT) AS frame_idx,
       CAST(FLOOR(octet_length(encode(d.text)) * r.i / 4) AS BIGINT) AS frame_offset
FROM documents d, (SELECT unnest(range(0, 4)) AS i) r
WHERE d.doc_id % 20 = 0
ORDER BY d.doc_id, frame_idx
"""


@query("q_multimodal_frame_offsets", oracle=_FRAMES_ORACLE, tags=("multimodal", "video"))
def q_multimodal_frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frame-sampling plan for video payloads: evenly
    spaced byte offsets per blob (a real sampler swaps in frame
    timestamps; the offset arithmetic is the contract). Pure column
    math over the metadata — blobs untouched. Output is exploded to
    one (doc_id, frame_idx, frame_offset) row per frame: scalar
    columns only, so any downstream comparator/hasher that sorts rows
    can canonicalize it (array cells are unsortable in pandas)."""
    from ..operators.multimodal import sample_frame_offsets

    docs = with_binary_payload(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0), "text"
    )
    return (
        sample_frame_offsets(docs, n_frames=4)
        .select("doc_id", F.posexplode("frame_offsets").alias("frame_idx", "frame_offset"))
        .orderBy("doc_id", "frame_idx")
    )


# --------------------------------------------------------------------------
# Payload chunking (multipart-upload / transport sharding shape).
# --------------------------------------------------------------------------
_CHUNK_BYTES = 256
_CHUNK_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, octet_length(encode(text)) AS nb FROM documents
),
per_doc AS (
  SELECT doc_id, source, nb,
         CASE WHEN nb = 0 THEN 1 ELSE (nb + {_CHUNK_BYTES - 1}) // {_CHUNK_BYTES} END AS n_chunks,
         CASE WHEN nb = 0 THEN 0
              WHEN nb % {_CHUNK_BYTES} = 0 THEN nb // {_CHUNK_BYTES}
              ELSE nb // {_CHUNK_BYTES} END AS n_full
  FROM d
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
       CAST(SUM(n_full) AS BIGINT) AS n_full_chunks,
       CAST(SUM(nb) AS BIGINT) AS total_bytes
FROM per_doc GROUP BY source ORDER BY source
"""


@query("q_multimodal_chunking", oracle=_CHUNK_ORACLE, tags=("multimodal", "udf"))
def q_multimodal_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every payload into fixed 256-byte pieces through the
    Arrow ``mapInPandas`` chunker (operators/multimodal.chunk_payloads)
    and verify conservation: chunk counts match the ceil arithmetic
    the oracle computes from byte lengths, and chunk bytes re-sum to
    payload bytes exactly — the integrity contract of a multipart
    upload. Joining chunk counts back to doc metadata stays on the
    (doc_id) key — the blob itself never re-crosses a shuffle."""
    from ..operators.multimodal import chunk_payloads

    docs = with_binary_payload(load_table(spark, sf_dir, "documents"), "text")
    chunks = chunk_payloads(docs, chunk_bytes=_CHUNK_BYTES)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("n_bytes") == _CHUNK_BYTES, 1).otherwise(0)).alias("n_full"),
        F.sum("n_bytes").alias("chunk_bytes"),
    )
    return (
        docs.select("doc_id", "source")
        .join(per_doc, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chunks").cast("long").alias("n_chunks"),
            F.sum("n_full").cast("long").alias("n_full_chunks"),
            F.sum("chunk_bytes").cast("long").alias("total_bytes"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Shard manifest: pack payloads into size-bounded shards (WebDataset
# layout) and emit the per-shard manifest.
# --------------------------------------------------------------------------
_SHARD_BYTES = 2048
_SHARD_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, octet_length(encode(text)) AS nb FROM documents
),
c AS (
  SELECT source, doc_id, nb,
         SUM(nb) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
),
s AS (
  SELECT source, doc_id, nb,
         CAST((cum - nb) // {_SHARD_BYTES} AS BIGINT) AS shard_id FROM c
)
SELECT source, shard_id,
       COUNT(*) AS n_items,
       CAST(SUM(nb) AS BIGINT) AS shard_bytes,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("q_multimodal_shard_manifest", oracle=_SHARD_ORACLE, tags=("multimodal", "packing", "io"))
def q_multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-bounded shard packing for binary payloads — the WebDataset /
    tar-shard layout step of a multimodal training pipeline: lay each
    source's payloads out in id order, cut at a 2 KiB byte budget, and
    emit the shard manifest (item count, byte size, id range) a
    downstream dataloader consumes. Shards land in
    [budget, budget + max_item); one pathological item only ever
    overflows its own shard.

    Scale shape: the per-source byte cumsum runs through the grouped
    two-phase pattern (operators/twophase.distributed_grouped_cumsum)
    — range-partition on (source, doc_id) keeps a 10^9-item source
    spread across many parallel slices instead of one straggler task,
    with kilobyte broadcast prefix offsets; then one hash aggregate
    to manifest rows. The payload bytes themselves never shuffle —
    only (source, doc_id, n_bytes) metadata."""
    from ..operators.twophase import distributed_grouped_cumsum

    docs = with_binary_payload(load_table(spark, sf_dir, "documents"), "text")
    meta = docs.select(
        "source", "doc_id", F.col("media_meta.n_bytes").alias("nb")
    )
    cum = distributed_grouped_cumsum(
        meta, "source", ["doc_id"], "nb", out="cum"
    )
    shards = cum.select(
        "source",
        "doc_id",
        "nb",
        F.expr(f"(cum - nb) div {_SHARD_BYTES}").alias("shard_id"),
    )
    return (
        shards.groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("nb").cast("long").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "shard_id")
    )


# --------------------------------------------------------------------------
# Histogram-signature near-dup bucketing over binary payloads.
# --------------------------------------------------------------------------
_PHASH_ORACLE = """
WITH b AS (
  SELECT doc_id, source,
         list_transform(range(1, length(text) + 1),
                        i -> ord(substring(text, CAST(i AS INT), 1))) AS byt,
         octet_length(encode(text)) AS nb
  FROM documents
  WHERE octet_length(encode(text)) > 0
),
h AS (
  SELECT doc_id, source, nb,
         list_transform(range(0, 256), bin -> len(list_filter(byt, x -> x = bin))) AS hist
  FROM b
),
sig AS (
  SELECT doc_id, source,
         md5(array_to_string(list_transform(hist, c -> least(7, (c * 32) // nb)), ',')) AS signature
  FROM h
),
grp AS (
  SELECT source, signature, COUNT(*) AS n_in_group FROM sig GROUP BY source, signature
)
SELECT source,
       COUNT(*) AS n_signatures,
       CAST(SUM(n_in_group) AS BIGINT) AS n_payloads,
       CAST(MAX(n_in_group) AS BIGINT) AS max_group,
       CAST(SUM(CASE WHEN n_in_group >= 2 THEN n_in_group ELSE 0 END) AS BIGINT) AS n_collided
FROM grp GROUP BY source ORDER BY source
"""


@query("q_multimodal_hist_signature", oracle=_PHASH_ORACLE, tags=("multimodal", "dedup", "udf"))
def q_multimodal_hist_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-invariant near-dup bucketing for binary payloads: a 256-bin
    byte histogram (Arrow mapInPandas, numpy bincount) quantized to 3
    bits per bin (share steps of 1/32) -> an md5 signature;
    payloads sharing a signature are near-dup candidates even when
    their bytes are re-ordered — the failure mode sequence hashes
    (simhash/minhash over shingles) cannot catch. A real perceptual
    hash swaps the histogram for DCT coefficients; every stage after
    the featurizer is unchanged.

    Scale shape: the payload crosses the Arrow boundary exactly once;
    only (doc_id, 256 longs) shuffle; candidate grouping is one hash
    aggregate on the signature — never pairwise."""
    from ..operators.multimodal import byte_histogram

    docs = with_binary_payload(load_table(spark, sf_dir, "documents"), "text")
    hist = byte_histogram(docs.filter(F.length("payload") > 0), n_bins=256)
    sig = hist.join(
        load_table(spark, sf_dir, "documents").select("doc_id", "source"), "doc_id"
    ).select(
        "source",
        F.expr(
            "md5(array_join(transform(hist,"
            " c -> cast(least(7L, c * 32 div n_bytes) as string)), ','))"
        ).alias("signature"),
    )
    grp = sig.groupBy("source", "signature").agg(F.count(F.lit(1)).alias("n_in_group"))
    return (
        grp.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_signatures"),
            F.sum("n_in_group").cast("long").alias("n_payloads"),
            F.max("n_in_group").cast("long").alias("max_group"),
            F.sum(F.when(F.col("n_in_group") >= 2, F.col("n_in_group")).otherwise(0))
            .cast("long")
            .alias("n_collided"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Tolerant multimodal near-dup: 60-bit b-bit-MinHash signature over
# byte 4-grams, banded Hamming join. q_multimodal_hist_signature
# groups payloads whose quantized byte DISTRIBUTIONS match exactly —
# which degenerates when a corpus shares one distribution (measured:
# on this corpus every doc landed in one bucket at 10x data). This
# query hashes CONTENT windows instead: bit j = parity of the minimum
# seed-j hash over all 4-byte windows (b-bit MinHash), so unrelated
# payloads get independent random bits while near-dups share most of
# them — buckets stay populated by similarity, not by corpus-wide
# distribution shape.
# --------------------------------------------------------------------------
_PHASH_NEARDUP_ORACLE = """
WITH doc AS (SELECT doc_id, text FROM documents WHERE length(text) >= 4),
grams AS (
  SELECT doc_id,
         list_transform(range(1, length(text) - 2), i ->
           CAST(concat('0x', substring(md5(substring(text, CAST(i AS INT), 4)), 1, 15))
                AS BIGINT) & 1073741823) AS hs
  FROM doc
),
sig AS (
  SELECT doc_id, list_sum(list_transform(range(0, 60), j ->
    CASE WHEN list_min(list_transform(hs, h ->
        (((CAST(j AS BIGINT) * 2654435761) % 1073741789 | 1) * h
         + CAST(j AS BIGINT) + 1) % 1073741789)) % 2 = 1
    THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END)) AS sig
  FROM grams
),
bands AS (
  SELECT doc_id, sig, b.band,
         (sig >> CAST(15 * b.band AS INT)) & 32767 AS bits
  FROM sig, (SELECT UNNEST(range(0, 4)) AS band) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, a.sig AS sig_a, c.doc_id AS id_b, c.sig AS sig_b
  FROM bands a JOIN bands c
    ON a.band = c.band AND a.bits = c.bits AND a.doc_id < c.doc_id
),
verified AS (
  SELECT bit_count(xor(sig_a, sig_b)) AS hamming
  FROM cand
  WHERE bit_count(xor(sig_a, sig_b)) <= 6
)
SELECT CAST(hamming AS BIGINT) AS hamming, COUNT(*) AS n_pairs
FROM verified GROUP BY hamming ORDER BY hamming
"""


@query(
    "q_multimodal_phash_near_dup",
    oracle=_PHASH_NEARDUP_ORACLE,
    tags=("multimodal", "dedup"),
)
def q_multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant near-dup detection for opaque payloads: a 60-bit b-bit
    MinHash signature — each 4-byte content window is md5-hashed ONCE
    into a 30-bit value, 60 universal-hash family members
    h_j(x) = (a_j x + j + 1) mod p derive the per-seed minima from it
    (integer ops, not 60 md5 passes), and bit j is the parity of
    min_j. Tokenizer-free, so it works on any modality's byte stream
    (this ASCII corpus makes char windows == byte windows). Banded
    into 4 x 15-bit LSH bands, candidates ONLY from band equality,
    verified at Hamming distance <= 6 (bit_count of xor, one JVM
    integer op per pair). Reports pair counts per verified distance —
    the histogram a threshold sweep reads.

    Why not the byte-histogram signature next door: distribution-shape
    features collapse when the whole corpus shares one byte
    distribution — measured on this corpus, EVERY doc fell into a
    single band bucket at 10x data (4.5e9 candidate pairs, an
    accidental all-pairs). Content-window MinHash bits are independent
    across unrelated docs by construction: measured bucket max 11 docs
    at sf0.01 and ~1k (a true replica family) at 10x, candidate work
    scaling with real near-dup density instead of corpus^2.

    Scale shape: signatures are one map-side pass (60 hash folds over
    the gram array, no shuffle, no UDF); the candidate join shuffles
    8-byte (band, bucket) keys; verification is integer xor/popcount.
    Production hygiene for adversarial corpora: cap or sample buckets
    past a size threshold (non-informative by definition) — the LSH
    guard the text-side minhash operators document."""
    from functools import reduce as _reduce
    from operator import add as _add

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 4)
    # one md5 per 4-byte window, exploded map-side; the 60 family
    # members become 60 CODEGEN'd min-aggregates (interpreted
    # higher-order-function folds over the gram array measured ~15x
    # slower for the same arithmetic), partially aggregated before the
    # doc_id shuffle so ~one row per doc moves
    g = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 3), i -> "
                "CAST(conv(substring(md5(substring(text, i, 4)), 1, 15), 16, 10) AS BIGINT) "
                "& 1073741823)"
            )
        ).alias("h"),
    )
    P = 1073741789
    mins = g.groupBy("doc_id").agg(
        *[
            F.min((F.lit((j * 2654435761) % P | 1) * F.col("h") + F.lit(j + 1)) % P).alias(
                f"m{j}"
            )
            for j in range(60)
        ]
    )
    sig = mins.select(
        "doc_id",
        _reduce(
            _add,
            [
                F.when(F.col(f"m{j}") % 2 == 1, F.lit(1 << j)).otherwise(F.lit(0))
                for j in range(60)
            ],
        )
        .cast("long")
        .alias("sig"),
    )
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn("bits", F.expr("shiftright(sig, 15 * band) & 32767"))
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bits"
    )
    c = bands.select(
        F.col("doc_id").alias("id_b"),
        F.col("sig").alias("sig_b"),
        F.col("band").alias("band_b"),
        F.col("bits").alias("bits_b"),
    )
    cand = (
        a.join(
            c,
            (F.col("band") == F.col("band_b"))
            & (F.col("bits") == F.col("bits_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "sig_a", "id_b", "sig_b")
        .distinct()
    )
    verified = cand.select(
        F.expr("bit_count(sig_a ^ sig_b)").cast("long").alias("hamming")
    ).filter(F.col("hamming") <= 6)
    return (
        verified.groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )
