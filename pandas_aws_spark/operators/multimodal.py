"""Multimodal (image/audio/video) column plumbing.

Design (north-star extension): media travel as opaque ``binary``
columns with a typed metadata struct alongside; decode / featurize /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages.
The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub — everything Spark-side (schema, partitioning,
batch iteration, Arrow transfer) is real and tested.

Scale notes: binary payloads ride the normal columnar path; keep
``spark.sql.files.maxPartitionBytes`` sized so a partition of blobs
fits executor memory, and prefer pushing metadata-only predicates
(size, mime) BEFORE any mapInPandas stage so pruned rows never cross
the Arrow boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_binary_payload",
    "payload_metadata",
    "decode_image",
    "extract_byte_features",
    "sample_frame_offsets",
    "chunk_payloads",
    "byte_histogram",
]


def with_binary_payload(df: DataFrame, src_col: str, payload_col: str = "payload") -> DataFrame:
    """Attach a binary payload column (here: utf-8 bytes of a source
    column — in production the bytes come from ``binaryFile`` reads or
    object-store URIs) plus a typed metadata struct."""
    payload = F.encode(F.col(src_col), "utf-8")
    meta = F.struct(
        F.length(payload).alias("n_bytes"),
        F.md5(F.col(src_col)).alias("checksum"),
        F.lit("application/octet-stream").alias("mime"),
    )
    return df.withColumn(payload_col, payload).withColumn("media_meta", meta)


def payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata-only projection — the predicate-pushdown-friendly view
    used to prune before any Python stage."""
    return df.select(
        "*",
        F.length(payload_col).alias("payload_bytes"),
    )


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB: image decode requires an imaging library (e.g. Pillow)
    that is not in this environment. The signature and schema contract
    are the real deliverable; the body raises until the dependency
    exists."""
    raise NotImplementedError(
        "image decode needs an imaging library not present in this container; "
        "plug a Pillow/torchvision decoder into extract_byte_features's "
        "mapInPandas shape (schema: doc_id long, width int, height int, pixels binary)"
    )


_FEATURE_SCHEMA = "doc_id long, n_bytes long, byte_sum long, first_byte int, byte_mean double"


def extract_byte_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic stand-in featurizer proving the mapInPandas
    plumbing: per-batch vectorized byte statistics (what a real decoder
    would do with pixel/sample arrays). Arrow moves binary columns as
    bytes objects; numpy does the math per batch, never per row."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            arrs = [np.frombuffer(b, dtype=np.uint8) for b in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [a.size for a in arrs],
                    "byte_sum": [int(a.sum()) for a in arrs],
                    "first_byte": [int(a[0]) if a.size else -1 for a in arrs],
                    "byte_mean": [float(a.mean()) if a.size else 0.0 for a in arrs],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, schema=_FEATURE_SCHEMA)


def sample_frame_offsets(df: DataFrame, n_frames: int = 4, payload_col: str = "payload") -> DataFrame:
    """Deterministic frame-sampling plan for video payloads: evenly
    spaced byte offsets (a real sampler would return frame timestamps;
    the offset math and array schema are the contract)."""
    size = F.length(payload_col)
    # explicit floor: Spark's long cast truncates but DuckDB's rounds,
    # so floor keeps the offsets engine-portable
    offsets = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.floor(size * i / n_frames).cast("long"),
    )
    return df.withColumn("frame_offsets", offsets)


_CHUNK_SCHEMA = "doc_id long, chunk_idx int, n_bytes int, chunk_checksum string"


def chunk_payloads(
    df: DataFrame, *, chunk_bytes: int = 256, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Split each binary payload into fixed-size chunks — the upload /
    shard-for-transport step every blob pipeline needs (multipart
    upload parts, KV-store value limits, embedding-model byte windows).
    One output row per chunk: (id, chunk_idx, n_bytes, md5-of-chunk).

    Arrow-batched ``mapInPandas``: the payload crosses into Python once
    per batch; chunk rows are emitted per batch without ever
    assembling a per-document list (no driver memory, no explode of a
    materialized array). At scale the chunk table is written
    partitioned by a hash of ``id`` so one giant blob cannot skew a
    partition."""
    import hashlib

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n = max(1, -(-len(b) // chunk_bytes)) if b else 0
                for i in range(n):
                    piece = b[i * chunk_bytes : (i + 1) * chunk_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(piece))
                    sums.append(hashlib.md5(piece).hexdigest())
                if not b:  # zero-byte payload still yields one empty chunk row
                    ids.append(doc_id)
                    idxs.append(0)
                    sizes.append(0)
                    sums.append(hashlib.md5(b"").hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_idx": idxs, "n_bytes": sizes, "chunk_checksum": sums}
            )

    return df.select(id_col, payload_col).mapInPandas(op, schema=_CHUNK_SCHEMA)


_HIST_SCHEMA = "doc_id long, n_bytes long, hist array<long>"


def byte_histogram(
    df: DataFrame, *, n_bins: int = 16, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-payload byte-value histogram (n_bins equal-width buckets over
    0..255) via Arrow-batched ``mapInPandas`` — the order-invariant
    content signature a perceptual hash builds on (a real pHash swaps
    the byte histogram for DCT coefficients; the batching, schema, and
    downstream bucketing are identical). numpy ``bincount`` per batch,
    never per-row Python loops over bytes."""
    import numpy as np

    assert 256 % n_bins == 0, "n_bins must divide 256"
    width = 256 // n_bins

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, hists = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                a = np.frombuffer(bytes(payload), dtype=np.uint8)
                h = np.bincount(a // width, minlength=n_bins)[:n_bins]
                ids.append(doc_id)
                ns.append(int(a.size))
                hists.append([int(x) for x in h])
            yield pd.DataFrame({"doc_id": ids, "n_bytes": ns, "hist": hists})

    return df.select(id_col, payload_col).mapInPandas(op, schema=_HIST_SCHEMA)
