"""Deterministic text tokenization / shingling / hashing columns.

All helpers are compositions of JVM-side built-ins (no Python UDFs in
any hot path) and are chosen to be *engine-portable*: every primitive
(md5, ascii, instr, substring, fold) behaves identically in DuckDB, so
dedup/text operators built on these can be oracle-checked exactly.

Hashing note: Spark's native ``hash()``/``xxhash64()`` are faster than
md5 but have no DuckDB equivalent; the operators take a ``hash_fn``
switch so production runs can use xxhash64 while correctness runs use
md5 (see ``operators/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "word_shingles",
    "char_ngrams",
    "seeded_md5",
    "rolling_token_hash",
    "MOD_PRIME",
]

MOD_PRIME = 1_000_000_007


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization (oracle mirror:
    ``string_split_regex(trim(text), '\\s+')``)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.split(F.trim(c), r"\s+")


def word_shingles(toks: Column, k: int = 3) -> Column:
    """k-word shingles joined by a single space; empty array when the
    document has fewer than k tokens (oracle mirror:
    ``list_slice(toks, i, i+k-1)`` over ``range(1, len-k+2)``)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    return F.when(F.size(toks) >= k, sh).otherwise(F.array().cast("array<string>"))


def char_ngrams(c: Column | str, n: int = 5) -> Column:
    """Character n-grams (oracle mirror: ``substring(s, i, n)`` over
    ``range(1, length-n+2)``)."""
    c = F.col(c) if isinstance(c, str) else c
    idx = F.sequence(F.lit(1), F.length(c) - (n - 1))
    grams = F.transform(idx, lambda i: F.substring(c, i, n))
    return F.when(F.length(c) >= n, grams).otherwise(F.array().cast("array<string>"))


def seeded_md5(c: Column | str, seed: int) -> Column:
    """Seed-prefixed md5 — an independent hash family member per seed,
    identical in DuckDB (``md5(seed || '|' || s)``)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.md5(F.concat(F.lit(f"{seed}|"), c))


def rolling_token_hash(toks: Column) -> Column:
    """Polynomial rolling hash over the token stream:
    ``h = fold(tokens, 0, (h, t) -> (h*31 + ascii(t)*7 + len(t)) % p)``.

    Order-sensitive (unlike a set hash) — two docs with the same token
    multiset in different order fingerprint differently. Oracle mirror:
    ``list_reduce(list_prepend(0, vals), (a,b) -> (a*31+b) % p)`` with
    ``vals = list_transform(toks, t -> ascii(t)*7 + length(t))``.
    """
    vals = F.transform(toks, lambda t: F.ascii(t) * 7 + F.length(t))
    return F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * 31 + v) % MOD_PRIME,
    )
