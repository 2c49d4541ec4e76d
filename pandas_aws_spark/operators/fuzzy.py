"""Blocked fuzzy (edit-distance) entity matching.

An all-pairs ``levenshtein(a, b) <= k`` join is a cartesian product —
O(n*m) string comparisons can never run at 100 TB. The standard
entity-resolution shape is *blocking*: derive a cheap deterministic
block key from each record (here: a caller-supplied expression, e.g.
the digit suffix of an id-like name, a phonetic code, a sorted-token
prefix), equi-join on the block, and evaluate the expensive edit
distance only inside blocks. The join is an ordinary shuffled hash /
broadcast equi-join; Levenshtein runs JVM-side (Catalyst built-in), no
Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_levenshtein_join"]


def blocked_levenshtein_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    left_block: Column,
    right_block: Column,
    max_distance: int,
) -> DataFrame:
    """Equi-join on block keys, keep pairs with edit distance <=
    ``max_distance``; appends the distance as ``edit_distance``."""
    lt = left.withColumn("_block", left_block)
    rt = right.withColumn("_block", right_block)
    joined = lt.join(rt, lt["_block"] == rt["_block"]).drop("_block")
    dist = F.levenshtein(F.col(left_text), F.col(right_text))
    return joined.withColumn("edit_distance", dist.cast("long")).filter(
        F.col("edit_distance") <= max_distance
    )
