"""Skew-mitigation join helper: explicit salting.

Spark's AQE skew-join handles moderate skew automatically (enabled in
session.py); explicit salting is the deterministic heavy-artillery version
for pathological keys — and the only option when the skewed side feeds a
windowed/stateful op where AQE cannot split partitions.

(First choice for a genuinely small right side is still ``F.broadcast`` —
salting exists for when both sides are too big to broadcast AND the join
key is too skewed to shuffle naively.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` that spreads each hot key across ``salts``
    reducers.

    Left rows get a deterministic per-row salt (hash of the whole row, NOT
    of the key — same-key rows must scatter); the right side is replicated
    ``salts`` times with an exploded salt column; the join key becomes
    (key, salt). Correctness is unchanged for inner/left joins: every left
    row still meets every matching right row exactly once. Shuffle volume:
    left unchanged, right × salts — choose ``salts`` ≈ hot-key partition
    excess, not larger.
    """
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salts))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")
