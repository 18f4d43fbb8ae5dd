"""Temporal join operators Spark's built-ins don't provide directly:
as-of join and bounded range join, in shuffle-bounded formulations.

The reference has no joins at all (SURVEY.md §2 C — exhaustive absence);
these belong to the extension surface, shaped for 100 TB:

- ``asof_join``: the naive formulation (theta-join on key AND ts<=ts, then
  argmax) explodes to |left| × |matching right| intermediate rows. The
  union + sort + last(ignorenulls) formulation here is linear: ONE shuffle
  on the key, ONE sort per partition, no join blow-up — the standard
  fill-forward trick, and exactly what a time-series engine's as-of does
  physically (merge join on sorted streams).
- ``range_join_pairs``: bounded-interval self-pairing via time-bucket
  equi-join. Each left row joins only its own and the next bucket, so the
  shuffle key is (key, bucket) and candidate volume is bounded by local
  density × 2 buckets, never n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_join_pairs"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right.ts <= left.ts`` and the same key (left join: nulls if none).

    Both inputs are unioned with a side tag, sorted once per key by
    (ts, side) — right rows sort before left rows at equal timestamps, so
    an exactly-simultaneous right row IS matched (``<=`` semantics, the
    same as DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``).
    """
    lcols = left.columns
    tagged_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
        *[F.lit(None).alias(f"__l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_payload],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    unioned = tagged_l.unionByName(tagged_r)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_payload
        ],
    )
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col(f"__f_{c}").alias(c) for c in right_payload],
    )


def range_join_pairs(
    df: DataFrame,
    key: str,
    ts: str,
    payload: list[str],
    max_gap_seconds: int,
) -> DataFrame:
    """Self range join: all ordered pairs (a, b) with the same key and
    ``a.ts < b.ts <= a.ts + max_gap``.

    Bucketing: with bucket width == max_gap, any qualifying b lives in
    a's bucket or the next one. The left side duplicates each row into
    those two bucket keys, then an equi-join on (key, bucket) + the exact
    range filter gives completeness without any theta/cross join.
    """
    gap_us = max_gap_seconds * 1_000_000
    us = F.unix_micros(F.col(ts))
    base = df.select(
        F.col(key).alias("__k"),
        us.alias("__us"),
        *[F.col(c) for c in payload],
    )
    a = base.select(
        "*", F.explode(F.array(us_b := (F.col("__us") / gap_us).cast("long"), us_b + 1)).alias("__bucket")
    )
    b = base.select(
        F.col("__k").alias("__k_b"),
        (F.col("__us") / gap_us).cast("long").alias("__bucket"),
        F.col("__us").alias("__us_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload],
    )
    return (
        a.join(
            b,
            (F.col("__k") == F.col("__k_b"))
            & (a["__bucket"] == b["__bucket"])
            & (F.col("__us_b") > F.col("__us"))
            & (F.col("__us_b") <= F.col("__us") + gap_us),
        )
        .select(
            F.col("__k").alias(key),
            *[F.col(c) for c in payload],
            *[F.col(f"{c}_b") for c in payload],
        )
    )
