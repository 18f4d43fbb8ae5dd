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

__all__ = [
    "asof_join",
    "range_join_pairs",
    "cogroup_attribution",
    "funnel_stage_counts",
    "funnel_stage_counts_partitioned",
    "retention_cohorts",
]


def funnel_stage_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-sequence funnel: how many users reached step 1, then step 2
    strictly after their matched step 1, and so on (the product-analytics
    funnel; greedy earliest-match semantics, which equals the staged
    ``min(ts) > previous`` formulation and is what the oracle computes).

    One shuffle total: events filtered to funnel steps groupBy the user,
    each user's (few) step events fold in timestamp order through a
    codegen'd ``aggregate`` state machine — no join per stage, no repeated
    passes over the events table. The per-user partial lists are bounded
    by that user's step-event count, not corpus size. The stage→count
    rollup at the end runs over one row per user.

    Returns ``(stage, step_name, users_reached)`` — one row per step,
    ``users_reached`` counting users whose fold reached at least that
    stage.
    """
    ev = events.filter(F.col(type_col).isin(*steps)).select(
        F.col(user_col).alias("__u"),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        F.col(type_col).alias("__t"),
    )
    per_user = ev.groupBy("__u").agg(
        F.array_sort(F.collect_list(F.struct("__us", "__t"))).alias("__evs")
    )
    zero = F.struct(
        F.lit(0).alias("stage"), F.lit(-(2**62)).cast("long").alias("last_us")
    )

    def step_fold(acc, x):
        out = None
        for i, name in enumerate(steps):
            cond = (
                (acc.getField("stage") == i)
                & (x.getField("__t") == name)
                & (x.getField("__us") > acc.getField("last_us"))
            )
            adv = F.struct(
                F.lit(i + 1).alias("stage"),
                x.getField("__us").alias("last_us"),
            )
            out = F.when(cond, adv) if out is None else out.when(cond, adv)
        return out.otherwise(acc)

    reached = per_user.select(
        F.aggregate("__evs", zero, step_fold).getField("stage").alias("stage")
    )
    return _stage_rollup(reached, steps)


def _stage_rollup(reached: DataFrame, steps: list[str]) -> DataFrame:
    """(stage) per user → one row per step with users_reached counts.
    Right join FROM the (broadcast, |steps|-row) step table so a stage
    nobody reached still emits its row with users_reached = 0 (count of
    matched rows, not of join rows). Shared by both funnel strategies —
    the rollup must stay identical for the shared oracle to hold."""
    stage_tbl = reached.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "stage INT, step_name STRING"
    )
    return (
        reached.join(
            F.broadcast(stage_tbl),
            reached["stage"] >= stage_tbl["stage"],
            "right",
        )
        .groupBy(stage_tbl["stage"].alias("stage"), "step_name")
        .agg(F.count(reached["stage"]).cast("bigint").alias("users_reached"))
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active date, counted
    on each later active date as a day offset — the classic growth-
    analytics triangle.

    Everything is pre-aggregated before any join: active days are
    ``distinct (user, date)``, cohorts are a ``min`` over that, and the
    user-keyed shuffle join runs aggregated-side × aggregated-side (never
    raw events × raw events). All shuffles key on ``user_id`` /
    ``(cohort_date, day_offset)`` — uniform keys at any scale.
    """
    days = events.select(
        F.col(user_col).alias("__u"), F.to_date(F.col(ts_col)).alias("__d")
    ).distinct()
    first = days.groupBy("__u").agg(F.min("__d").alias("cohort_date"))
    return (
        days.join(first, "__u")
        .groupBy(
            "cohort_date",
            F.datediff(F.col("__d"), F.col("cohort_date"))
            .cast("int")
            .alias("day_offset"),
        )
        .agg(F.count_distinct(F.col("__u")).cast("bigint").alias("users"))
    )


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


def funnel_stage_counts_partitioned(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    chunk_us: int = 86_400_000_000,
) -> DataFrame:
    """Skew-resilient funnel — same greedy strict-after semantics as
    :func:`funnel_stage_counts`, computed hierarchically so no single
    task ever materializes a power user's full event list.

    The greedy fold is a finite state machine, and FSM application over
    a TIME-ORDERED chunk of events is a function (entry stage → exit
    stage); function composition is associative, so the fold
    parallelizes as: (1) per (user, time-chunk), one pass computes the
    chunk's full transition TABLE — the exit state for each of the
    |steps|+1 possible entry stages (a constant-size vector, however
    many events the chunk holds); (2) per user, compose the (few)
    chunk tables in time order. Correctness of dropping ``last_us``
    across chunks: chunking by ``floor(us / chunk_us)`` puts equal
    timestamps in one chunk, so every event in a later chunk is
    STRICTLY after every event in an earlier one and the cross-chunk
    strict-after condition holds automatically; within a chunk each
    track keeps its own in-chunk last-match time (NULL = no in-chunk
    match yet, i.e. entry state from an earlier chunk — always
    strictly earlier).

    Shuffle profile: groupBy (user, chunk) then groupBy user. Per-task
    state is bounded by one user's events in ONE chunk and by the
    number of chunks — both tunable via ``chunk_us`` — where the
    single-fold form is bounded only by the user's lifetime event
    count (the hot-user skew killer at 100 TB).
    """
    n_steps = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = events.filter(F.col(type_col).isin(*steps)).select(
        F.col(user_col).alias("__u"),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        F.col(type_col).alias("__t"),
    )
    chunked = ev.withColumn("__chunk", F.expr(f"__us div {chunk_us}L"))
    per_chunk_events = chunked.groupBy("__u", "__chunk").agg(
        F.array_sort(F.collect_list(F.struct("__us", "__t"))).alias("__evs")
    )
    # Track i (1-based element i of the array) = behavior for entry
    # stage i-1: struct(exit int, last long). last NULL = no match yet
    # in this chunk (entry state predates the chunk).
    init = F.transform(
        F.sequence(F.lit(1), F.lit(n_steps + 1)),
        lambda i: F.struct(
            (i - 1).cast("int").alias("exit"),
            F.lit(None).cast("long").alias("last"),
        ),
    )

    def step_tracks(acc, x):
        def upd(t):
            nxt = F.element_at(steps_arr, t.getField("exit") + 1)
            can = (
                (t.getField("exit") < n_steps)
                & (x.getField("__t") == nxt)
                & (
                    t.getField("last").isNull()
                    | (x.getField("__us") > t.getField("last"))
                )
            )
            return F.when(
                can,
                F.struct(
                    (t.getField("exit") + 1).cast("int").alias("exit"),
                    x.getField("__us").alias("last"),
                ),
            ).otherwise(t)

        return F.transform(acc, upd)

    tables = per_chunk_events.select(
        "__u",
        "__chunk",
        F.aggregate("__evs", init, step_tracks).alias("__table"),
    )
    # Compose chunk tables in time order: entry stage 0, each chunk maps
    # stage s -> table[s+1].exit.
    per_user = tables.groupBy("__u").agg(
        F.array_sort(F.collect_list(F.struct("__chunk", "__table"))).alias(
            "__tabs"
        )
    )
    compose = F.aggregate(
        "__tabs",
        F.lit(0).cast("int"),
        lambda acc, x: F.element_at(x.getField("__table"), acc + 1).getField(
            "exit"
        ),
    )
    reached = per_user.select(compose.alias("stage"))
    return _stage_rollup(reached, steps)


def cogroup_attribution(
    purchases,
    clicks,
    window_minutes: int = 30,
):
    """Per-user conversion attribution via COGROUPED applyInPandas → one
    row per purchase ``(user_id, purchase_event_id, n_prior_clicks,
    attributed)``: the count of the same user's clicks strictly before
    the purchase and within ``window_minutes`` (the stream_stream_join
    interval semantics, batch-side).

    Exists to exercise the one Pandas-on-Spark execution mechanism the
    library didn't yet use: ``groupBy().cogroup().applyInPandas`` — both
    relations shuffle ONCE on the user key and arrive as per-user pandas
    frames in the same task (Arrow both ways), the right tool when the
    per-key logic wants imperative two-table code (attribution models,
    reconciliation, replay) that neither a join nor a single-table UDF
    expresses cleanly.

    Scale: one user-keyed shuffle per side; a hot user's whole history
    lands in one task — the documented trade of every cogroup/grouped-map
    (the skew-resilient alternative when that bites is an FSM/join
    formulation, cf. funnel_stage_counts_partitioned). Timestamp math is
    integer microseconds on datetime64 values — exact, no float seam.
    """
    import numpy as np
    import pandas as pd

    delta = np.timedelta64(window_minutes * 60_000_000, "us")

    def reconcile(pdf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "purchase_event_id": pd.Series(dtype="int64"),
                    "n_prior_clicks": pd.Series(dtype="int64"),
                    "attributed": pd.Series(dtype="bool"),
                }
            )
        # Vectorized interval count: clicks in [pts − delta, pts) per
        # purchase via two binary searches over the sorted click times —
        # O((P+C) log C), so a hot user's task does numpy work, not an
        # O(P·C) interpreted loop. Exact integer-microsecond datetime64
        # comparisons; c == pts−delta included, c == pts excluded —
        # identical to the interval-join oracle.
        cts = np.sort(cdf["ts"].to_numpy()) if not cdf.empty else np.array(
            [], dtype="datetime64[ns]"
        )
        pts = pdf["ts"].to_numpy()
        n = (
            np.searchsorted(cts, pts, side="left")
            - np.searchsorted(cts, pts - delta, side="left")
        ).astype("int64")
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].astype("int64"),
                "purchase_event_id": pdf["event_id"].astype("int64"),
                "n_prior_clicks": pd.Series(n, dtype="int64"),
                "attributed": pd.Series(n > 0, dtype="bool"),
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            reconcile,
            schema=(
                "user_id long, purchase_event_id long,"
                " n_prior_clicks long, attributed boolean"
            ),
        )
    )
