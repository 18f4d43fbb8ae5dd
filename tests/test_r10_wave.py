"""Semantic invariants of the round-10 key wave: properties the
hash-parity compare cannot see because BOTH engines could violate them
identically (the test_experiments.py discipline applied to the r10
additions). Most run oracle-side with DuckDB (no JVM); the final section
re-asserts the drift-prone invariants over the Spark DataFrames too
(VERDICT r10 ask #5).
"""

from __future__ import annotations

from tests.parity import duck_connect
from zip_to_parquet_spark.plans import all_oracle_sql

SF = "/root/testdata/sf0.001"


def _run(sql: str):
    con = duck_connect(SF)
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_time_decay_attribution_conserves_credit_per_conversion():
    # Every credited conversion distributes exactly 1000 milli, whatever
    # the decay weights truncate to — re-derived from the key's own CTEs.
    oracle = all_oracle_sql()["events_attribution_time_decay"]
    body = oracle[: oracle.rindex("SELECT")]
    rows = _run(
        body
        + """
        SELECT DISTINCT per_conv FROM (
          SELECT conv_id,
                 sum(CASE WHEN rn = 1 THEN 1000 - (tot_shares - share)
                          ELSE share END) AS per_conv
          FROM shared GROUP BY conv_id
        )
        """
    )
    assert rows == [(1000,)], rows


def test_time_decay_weights_halve_per_day():
    # The weight column must be exactly 1000000 >> gap_days for every
    # joined touch — no float decay anywhere. The lookback filter is
    # INCLUSIVE (t_ts >= conv_ts - INTERVAL 7 DAY), so gap_days spans
    # 0..7 and a touch landing exactly on the 7-day boundary is a legal
    # 1000000 >> 7 = 7812 (ADVICE r10: the boundary value belongs in the
    # whitelist even though no current fixture touch hits the exact
    # microsecond).
    oracle = all_oracle_sql()["events_attribution_time_decay"]
    body = oracle[: oracle.rindex("SELECT")]
    rows = _run(
        body
        + """
        SELECT DISTINCT w IN (1000000, 500000, 250000, 125000,
                              62500, 31250, 15625, 7812)
        FROM j
        """
    )
    assert rows == [(True,)], rows


def test_class_balanced_classes_land_exactly_equal():
    oracle = all_oracle_sql()["sample_class_balanced"]
    kept = _run(
        f"SELECT lang, count(*) FROM ({oracle}) GROUP BY lang ORDER BY lang"
    )
    raw = _run("SELECT lang, count(*) FROM documents GROUP BY lang")
    n_min = min(n for _, n in raw)
    assert len(kept) == len(raw)  # every class survives
    assert {n for _, n in kept} == {n_min}, (kept, n_min)


def test_levene_bf_doubled_median_matches_duckdb_median():
    # med2 must equal 2x DuckDB's own median of the daily counts (DuckDB
    # returns lo+hi over 2 for even n — exactly med2/2).
    oracle = all_oracle_sql()["stats_levene_bf"]
    med2 = dict(
        (r[0], r[2])
        for r in _run(f"SELECT event_type, n_days, med2_daily FROM ({oracle})")
    )
    direct = _run(
        """
        SELECT event_type, 2 * median(x) FROM (
          SELECT event_type, ts::DATE AS d, count(*)::BIGINT AS x
          FROM events GROUP BY 1, 2
        ) GROUP BY event_type
        """
    )
    for grp, twice_med in direct:
        assert med2[grp] == int(twice_med), (grp, med2[grp], twice_med)


def test_ljung_box_q_is_cumulative_and_consistent_with_acf():
    oracle = all_oracle_sql()["ts_ljung_box"]
    rows = _run(f"SELECT lag, acf_ppm, q_milli FROM ({oracle}) ORDER BY lag")
    qs = [q for _, _, q in rows]
    assert qs == sorted(qs)  # sums of non-negative terms: non-decreasing
    # the per-lag coefficients must equal ts_autocorrelation's oracle
    acf = dict(
        (r[0], r[1])
        for r in _run(
            "SELECT lag, acf_ppm FROM ("
            + all_oracle_sql()["ts_autocorrelation"]
            + ")"
        )
    )
    for lag, rho, _ in rows:
        assert acf[lag] == rho, (lag, acf[lag], rho)


def test_resource_allocation_score_respects_degree_bounds():
    # A common neighbor is adjacent to both endpoints, so deg(z) >= 2 and
    # each wedge contributes at most 500000 micro; scores are positive.
    oracle = all_oracle_sql()["graph_resource_allocation"]
    rows = _run(f"SELECT n_common, ra_micro FROM ({oracle})")
    assert rows, "top-20 must be non-empty on the fixture graph"
    for n_common, ra in rows:
        assert 0 < ra <= 500000 * n_common, (n_common, ra)


# ---------------------------------------------------------------------------
# JVM-side invariants (VERDICT r10 ask #5): the two keys where BOTH engines
# could drift together on a future edit get the same semantic assertions
# over the Spark DataFrames, not just the oracle CTEs.
# ---------------------------------------------------------------------------


def test_time_decay_credit_conserves_on_spark(spark):
    # Sum of credit over the ACTUAL key output must equal 1000 milli per
    # credited conversion, with the conversion count derived independently
    # (a purchase with >= 1 view/click touch in its inclusive 7-day
    # lookback) — catches a quantization/remainder drift even if both
    # engines drift identically.
    from pyspark.sql import functions as F

    from zip_to_parquet_spark.plans import all_queries
    from zip_to_parquet_spark.schema import load_table

    out = all_queries()["events_attribution_time_decay"](spark, SF)
    total = out.agg(F.sum("credit_milli").alias("s")).collect()[0]["s"]

    e = load_table(spark, SF, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
    )
    touch = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("ts").alias("t_ts")
    )
    credited = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("t_ts") < F.col("conv_ts"))
            & (F.col("t_ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAYS"))
        )
        .select("conv_id")
        .distinct()
        .count()
    )
    assert credited > 0
    assert total == 1000 * credited, (total, credited)


def test_class_balanced_lands_exactly_equal_on_spark(spark):
    # Every lang class in the ACTUAL key output must land at exactly the
    # minority class's raw size, with n_min derived independently.
    from pyspark.sql import functions as F

    from zip_to_parquet_spark.plans import all_queries
    from zip_to_parquet_spark.schema import load_table

    out = all_queries()["sample_class_balanced"](spark, SF)
    kept = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    raw = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_min = min(raw.values())
    assert set(kept) == set(raw)  # every class survives
    assert set(kept.values()) == {n_min}, (kept, n_min)
