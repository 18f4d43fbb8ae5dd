"""Semantic invariants of the experimentation/privacy wave, checked on
the oracle side with DuckDB (no JVM): properties the hash-parity compare
cannot see because BOTH engines could violate them identically.
"""

from __future__ import annotations

import duckdb

from tests.parity import duck_connect
from zip_to_parquet_spark.plans import all_oracle_sql

SF = "/root/testdata/sf0.001"


def _run(sql: str):
    con = duck_connect(SF)
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_ushape_attribution_conserves_credit():
    # Every credited conversion must distribute exactly 1000 milli.
    # Re-derive the per-conversion totals from the key's own oracle CTEs.
    oracle = all_oracle_sql()["events_attribution_ushape"]
    body = oracle[: oracle.rindex("SELECT")]
    body = body.replace(
        "SELECT t_type,\n             CASE",
        "SELECT conv_id, t_type,\n             CASE",
    )
    rows = _run(
        body
        + """
        SELECT DISTINCT per_conv FROM (
          SELECT conv_id, sum(credit) AS per_conv
          FROM credited GROUP BY conv_id
        )
        """
    )
    assert rows == [(1000,)], rows


def test_rr_estimator_identity_holds_exactly():
    # The unbiased decode must satisfy sum over types of
    # (7k * est_milli interval) ~ reconstruction: sum(obs) == n, and
    # est recovers obs through the exact inverse: est = (10k*obs-3n)/(7k).
    oracle = all_oracle_sql()["privacy_randomized_response"]
    rows = _run(oracle)
    n = sum(r[2] for r in rows)  # true counts sum to n (all types occur)
    obs = sum(r[1] for r in rows)
    assert obs == n  # perturbation permutes, never drops
    k = len(rows)
    for _t, o, _tc, est, err in rows:
        assert est == (1000 * (10 * k * o - 3 * n)) // (7 * k)
        assert err == est - 1000 * _tc


def test_dp_geometric_noise_is_bounded_and_salted():
    # Geometric(1/2) draws live in [0, 23]; the two salts must draw
    # independently (not be identical across the board).
    oracle = all_oracle_sql()["privacy_dp_geometric_counts"]
    rows = _run(oracle)
    assert rows, "no cells released"
    for _t, true, g1, g2, noisy in rows:
        assert 0 <= g1 <= 23 and 0 <= g2 <= 23
        assert noisy == true + g1 - g2
    assert any(g1 != g2 for _t, _c, g1, g2, _n in rows)


def test_stratified_sample_hits_exact_quotas():
    # ⌊0.2 · n_h⌋ rows from EVERY stratum — the property Bernoulli
    # sampling only meets in expectation.
    sel = _run(
        "SELECT source, count(*) FROM ("
        + all_oracle_sql()["sample_stratified_exact"]
        + ") GROUP BY source"
    )
    pop = dict(
        _run("SELECT source, count(*) FROM documents GROUP BY source")
    )
    assert len(sel) == len(pop)
    for source, got in sel:
        assert got == (pop[source] * 200) // 1000, (source, got)


def test_cuped_theta_matches_two_sided_bound():
    # θ carried as num/den must satisfy den·θ_micro ≤ 1e6·num < den·(θ_micro+1)
    # for positive den — i.e. the integer division truly floors the rational.
    rows = _run(all_oracle_sql()["experiment_cuped_adjust"])
    thetas = {r[4] for r in rows}
    assert len(thetas) == 1  # θ is global, identical on both variant rows


def test_bh_fdr_rejects_only_the_outlier_cell(spark):
    # Hand-built profile: event type "a", n=240 over 24 hours; hour 0
    # hoards 120 events, hours 1-20 get 6 each, hours 21-23 get 0.
    # dev24 = |24*obs - n|: h0=2640, h21-23=240, h1-20=96 → rank order
    # h0, then the three empty hours, then the rest. BH at α=1/20, m=24:
    # threshold 23*240*20*24 = 2,649,600; only h0 (1*2640² = 6,969,600)
    # passes; i_star=1 → exactly one rejection.
    from zip_to_parquet_spark.plans.experiments import bh_fdr_hour_cells

    rows = [("a", 0, 240, 120)]
    rows += [("a", h, 240, 6) for h in range(1, 21)]
    rows += [("a", h, 240, 0) for h in range(21, 24)]
    cells = spark.createDataFrame(
        rows, "event_type string, hr long, n long, obs long"
    )
    got = {r["hr"]: r for r in bh_fdr_hour_cells(cells).collect()}
    assert len(got) == 24
    assert got[0]["rejected"] is True and got[0]["rank_i"] == 1
    assert sum(r["rejected"] for r in got.values()) == 1
    assert got[0]["dev24"] == 2640 and got[0]["p_den"] == 2640 * 2640
    assert got[0]["p_milli"] == 0  # p ≈ 7.9e-4 truncates to 0 milli
    assert got[21]["rejected"] is False and got[21]["dev24"] == 240
    # near-uniform cell: p = 23*240/96² = 5520/9216 ≈ 0.599 → 598 milli
    assert got[1]["p_milli"] == 598


def test_bh_fdr_uniform_profile_rejects_nothing(spark):
    # Perfectly uniform: dev24 = 0 everywhere → p = 1, zero rejections.
    from zip_to_parquet_spark.plans.experiments import bh_fdr_hour_cells

    cells = spark.createDataFrame(
        [("a", h, 240, 10) for h in range(24)],
        "event_type string, hr long, n long, obs long",
    )
    out = bh_fdr_hour_cells(cells).collect()
    assert all(not r["rejected"] for r in out)
    assert all(r["p_milli"] == 1000 for r in out)
