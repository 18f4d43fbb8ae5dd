"""Degenerate-input regression gate (oracle side — fast, no JVM).

scripts/degenerate_sweep.py's DuckDB half as a pytest: every registered
oracle must execute without error on the worst-case fixture (constant
values, single categories, size-1 strata, one event type, zero vectors).
The Spark half (which found the r11 ANSI DIVIDE_BY_ZERO class) runs via
``python scripts/degenerate_sweep.py --spark`` — too slow for the default
suite, but the SQL-expression guards it enforces (nullif/try_divide/
try_cast) are shared text between both engines, so the oracle gate catches
most regressions of the contract.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import duckdb

_spec = importlib.util.spec_from_file_location(
    "degenerate_sweep",
    Path(__file__).resolve().parents[1] / "scripts" / "degenerate_sweep.py",
)
_ds = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_ds)


def test_every_oracle_survives_the_degenerate_fixture():
    con = duckdb.connect()
    _ds._build(con)
    failures = _ds._sweep_oracles(con, verbose=False)
    assert not failures, failures


def test_fixture_is_actually_degenerate():
    """The fixture must keep its planted worst cases — otherwise the gate
    silently weakens: constant order totals (ssw=0), equal daily event
    counts (zero series variance), a single event type (k=1), and a
    zero-norm embedding."""
    con = duckdb.connect()
    _ds._build(con)
    assert con.execute(
        "SELECT count(DISTINCT o_totalprice) FROM orders"
    ).fetchone()[0] == 1
    daily = con.execute(
        "SELECT count(DISTINCT n) FROM (SELECT count(*) n FROM events"
        " GROUP BY ts::DATE)"
    ).fetchone()[0]
    assert daily == 1  # constant daily counts
    assert con.execute(
        "SELECT count(DISTINCT event_type) FROM events"
    ).fetchone()[0] == 1
    assert con.execute(
        "SELECT min(list_sum(list_transform(embedding, x -> abs(x))))"
        " FROM embeddings"
    ).fetchone()[0] == 0.0  # a zero vector exists


def test_every_oracle_survives_empty_tables():
    """--empty mode's DuckDB half: all ten tables zero rows — the state
    any filter-matching-nothing stage produces at 100 TB."""
    con = duckdb.connect()
    _ds._build(con, empty=True)
    failures = _ds._sweep_oracles(con, verbose=False)
    assert not failures, failures
