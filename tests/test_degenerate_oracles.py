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
import pytest

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


# One representative per Spark-side guard class the r11 sweep actually
# found (VERDICT r11 ask #6): the nullif guards over ANSI DIVIDE_BY_ZERO
# denominators, the sequence(1, 0)-descending guard in the survival
# curve, and the loud empty-codebook/corpus preconditions of the ANN
# family. The two r12-replanned graph keys ride along because their
# driver-side probes (size_aware_side, _max_node) must survive an empty
# graph. Everything else stays covered by the out-of-suite
# ``python scripts/degenerate_sweep.py --spark --empty`` hand run.
SPARK_EMPTY_GUARD_KEYS = [
    "stats_levene_bf",  # nullif: ssw=0 / k=1 denominators
    "stats_kaplan_meier",  # sequence(1, size(a)) on empty a
    "ts_ljung_box",  # zero autocovariance denominator
    "ann_ivf_topk",  # empty codebook -> explanatory ValueError
    "dedup_semantic",  # empty centroid sample -> explanatory ValueError
    "graph_jaccard_linkpred",
    "graph_resource_allocation",
    "mixture_sample_by_source",
]


@pytest.mark.slow
def test_spark_guard_classes_survive_empty_tables(spark, tmp_path):
    """JVM-side regression for the degenerate-input contract: each guard
    class runs against ALL-EMPTY tables in the suite's own (ANSI-default)
    session — keys without a precondition contract must answer (zero
    rows, no error); ANN keys must raise their explanatory ValueError,
    never a bare numpy Index/Axis error."""
    con = duckdb.connect()
    _ds._build(con, empty=True)
    for t in ("region nation customer supplier part orders "
              "lineitem events documents embeddings").split():
        con.execute(
            f"COPY (SELECT * FROM {t}) TO '{tmp_path}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
    from zip_to_parquet_spark.plans import all_queries

    qs = all_queries()
    for key in SPARK_EMPTY_GUARD_KEYS:
        if key in _ds.EXPECTED_PRECONDITION_ERRORS:
            with pytest.raises(ValueError):
                qs[key](spark, str(tmp_path)).collect()
        else:
            qs[key](spark, str(tmp_path)).collect()
