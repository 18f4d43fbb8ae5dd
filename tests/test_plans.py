"""Physical-plan regression tests: the scale-critical plan properties
(pushdown, pruning, join strategy, shuffle counts) must not silently rot.

These parse `explain("formatted")` output — the same artifact a human
would eyeball — so a Catalyst upgrade or operator edit that loses a
pushed filter or turns a broadcast join into a shuffle join fails CI."""

from __future__ import annotations

import contextlib
import io
import re

from zip_to_parquet_spark.plans import all_queries

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = all_queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_shuffles(plan: str) -> int:
    """Count physical Exchange operators (each appears once as a numbered
    detail header), excluding reuse."""
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M))


def test_q6_full_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    # Every predicate reaches the scan...
    assert "PushedFilters:" in plan
    pushed = next(l for l in plan.splitlines() if "PushedFilters:" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed down: {pushed}"
    # ...and the read schema is pruned to exactly the referenced columns.
    read = next(l for l in plan.splitlines() if "ReadSchema:" in l)
    assert "l_extendedprice" in read
    for col in ("l_orderkey", "l_partkey", "l_returnflag", "l_tax"):
        assert col not in read, f"unpruned column {col}: {read}"


def test_dim_join_broadcasts(spark):
    plan = plan_of(spark, "join_broadcast_dim")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_zip_pipeline_is_shuffle_free(spark):
    # The reference-parity pipeline is embarrassingly parallel: scan →
    # project → (no shuffle anywhere). SURVEY §3.
    plan = plan_of(spark, "zip_explode_hash")
    assert "Exchange" not in plan


def test_q1_single_shuffle(spark):
    # Scan → partial agg → ONE exchange → final agg. More exchanges means
    # the partial aggregation (map-side combine) got lost.
    plan = plan_of(spark, "q1_pricing_summary")
    assert n_shuffles(plan) <= 1


def test_minhash_banding_has_no_cross_join(spark):
    plan = plan_of(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_single_shuffle_no_join_node(spark):
    # The linear as-of formulation: union + ONE hash exchange on the key +
    # window sort. Any *Join operator in the plan means someone rewrote it
    # into the quadratic theta-join form.
    plan = plan_of(spark, "join_asof_last_click")
    assert "Join" not in plan
    assert n_shuffles(plan) <= 1
