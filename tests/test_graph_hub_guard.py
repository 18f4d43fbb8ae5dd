"""Planted-hub property tests for the link-prediction wedge guard.

VERDICT r10 finding #1: the r10-era corpus-relative hub threshold
(deg > 64 AND deg > 250‰ of n_nodes) required a node adjacent to 25% of the
entire graph and therefore never fired on any realistic sparse graph — the
Σdeg²-per-center wedge self-join in graph_jaccard_linkpred /
graph_resource_allocation ran unguarded, and one power-law hub would turn
the shared-neighbor shuffle key into a deg² skew bomb. The fix is an
ABSOLUTE per-center cap (``hub_centers``: deg > HUB_DEG_CAP, mirrored
verbatim in both oracles). These tests PROVE the bound on a synthetic graph
with a planted hub: wedge output is exactly Σ_{deg(c) ≤ cap} C(deg(c), 2)
— the hub center contributes ZERO rows no matter how large its degree.
"""

from __future__ import annotations

from math import comb

import duckdb
import pytest
from pyspark.sql import functions as F

from zip_to_parquet_spark.plans.scidata import HUB_DEG_CAP, hub_centers

# Planted topology: hub node 0 adjacent to spokes 1..HUB_DEG; a clean
# 4-clique on 101..104 (every node deg 3, all below cap); and a mid-degree
# center 200 adjacent to 201..200+MID_DEG (above the test cap, below the
# hub). Node id ranges are disjoint so degrees are exactly by construction.
HUB_DEG = 40
MID_DEG = 12
TEST_CAP = 8


def _edges() -> list[tuple[int, int]]:
    e = [(0, s) for s in range(1, HUB_DEG + 1)]
    clique = [101, 102, 103, 104]
    e += [(a, b) for a in clique for b in clique if a < b]
    e += [(200, 200 + i) for i in range(1, MID_DEG + 1)]
    return e


def _expected_wedges(cap: int) -> int:
    # Degrees by construction: hub=HUB_DEG, spokes=1, clique nodes=3,
    # mid center=MID_DEG, mid leaves=1. A center of degree d below the
    # cap yields C(d, 2) wedges (x.u < y.u pairs of its neighbors).
    degs = (
        [HUB_DEG]
        + [1] * HUB_DEG
        + [3] * 4
        + [MID_DEG]
        + [1] * MID_DEG
    )
    return sum(comb(d, 2) for d in degs if d <= cap)


def _wedge_count_spark(spark, cap: int) -> tuple[int, int]:
    """(total wedge rows, wedge rows centered at an above-cap node)."""
    e = spark.createDataFrame(_edges(), "u long, v long")
    und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    hub = hub_centers(deg, cap)
    undg = und.join(F.broadcast(hub), "v", "left_anti")
    wedges = (
        undg.alias("x")
        .join(undg.alias("y"), F.col("x.v") == F.col("y.v"))
        .filter(F.col("x.u") < F.col("y.u"))
        .select(F.col("x.v").alias("center"))
    )
    total = wedges.count()
    over_cap = (
        wedges.join(
            F.broadcast(hub_centers(deg, cap).withColumnRenamed("v", "center")),
            "center",
        ).count()
    )
    return total, over_cap


def test_planted_hub_contributes_zero_wedges(spark):
    total, over_cap = _wedge_count_spark(spark, TEST_CAP)
    assert over_cap == 0
    assert total == _expected_wedges(TEST_CAP)


def test_wedge_output_bounded_by_cap_squared_per_center(spark):
    # With the guard, every surviving center has deg <= cap, so total
    # wedges <= n_centers * C(cap, 2). The planted hub (deg 40 >> cap 8)
    # must not break the bound.
    total, _ = _wedge_count_spark(spark, TEST_CAP)
    n_nodes = 1 + HUB_DEG + 4 + 1 + MID_DEG
    assert total <= n_nodes * comb(TEST_CAP, 2)


def test_default_cap_fires_on_realistic_hub(spark):
    # The r10-era relative guard needed deg > 250‰·n_nodes — on this graph
    # (58 nodes) that is deg > 14.5 AND deg > 64, i.e. NOTHING below deg 65
    # prunes regardless of skew. The absolute cap prunes any deg > 1024 hub
    # on any graph: plant one and check it is selected.
    deg = spark.createDataFrame(
        [(0, 2000), (1, 1024), (2, 120)], "node long, deg long"
    )
    pruned = sorted(r.v for r in hub_centers(deg, HUB_DEG_CAP).collect())
    assert pruned == [0]  # deg == cap survives; only the hub is cut


def test_oracle_guard_matches_spark_guard(spark):
    """The oracles' hub CTE (deg > 1024 verbatim) and hub_centers must
    select the same node set — run both over the same degree table."""
    rows = [(i, d) for i, d in enumerate([1, 64, 512, 1024, 1025, 99999])]
    deg = spark.createDataFrame(rows, "node long, deg long")
    spark_pruned = sorted(r.v for r in hub_centers(deg).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE deg(node BIGINT, deg BIGINT)")
    con.executemany("INSERT INTO deg VALUES (?, ?)", rows)
    duck_pruned = sorted(
        r[0] for r in con.execute(
            "SELECT node FROM deg WHERE deg > 1024"
        ).fetchall()
    )
    assert spark_pruned == duck_pruned == [4, 5]


@pytest.mark.parametrize(
    "key",
    [
        "graph_jaccard_linkpred",
        "graph_resource_allocation",
        "graph_adamic_adar",
    ],
)
def test_linkpred_oracles_use_absolute_cap(key):
    """Both oracles carry the absolute cap verbatim and no trace of the
    defunct relative threshold (regression pin for VERDICT r10 ask #2)."""
    from zip_to_parquet_spark.plans import all_oracle_sql

    sql = all_oracle_sql()[key]
    assert f"deg > {HUB_DEG_CAP}" in sql
    assert "n_nodes" not in sql and "250" not in sql


def test_array_pair_wedges_match_join_formulation(spark):
    """The r11 physical optimization (per-center sorted-array pair
    explosion, used by both link-prediction keys) must produce the SAME
    (cu, cv) -> count relation as the naive wedge self-join it replaced —
    checked on the planted topology where expected counts are known."""
    e = spark.createDataFrame(_edges(), "u long, v long")
    und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    undg = und.join(F.broadcast(hub_centers(deg, TEST_CAP)), "v", "left_anti")
    join_cn = sorted(
        tuple(r)
        for r in undg.alias("x")
        .join(undg.alias("y"), F.col("x.v") == F.col("y.v"))
        .filter(F.col("x.u") < F.col("y.u"))
        .groupBy(F.col("x.u").alias("cu"), F.col("y.u").alias("cv"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    adj = undg.groupBy("v").agg(F.sort_array(F.collect_list("u")).alias("us"))
    array_cn = sorted(
        tuple(r)
        for r in adj.select(
            F.explode(
                F.expr(
                    "flatten(transform(us, (x, i) ->"
                    " transform(slice(us, i + 2, size(us) - i - 1),"
                    " y -> struct(x AS cu, y AS cv))))"
                )
            ).alias("p")
        )
        .select("p.cu", "p.cv")
        .groupBy("cu", "cv")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert array_cn == join_cn and array_cn  # equal and non-empty


def test_fused_adjacency_size_filter_matches_anti_join_prune(spark):
    """r15 fused adjacency: the shipped pipeline prunes hub CENTERS with a
    ``size(us) <= cap`` filter on the collected neighbor lists instead of
    the r14 hub_centers anti-join (one und exchange instead of two). On
    the planted topology the two formulations must produce the SAME
    (cu, cv) -> count relation — including the boundary (deg == cap
    survives, deg > cap is cut) — and the fused degree table
    (size(us) over the UNPRUNED adjacency) must equal the groupBy count."""
    pairs_expr = (
        "flatten(transform(us, (x, i) ->"
        " transform(slice(us, i + 2, size(us) - i - 1),"
        " y -> struct(x AS cu, y AS cv))))"
    )
    e = spark.createDataFrame(_edges(), "u long, v long")
    und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    # r14 formulation: separate degree pass + hub anti-join.
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    undg = und.join(F.broadcast(hub_centers(deg, TEST_CAP)), "v", "left_anti")
    adj_r14 = undg.groupBy("v").agg(
        F.sort_array(F.collect_list("u")).alias("us")
    )
    cn_r14 = sorted(
        tuple(r)
        for r in adj_r14.select(F.explode(F.expr(pairs_expr)).alias("p"))
        .select("p.cu", "p.cv")
        .groupBy("cu", "cv")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )

    # r15 fused formulation: one adjacency, size-filtered.
    adjf = und.groupBy("v").agg(
        F.sort_array(F.collect_list("u")).alias("us")
    )
    cn_fused = sorted(
        tuple(r)
        for r in adjf.filter(F.size("us") <= TEST_CAP)
        .select(F.explode(F.expr(pairs_expr)).alias("p"))
        .select("p.cu", "p.cv")
        .groupBy("cu", "cv")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert cn_fused == cn_r14 and cn_fused

    # Degree parity: size(us) over the UNPRUNED adjacency == groupBy count.
    fused_deg = sorted(
        (r.node, r.deg)
        for r in adjf.select(
            F.col("v").alias("node"), F.size("us").cast("long").alias("deg")
        ).collect()
    )
    counted_deg = sorted((r.node, r.deg) for r in deg.collect())
    assert fused_deg == counted_deg
