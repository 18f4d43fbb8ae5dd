"""Planted-jumbo-basket property tests for the pair-generation guard.

VERDICT r12 finding #1: every C(basket, 2) co-occurrence pair generation
(the order-key self-joins behind graph_jaccard_linkpred,
graph_resource_allocation, graph_adamic_adar, graph_triangle_count,
graph_bfs_hops, graph_local_clustering, and basket_pair_lift) was
quadratic in a DATA-dependent quantity with no bound: one pathological
basket (a bot account, a crawler artifact) of 10⁶ items emits 5×10¹¹
pairs inside a single task — the same skew-bomb class the wedge stage
already guards with HUB_DEG_CAP, one stage later. The fix is the proven
recipe: an ABSOLUTE per-basket cap (``operators.graph.capped_baskets``:
baskets above BASKET_CAP rows are dropped, mirrored verbatim in every
consuming oracle). These tests PROVE the bound on a synthetic order set
with a planted jumbo basket: pair output is exactly
Σ_{|basket| ≤ cap} C(|basket|, 2) — the jumbo basket contributes ZERO
pairs no matter how large it is — and the Adamic-Adar ln-weight parity
is verified over its ENTIRE reachable domain.
"""

from __future__ import annotations

import contextlib
import io
import math
import re
from math import comb

import duckdb
import pytest
from pyspark.sql import functions as F

from zip_to_parquet_spark.operators.graph import BASKET_CAP, capped_baskets

# Planted baskets: order 1 has 3 parts, order 2 exactly TEST_CAP parts
# (at-cap survives), order 3 a jumbo of JUMBO parts (dropped), order 4 a
# single part (no pairs). Part id ranges are disjoint per order so pair
# counts are exactly by construction.
TEST_CAP = 8
JUMBO = 40
BASKETS = {1: 3, 2: TEST_CAP, 3: JUMBO, 4: 1}


def _rows() -> list[tuple[int, int]]:
    rows, base = [], 0
    for ok, size in BASKETS.items():
        rows += [(ok, base + i) for i in range(size)]
        base += 1000
    return rows


def _expected_pairs(cap: int) -> int:
    return sum(comb(b, 2) for b in BASKETS.values() if b <= cap)


def _pairs(spark, lp):
    return (
        lp.alias("a")
        .join(lp.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            "l_orderkey",
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
    )


def test_planted_jumbo_basket_contributes_zero_pairs(spark):
    lp = spark.createDataFrame(_rows(), "l_orderkey long, l_partkey long")
    pairs = _pairs(spark, capped_baskets(lp, TEST_CAP))
    total = pairs.count()
    from_jumbo = pairs.filter(F.col("l_orderkey") == 3).count()
    assert from_jumbo == 0
    assert total == _expected_pairs(TEST_CAP)


def test_pair_output_bounded_by_cap_squared_per_basket(spark):
    # With the guard, every surviving basket has ≤ cap rows, so total
    # pairs ≤ n_baskets · C(cap, 2) regardless of the jumbo's size.
    lp = spark.createDataFrame(_rows(), "l_orderkey long, l_partkey long")
    total = _pairs(spark, capped_baskets(lp, TEST_CAP)).count()
    assert total <= len(BASKETS) * comb(TEST_CAP, 2)


def test_at_cap_basket_survives_and_above_cap_drops(spark):
    lp = spark.createDataFrame(_rows(), "l_orderkey long, l_partkey long")
    kept = sorted(
        r.l_orderkey
        for r in capped_baskets(lp, TEST_CAP)
        .select("l_orderkey")
        .distinct()
        .collect()
    )
    assert kept == [1, 2, 4]  # |basket| == cap survives; only jumbo cut


def test_oracle_guard_matches_spark_guard(spark):
    """The oracles' window CTE (count(*) OVER (PARTITION BY l_orderkey)
    ... WHERE bsz <= cap, verbatim) and capped_baskets must keep the same
    (order, part) row set — run both over the same synthetic baskets."""
    rows = _rows()
    spark_kept = sorted(
        tuple(r)
        for r in capped_baskets(
            spark.createDataFrame(rows, "l_orderkey long, l_partkey long"),
            TEST_CAP,
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE lp0(l_orderkey BIGINT, l_partkey BIGINT)")
    con.executemany("INSERT INTO lp0 VALUES (?, ?)", rows)
    duck_kept = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            SELECT l_orderkey, l_partkey FROM (
              SELECT l_orderkey, l_partkey,
                     count(*) OVER (PARTITION BY l_orderkey) AS bsz
              FROM lp0)
            WHERE bsz <= {TEST_CAP}
            """
        ).fetchall()
    )
    assert spark_kept == duck_kept and len(spark_kept) == 3 + TEST_CAP + 1


CONSUMING_KEYS = [
    "graph_jaccard_linkpred",
    "graph_resource_allocation",
    "graph_adamic_adar",
    "graph_triangle_count",
    "graph_bfs_hops",
    "graph_local_clustering",
    "basket_pair_lift",
]


@pytest.mark.parametrize("key", CONSUMING_KEYS)
def test_consuming_oracles_pin_the_cap(key):
    """Every oracle that consumes a C(basket, 2) pair generation carries
    the absolute cap verbatim (regression pin, VERDICT r12 ask #2)."""
    from zip_to_parquet_spark.plans import all_oracle_sql

    sql = all_oracle_sql()[key]
    assert f"bsz <= {BASKET_CAP}" in sql
    assert "OVER (PARTITION BY l_orderkey)" in sql


def test_cap_filter_reaches_the_physical_plan(spark):
    # basket_pair_lift has no lineage-truncating checkpoint (unlike the
    # link-prediction keys, whose capped edge set is localCheckpoint-ed),
    # so the cap filter must be visible in its formatted plan — anchored
    # to the Filter condition, not a bare literal (the ADVICE r12 lesson
    # on the hub-cap lock).
    from zip_to_parquet_spark.plans import all_queries

    df = all_queries()["basket_pair_lift"](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert re.search(rf"\(_bsz#\d+L? <= {BASKET_CAP}\)", buf.getvalue())


def test_cap_adds_no_extra_exchange(spark):
    # The window count partitions by the basket key — exactly the pair
    # self-join's required partitioning — so capped pair generation must
    # run with the SAME number of Exchanges as uncapped.
    lp = spark.createDataFrame(_rows(), "l_orderkey long, l_partkey long")

    def n_exchanges(df) -> int:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return len(re.findall(r"^\(\d+\) Exchange", buf.getvalue(), re.M))

    assert n_exchanges(_pairs(spark, capped_baskets(lp, TEST_CAP))) <= (
        n_exchanges(_pairs(spark, lp))
    )


# ---------------------------------------------------------------------------
# Adamic-Adar ln-weight parity over the entire reachable domain
# ---------------------------------------------------------------------------
def test_aa_ln_weight_parity_full_domain(spark):
    """graph_adamic_adar floors ln(deg) to integer micro-nats once per
    node. Wedge centers have 2 ≤ deg ≤ HUB_DEG_CAP (a center needs ≥2
    neighbors; above-cap hubs are pruned), so the transcendental's
    engine-parity domain is ENUMERABLE — assert Spark (Java Math.log)
    and DuckDB (C libm) agree on floor(ln(d)·10⁶) and on the full weight
    10¹² div that, for every reachable d."""
    from zip_to_parquet_spark.plans.scidata import HUB_DEG_CAP

    spark_rows = (
        spark.range(2, HUB_DEG_CAP + 1)
        .select(
            F.col("id").alias("deg"),
            F.expr("floor(ln(id) * 1000000)").alias("ln_micro"),
            F.expr(
                "1000000000000 div nullif(floor(ln(id) * 1000000), 0)"
            ).alias("w"),
        )
        .orderBy("deg")
        .collect()
    )
    duck_rows = duckdb.connect().execute(
        f"""
        SELECT d,
               CAST(floor(ln(d) * 1000000) AS BIGINT),
               1000000000000 // CAST(floor(ln(d) * 1000000) AS BIGINT)
        FROM range(2, {HUB_DEG_CAP} + 1) t(d) ORDER BY d
        """
    ).fetchall()
    assert [tuple(r) for r in spark_rows] == [tuple(r) for r in duck_rows]
    # And both agree with CPython's libm wrapper.
    for d, ln_micro, _w in duck_rows:
        assert ln_micro == math.floor(math.log(d) * 1000000)


def test_aa_weight_deg1_is_null_not_error(spark):
    # deg-1 nodes exist in the weight DIM (ln(1) = 0): the nullif guard
    # must yield NULL, never an ANSI divide-by-zero — such nodes emit
    # zero wedge pairs, so the NULL never reaches a sum.
    row = spark.range(1, 2).select(
        F.expr("1000000000000 div nullif(floor(ln(id) * 1000000), 0)").alias(
            "w"
        )
    ).collect()
    assert row[0]["w"] is None


# ---------------------------------------------------------------------------
# LSH mega-bucket star expansion (the same C(group, 2) family, one stage
# over: operators/dedupe._bucket_pairs / LSH_BUCKET_CAP)
# ---------------------------------------------------------------------------
def _expand(spark, ids, cap):
    from zip_to_parquet_spark.operators.dedupe import _bucket_pairs

    df = spark.createDataFrame([(sorted(ids),)], "ids array<long>")
    return sorted(
        (r.p.doc_a, r.p.doc_b)
        for r in df.select(
            F.explode(_bucket_pairs(F.col("ids"), cap)).alias("p")
        ).collect()
    )


def test_bucket_pairs_all_pairs_at_or_below_cap(spark):
    from itertools import combinations

    ids = list(range(10, 18))  # 8 ids, cap 8: at-cap keeps all pairs
    assert _expand(spark, ids, 8) == sorted(combinations(sorted(ids), 2))


def test_mega_bucket_expands_linear_star(spark):
    # Above the cap the expansion is the bucket-minimum star: b-1 pairs,
    # every member connected to the representative — never C(b, 2).
    ids = list(range(100, 140))  # 40 ids >> cap 8
    got = _expand(spark, ids, 8)
    assert got == [(100, x) for x in range(101, 140)]
    assert len(got) == len(ids) - 1  # linear, and connectivity preserved


def test_lsh_cap_never_fires_on_fixture_scale_buckets(spark):
    # The measured fixture maxima (minhash 4, cosine 37 at sf0.1) sit far
    # below LSH_BUCKET_CAP, so oracle hashes are unchanged — pin the
    # at-cap boundary exactly: cap-sized buckets still expand all pairs.
    from itertools import combinations

    from zip_to_parquet_spark.operators.dedupe import LSH_BUCKET_CAP

    ids = list(range(37))  # the largest bucket observed on any fixture
    assert LSH_BUCKET_CAP >= 256 and len(ids) < LSH_BUCKET_CAP
    assert _expand(spark, ids, LSH_BUCKET_CAP) == sorted(
        combinations(ids, 2)
    )


def test_simhash_mega_bucket_star_guard(spark):
    """simhash_pairs falls back to the bucket-minimum star above
    bucket_cap: plant one low-bits band bucket of 6 docs (> cap 4) where
    doc 0 (the rep) is within hamming 1 of everyone — the star keeps all
    (0, x) pairs; with the cap above the bucket size the full C(6, 2)
    clique comes back. Exactness therefore holds verbatim at fixture
    scale (SIMHASH_BUCKET_CAP 1024 > the measured 501 max at sf0.1)."""
    from zip_to_parquet_spark.operators.dedupe import simhash_pairs

    # 6 simhashes equal in the low 15 bits (band 0), differing only in
    # one high bit each -> pairwise hamming <= 2, all near-dups.
    rows = [(0, 7)] + [(i, 7 | (1 << (20 + i))) for i in range(1, 6)]
    sh = spark.createDataFrame(rows, "doc_id long, simhash long")
    starred = simhash_pairs(sh, max_hamming=2, bucket_cap=4)
    star_pairs = sorted(
        (r.doc_a, r.doc_b) for r in starred.collect()
    )
    assert star_pairs == [(0, x) for x in range(1, 6)]  # linear star
    full = simhash_pairs(sh, max_hamming=2, bucket_cap=64)
    assert full.count() == 15  # C(6,2): all-pairs below the cap
