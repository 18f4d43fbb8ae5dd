"""Iterative graph algorithms over edge DataFrames.

Companion to ``operators.dedupe.connected_components`` (min-label
propagation): same Spark idioms — per-iteration keyed join + groupBy,
``localCheckpoint`` to truncate lineage — applied to link-analysis
scoring. The reference has no graph surface (SURVEY §2.C: no joins at
all); this extends the LLM-pipeline library, where link-graph scores
(PageRank over a host/citation graph) are a standard corpus-quality
signal (e.g. Common Crawl host ranking feeding crawl frontier and
quality weighting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_integer"]


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping_pct: int = 85,
    base: int = 1_000_000,
) -> DataFrame:
    """Power-iteration PageRank in INTEGER micro-units → (node, rank_micro).

    Why integer: a distributed double sum is addition-order-dependent, so
    float PageRank never hash-matches an oracle (and drifts run-to-run).
    Here every per-edge contribution is ``rank div out_degree`` (exact
    integer floor-division) and the damping update is
    ``teleport + (damping_pct · Σcontrib) div 100`` — all integer, so the
    in-neighbor sum is order-free and the fixed-point result is
    bit-identical on any engine, any partitioning. Ranks are micro-units
    of probability mass × node count (init = ``base`` per node); divide
    by ``base`` for the conventional scale. Floor loss per edge is
    < 1 micro-unit — noise at rank magnitudes, determinism in exchange.

    Semantics: distinct directed edges, uniform out-edge split, fixed
    ``iters`` power steps, no dangling-mass redistribution (a node with
    no out-edges absorbs; the fixed iteration count bounds the loss —
    document-corpus host graphs prune sinks upstream).

    Scale shape: per iteration one equi-join of edges against ranks on
    src (shuffle keys: node ids — natural web-graph skew on mega-hosts
    is the known caveat; AQE skew-join or salting applies unchanged) and
    one groupBy(dst) with map-side combine. ``localCheckpoint`` after
    each step keeps the plan from growing with ``iters`` — the standard
    Spark iterative-algorithm idiom (same as connected_components).
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    teleport = base * (100 - damping_pct) // 100
    ranks = nodes.select("node", F.lit(base).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .select(F.col("dst").alias("node2"), F.expr("r div d").alias("ct"))
        )
        in_sum = contrib.groupBy("node2").agg(F.sum("ct").alias("s"))
        ranks = (
            nodes.join(in_sum, nodes["node"] == F.col("node2"), "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))
