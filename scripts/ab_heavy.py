"""Interleaved A/B of wedge-pipeline variants for the heavy triad (guide §1).

Variants of the graph_jaccard_linkpred shape, run interleaved with
steal-marking so a stormy box cannot bias one arm:

  base   : shipped pipeline (struct pairs, AQE-sized wedge stage)
  wide   : repartition(P, "v") before the adjacency groupBy so the
           1000x-expanding wedge stage runs P-wide instead of the
           AQE-coalesced width (AQE sizes on pre-explode bytes)
  packed : single-long pair key via shiftleft/or (no ANSI-checked
           multiply, unlike the r12 packed experiment), decoded after
           the anti-join
  wp     : wide + packed
  wpmore : wide + packed + pair exchange at 2P partitions (r14 ship)
  fused  : wpmore + FUSED adjacency: one groupBy(v) builds the neighbor
           lists, deg/hub/max-node derive from size(us) — the separate
           deg groupBy pass (a second full exchange of und) and the hub
           anti-join disappear (r15, guide §2.4 "remove shuffles
           outright")
  fusedraw : fused, but the adjacency aggregates collect_set over the
           RAW (pre-distinct) co-purchase pairs — the edge-distinct
           exchange disappears too; the anti-join right side keeps the
           distinct edges (dups there would be harmless but the raw
           rebuild is not free)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _steal() -> float:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        return int(parts[7]) / 100.0 if len(parts) > 7 else 0.0
    except OSError:
        return 0.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    passes = int(os.environ.get("AB_PASSES", "3"))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("z2ps-ab-heavy")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from zip_to_parquet_spark.operators.graph import capped_baskets
    from zip_to_parquet_spark.plans.scidata import (
        DEG_BROADCAST_MAX,
        HUB_DEG_CAP,
        _WEDGE_PAIRS_PACKED,
        _WEDGE_PAIRS_STRUCT,
        _copurchase_edges,
        hub_centers,
    )
    from zip_to_parquet_spark.runtime import size_aware_side
    from zip_to_parquet_spark.schema import load_table

    P = spark.sparkContext.defaultParallelism

    def build_fused(variant: str):
        """r15 candidates: adjacency-first — deg/hub derive from the
        collected neighbor lists instead of a separate groupBy pass."""
        if variant == "fusedraw":
            lp = (
                load_table(spark, sf_dir, "lineitem")
                .select("l_orderkey", "l_partkey")
                .distinct()
            )
            cb = capped_baskets(lp)
            raw = (
                cb.alias("a")
                .join(cb.alias("b"), "l_orderkey")
                .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
                .select(
                    F.col("a.l_partkey").alias("u"),
                    F.col("b.l_partkey").alias("v"),
                )
                .localCheckpoint(eager=True)
            )
            und = raw.unionAll(
                raw.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            agg_us = F.array_sort(F.collect_set("u")).alias("us")
            ep_src = raw  # dups are harmless on the anti-join build side
        else:
            e = _copurchase_edges(spark, sf_dir)
            und = e.unionAll(
                e.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            agg_us = F.sort_array(F.collect_list("u")).alias("us")
            ep_src = e
        adjf = (
            und.repartition(P, "v")
            .groupBy("v")
            .agg(agg_us)
            .localCheckpoint(eager=True)
        )
        deg = adjf.select(
            F.col("v").alias("node"), F.size("us").cast("long").alias("deg")
        )
        adj = adjf.filter(F.size("us") <= HUB_DEG_CAP)
        cn = (
            adj.select(F.explode(F.expr(_WEDGE_PAIRS_PACKED)).alias("pk"))
            .repartition(2 * P, "pk")
            .groupBy("pk")
            .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        )
        ep = ep_src.select(
            (F.shiftleft("u", 32).bitwiseOR(F.col("v"))).alias("pk")
        )
        nonedge = cn.join(ep.hint("shuffle_hash"), "pk", "left_anti").select(
            F.shiftright("pk", 32).alias("cu"),
            F.expr("pk & 4294967295").alias("cv"),
            "n_common",
        )
        deg_side = size_aware_side(deg, deg, DEG_BROADCAST_MAX)
        dx = deg_side.select(
            F.col("node").alias("cu"), F.col("deg").alias("du")
        )
        dy = deg_side.select(
            F.col("node").alias("cv"), F.col("deg").alias("dv")
        )
        scored = (
            nonedge.join(dx, "cu")
            .join(dy, "cv")
            .select(
                F.col("cu").alias("u"),
                F.col("cv").alias("v"),
                "n_common",
                F.expr("(n_common * 1000) div (du + dv - n_common)").alias(
                    "jaccard_permille"
                ),
            )
        )
        return scored.orderBy(
            F.col("jaccard_permille").desc(), "u", "v"
        ).limit(20)

    def build(variant: str):
        if variant in ("fused", "fusedraw"):
            return build_fused(variant)
        e = _copurchase_edges(spark, sf_dir)
        und = e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        deg = (
            und.groupBy(F.col("u").alias("node"))
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
            .localCheckpoint(eager=True)
        )
        hub = hub_centers(deg)
        undg = und.join(
            size_aware_side(hub, hub, DEG_BROADCAST_MAX), "v", "left_anti"
        )
        wide = variant in ("wide", "wp", "wpmore", "wr", "wp4")
        packed = variant in ("packed", "wp", "wpmore", "pmore", "wp4")
        if wide:
            undg = undg.repartition(P, "v")
        adj = undg.groupBy("v").agg(
            F.sort_array(F.collect_list("u")).alias("us")
        )
        if packed:
            pairs_expr = (
                "flatten(transform(us, (x, i) ->"
                " transform(slice(us, i + 2, size(us) - i - 1),"
                " y -> shiftleft(x, 32) | y)))"
            )
            cn = (
                adj.select(F.explode(F.expr(pairs_expr)).alias("pk"))
                .groupBy("pk")
                .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
            )
            if variant in ("wpmore", "pmore", "wp4"):
                mult = 4 if variant == "wp4" else 2
                cn = (
                    adj.select(F.explode(F.expr(pairs_expr)).alias("pk"))
                    .repartition(mult * P, "pk")
                    .groupBy("pk")
                    .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
                )
            ep = e.select(
                (F.shiftleft("u", 32).bitwiseOR(F.col("v"))).alias("pk")
            )
            nonedge = cn.join(
                ep.hint("shuffle_hash"), "pk", "left_anti"
            ).select(
                F.shiftright("pk", 32).alias("cu"),
                F.expr("pk & 4294967295").alias("cv"),
                "n_common",
            )
        else:
            raw = adj.select(
                F.explode(F.expr(_WEDGE_PAIRS_STRUCT)).alias("p")
            ).select("p.cu", "p.cv")
            if variant == "wr":
                raw = raw.repartition(2 * P, "cu", "cv")
            cn = raw.groupBy("cu", "cv").agg(
                F.count(F.lit(1)).cast("long").alias("n_common")
            )
            nonedge = cn.join(
                e.hint("shuffle_hash"),
                (e.u == cn.cu) & (e.v == cn.cv),
                "left_anti",
            )
        deg_side = size_aware_side(deg, deg, DEG_BROADCAST_MAX)
        dx = deg_side.select(
            F.col("node").alias("cu"), F.col("deg").alias("du")
        )
        dy = deg_side.select(
            F.col("node").alias("cv"), F.col("deg").alias("dv")
        )
        scored = (
            nonedge.join(dx, "cu")
            .join(dy, "cv")
            .select(
                F.col("cu").alias("u"),
                F.col("cv").alias("v"),
                "n_common",
                F.expr("(n_common * 1000) div (du + dv - n_common)").alias(
                    "jaccard_permille"
                ),
            )
        )
        return scored.orderBy(
            F.col("jaccard_permille").desc(), "u", "v"
        ).limit(20)

    variants = os.environ.get(
        "AB_VARIANTS", "base,wide,packed,wp,wpmore"
    ).split(",")

    # Warmup + parity check: every variant must return the identical top-20.
    ref = None
    for v in variants:
        rows = [tuple(r) for r in build(v).collect()]
        if ref is None:
            ref = rows
        elif rows != ref:
            print(f"PARITY FAIL for {v}:", file=sys.stderr)
            print(f"  ref  : {ref[:3]}", file=sys.stderr)
            print(f"  got  : {rows[:3]}", file=sys.stderr)
            return 1
    print(f"parity OK across {variants}", file=sys.stderr)

    def _await_quiet(max_wait: float, probe: float = 10.0) -> None:
        # bench.py's measurement hygiene: hold (bounded) for a window
        # where the hypervisor is taking < 1% before starting a pass.
        waited = 0.0
        while waited < max_wait:
            s0 = _steal()
            time.sleep(probe)
            waited += probe
            if _steal() - s0 < 0.1:
                return
            print("  waiting for quiet window", file=sys.stderr)

    best: dict[str, float] = {}
    best_clean: dict[str, bool] = {}
    for p in range(passes):
        if all(best_clean.get(v) for v in variants):
            break
        _await_quiet(max_wait=120.0)
        for v in variants:
            s0 = _steal()
            t0 = time.perf_counter()
            build(v).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 2)
            dirty = _steal() - s0 >= 0.5
            cur_clean = best_clean.get(v, False)
            if v not in best or (
                not (dirty and cur_clean)
                and (dt < best[v] or (not dirty and not cur_clean))
            ):
                best[v] = dt
                best_clean[v] = not dirty
            print(
                f"  pass{p} {v}: {dt:.2f}s" + (" [steal]" if dirty else ""),
                file=sys.stderr,
            )
    for v in variants:
        mark = "" if best_clean.get(v) else " [steal]"
        print(f"BEST {v}: {best[v]:.2f}s{mark}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
