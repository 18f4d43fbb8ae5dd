"""Phase-level timing for the heavy link-prediction pipeline (guide §1).

Times each stage of the SHIPPED (r14 wide+packed+raw-exchange)
graph_jaccard_linkpred shape in isolation (noop sink), at
$SPARK_GRAFT_SF_DIR, so the optimization round targets the measured
bottleneck instead of the assumed one.  Per-pass steal is printed so a
storm-contaminated phase is diagnosable.
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
    except OSError:  # pragma: no cover
        return 0.0


def t(label, fn):
    s0 = _steal()
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    d = _steal() - s0
    mark = " [steal %.1fs]" % d if d >= 0.5 else ""
    print(f"  {label}: {dt:.2f}s{mark}", file=sys.stderr)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("z2ps-profile-heavy")
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
        _WEDGE_PAIRS_PACKED,
        _copurchase_edges,
        _max_node,
        _wedge_width,
        hub_centers,
    )
    from zip_to_parquet_spark.runtime import size_aware_side
    from zip_to_parquet_spark.schema import load_table

    sc = spark.sparkContext

    # Warmup: basic codegen + scan.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    lp = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    t("warm lineitem distinct", lambda: noop(lp))

    # --- edge-build sub-phases -------------------------------------------
    sc.setJobDescription("phase0a: lp distinct")
    t("phase0a lp distinct noop", lambda: noop(lp))
    sc.setJobDescription("phase0b: capped self-join pre-distinct")
    cb = capped_baskets(lp)
    raw_pairs = (
        cb.alias("a")
        .join(cb.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
    )
    t("phase0b raw pairs noop", lambda: noop(raw_pairs))
    print(f"    |raw pairs| = {raw_pairs.count()}", file=sys.stderr)

    sc.setJobDescription("phase1: copurchase edges (eager checkpoint)")
    e = t("phase1 edges ckpt", lambda: _copurchase_edges(spark, sf_dir))
    print(f"    |e| = {e.count()}", file=sys.stderr)

    und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sc.setJobDescription("phase2: degree (eager checkpoint)")
    deg = t(
        "phase2 deg ckpt",
        lambda: und.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .localCheckpoint(eager=True),
    )
    print(f"    |nodes| = {deg.count()}", file=sys.stderr)
    t("phase2b max_node probe", lambda: _max_node(deg))

    hub = hub_centers(deg)
    undg = und.join(
        size_aware_side(hub, hub, DEG_BROADCAST_MAX), "v", "left_anti"
    )
    W = _wedge_width(spark)
    undg = undg.repartition(W, "v")
    sc.setJobDescription("phase3: adjacency collect_list (wide)")
    adj = undg.groupBy("v").agg(
        F.sort_array(F.collect_list("u")).alias("us")
    )
    t("phase3 adj noop", lambda: noop(adj))

    sc.setJobDescription("phase4: packed wedge explode only (no exchange)")
    pairs = adj.select(F.explode(F.expr(_WEDGE_PAIRS_PACKED)).alias("pk"))
    t("phase4 wedge explode noop", lambda: noop(pairs))
    print(f"    |pairs raw| = {pairs.count()}", file=sys.stderr)

    sc.setJobDescription("phase5: + raw-pair exchange + count agg")
    cn = (
        pairs.repartition(2 * W, "pk")
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    t("phase5 cn agg noop", lambda: noop(cn))
    print(f"    |cn| = {cn.count()}", file=sys.stderr)

    sc.setJobDescription("phase6: + anti-join")
    ep = e.select(F.shiftleft("u", 32).bitwiseOR(F.col("v")).alias("pk"))
    nonedge = cn.join(ep.hint("shuffle_hash"), "pk", "left_anti").select(
        F.shiftright("pk", 32).alias("cu"),
        F.expr("pk & 4294967295").alias("cv"),
        "n_common",
    )
    t("phase6 antijoin noop", lambda: noop(nonedge))

    sc.setJobDescription("phase7: + degree joins + score + top20")
    deg_side = size_aware_side(deg, deg, DEG_BROADCAST_MAX)
    dx = deg_side.select(F.col("node").alias("cu"), F.col("deg").alias("du"))
    dy = deg_side.select(F.col("node").alias("cv"), F.col("deg").alias("dv"))
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
    t(
        "phase7 full top20 noop",
        lambda: noop(
            scored.orderBy(F.col("jaccard_permille").desc(), "u", "v").limit(20)
        ),
    )

    sc.setJobDescription("full query (registry)")
    from zip_to_parquet_spark.plans import all_queries

    q = all_queries()["graph_jaccard_linkpred"]
    for i in range(3):
        t(f"full graph_jaccard_linkpred #{i}", lambda: noop(q(spark, sf_dir)))

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
