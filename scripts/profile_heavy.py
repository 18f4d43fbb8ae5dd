"""Phase-level timing for the heavy link-prediction pipeline (guide §1).

Times each stage of the graph_jaccard_linkpred / _weighted_linkpred shape
in isolation (noop sink), at $SPARK_GRAFT_SF_DIR, so the optimization
round targets the measured bottleneck instead of the assumed one.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f}s", file=sys.stderr)
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

    from zip_to_parquet_spark.plans.scidata import (
        DEG_BROADCAST_MAX,
        _WEDGE_PAIRS_STRUCT,
        _copurchase_edges,
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

    hub = hub_centers(deg)
    undg = und.join(
        size_aware_side(hub, hub, DEG_BROADCAST_MAX), "v", "left_anti"
    )
    sc.setJobDescription("phase3: adjacency collect_list only")
    adj = undg.groupBy("v").agg(
        F.sort_array(F.collect_list("u")).alias("us")
    )
    t("phase3 adj noop", lambda: noop(adj))

    sc.setJobDescription("phase4: wedge explode only (no agg)")
    pairs = adj.select(
        F.explode(F.expr(_WEDGE_PAIRS_STRUCT)).alias("p")
    ).select("p.cu", "p.cv")
    t("phase4 wedge explode noop", lambda: noop(pairs))

    sc.setJobDescription("phase5: wedge + pair-count aggregation")
    cn = pairs.groupBy("cu", "cv").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    t("phase5 cn agg noop", lambda: noop(cn))
    print(f"    |cn| = {cn.count()}", file=sys.stderr)

    sc.setJobDescription("phase6: + anti-join")
    nonedge = cn.join(
        e.hint("shuffle_hash"),
        (e.u == cn.cu) & (e.v == cn.cv),
        "left_anti",
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
    t("full graph_jaccard_linkpred", lambda: noop(q(spark, sf_dir)))

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
