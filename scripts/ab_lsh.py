"""Interleaved A/B for ann_lsh_topk variants (guide §1).

The shipped plan expands the hyperplane-signature subtree FOUR times
(the bucket join's q/c legs, each under two consumers) and runs the
candidate `.distinct()` over rows carrying BOTH 64-dim vectors
(~1 KB/row — guide §2.3: shuffle keys, not payloads). Variants:

  base : shipped pipeline
  sig  : localCheckpoint the signed corpus (one signature pass; the
         guide §8 "fingerprint table" shape) — bucket join legs read
         the materialized rows
  slim : sig + the candidate distinct runs over (q_id, n_id) ID PAIRS
         only; vectors and norms join back from the materialized
         signed table afterwards

Parity: all variants must return identical (q_id, n_id, cos_sim, rank)
sets (vectors are functions of the ids, so distinct-over-ids equals
distinct-over-ids+payload; the cosine evaluates the same doubles).
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
    passes = int(os.environ.get("AB_PASSES", "4"))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = (
        SparkSession.builder.appName("z2ps-ab-lsh")
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

    from zip_to_parquet_spark.operators.vectors import (
        dot,
        hyperplane_multitable_udf,
        l2_norm,
    )
    from zip_to_parquet_spark.plans.llm import _embeddings_spread

    def build(variant: str):
        emb = _embeddings_spread(spark, sf_dir)
        dim = 64
        sig = hyperplane_multitable_udf(dim=dim, n_planes=6, n_tables=16, seed=42)
        signed = emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ).select(
            "vec_id",
            "v",
            l2_norm(F.col("v")).alias("nrm"),
            sig(F.col("v")).alias("buckets"),
        )
        if variant in ("sig", "slim"):
            signed = signed.localCheckpoint(eager=True)
        tabbed = signed.select(
            "vec_id", "v", "nrm",
            F.posexplode("buckets").alias("table_idx", "bucket"),
        )
        if variant == "slim":
            qk = tabbed.filter(F.col("vec_id") % 25 == 0).select(
                F.col("vec_id").alias("q_id"), "table_idx", "bucket"
            )
            ck = tabbed.select(
                F.col("vec_id").alias("n_id"), "table_idx", "bucket"
            )
            ids = (
                qk.join(ck, ["table_idx", "bucket"])
                .filter(F.col("q_id") != F.col("n_id"))
                .select("q_id", "n_id")
                .distinct()
            )
            qv = signed.select(
                F.col("vec_id").alias("q_id"),
                F.col("v").alias("qv"),
                F.col("nrm").alias("nq"),
            )
            cv = signed.select(
                F.col("vec_id").alias("n_id"),
                F.col("v").alias("cv"),
                F.col("nrm").alias("nv"),
            )
            cand = ids.join(qv, "q_id").join(cv, "n_id")
        else:
            q = tabbed.filter(F.col("vec_id") % 25 == 0).select(
                F.col("vec_id").alias("q_id"),
                F.col("v").alias("qv"),
                F.col("nrm").alias("nq"),
                "table_idx",
                "bucket",
            )
            c = tabbed.select(
                F.col("vec_id").alias("n_id"),
                F.col("v").alias("cv"),
                F.col("nrm").alias("nv"),
                "table_idx",
                "bucket",
            )
            cand = (
                q.join(c, ["table_idx", "bucket"])
                .filter(F.col("q_id") != F.col("n_id"))
                .select("q_id", "qv", "nq", "n_id", "cv", "nv")
                .distinct()
            )
        sim = F.round(
            F.try_divide(dot(F.col("qv"), F.col("cv")), F.col("nq") * F.col("nv")),
            6,
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("cos_sim").desc(), F.col("n_id")
        )
        return (
            cand.select("q_id", "n_id", sim.alias("cos_sim"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
        )

    variants = os.environ.get("AB_VARIANTS", "base,sig,slim").split(",")

    ref = None
    for v in variants:
        rows = sorted(tuple(r) for r in build(v).collect())
        if ref is None:
            ref = rows
        elif rows != ref:
            print(f"PARITY FAIL for {v}", file=sys.stderr)
            return 1
    print(f"parity OK across {variants} ({len(ref)} rows)", file=sys.stderr)

    best: dict[str, float] = {}
    best_clean: dict[str, bool] = {}
    for p in range(passes):
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
