"""Phase-level timing for dedup_minhash_lsh (guide §1).

Times each stage of minhash_lsh_pairs_docs in isolation (noop sink /
checkpoint) at $SPARK_GRAFT_SF_DIR so the r15 round targets the measured
bottleneck: banding UDF pass vs bucket groupBy vs candidate checkpoint vs
verify joins. Per-phase steal is printed.
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
        SparkSession.builder.appName("z2ps-profile-minhash")
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

    from zip_to_parquet_spark.operators.dedupe import (
        _bucket_pairs,
        minhash_band_hashes_from_text_udf,
        shingle_sets,
    )
    from zip_to_parquet_spark.operators.textops import words
    from zip_to_parquet_spark.plans.llm import _documents_spread

    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    n = 3
    sig = minhash_band_hashes_from_text_udf(k=128, bands=32, seed=42, n=n)
    docs = _documents_spread(spark, sf_dir)
    base = docs.select(
        F.col("doc_id").alias("doc_id"), F.col("text").alias("text")
    ).filter(F.size(words(F.col("text"))) >= n)
    print(f"    |docs| = {base.count()}", file=sys.stderr)

    for i in range(3):
        sc.setJobDescription("phase1: banding UDF pass only")
        banded = base.select("doc_id", F.posexplode(sig("text"))).select(
            "doc_id",
            F.col("pos").alias("band_idx"),
            F.col("col").alias("band_hash"),
        )
        t(f"phase1 banding UDF noop #{i}", lambda: noop(banded))

        sc.setJobDescription("phase2: + bucket groupBy + pair explode + distinct")
        cand = (
            banded.groupBy("band_idx", "band_hash")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
            .filter(F.size("ids") > 1)
            .select(F.explode(_bucket_pairs(F.col("ids"))).alias("p"))
            .select("p.doc_a", "p.doc_b")
            .distinct()
        )
        t(f"phase2 candidates noop #{i}", lambda: noop(cand))

        sc.setJobDescription("phase3: candidate checkpoint")
        ck = t(
            f"phase3 cand ckpt #{i}",
            lambda: cand.localCheckpoint(eager=True),
        )
        print(f"    |cand| = {ck.count()}", file=sys.stderr)

        sc.setJobDescription("phase4: verify joins from checkpoint")
        cand_ids = (
            ck.select(F.col("doc_a").alias("doc_id"))
            .union(ck.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        sh_cand = shingle_sets(base.join(cand_ids, "doc_id"), n=n)
        sa = sh_cand.select(
            F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
        )
        sb = sh_cand.select(
            F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
        )
        from zip_to_parquet_spark.operators.dedupe import _jaccard

        ver = (
            ck.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                _jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= 0.8)
        )
        t(f"phase4 verify noop #{i}", lambda: noop(ver))

        sc.setJobDescription("full query (registry)")
        from zip_to_parquet_spark.plans import all_queries

        q = all_queries()["dedup_minhash_lsh"]
        t(f"full dedup_minhash_lsh #{i}", lambda: noop(q(spark, sf_dir)))

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
