"""Operational behaviors a production deployment leans on — exercised
against the real session so upgrades cannot silently change them:
corrupt-input tolerance, in-flight metric observation, and the
merged-schema read contract (the query-key side of which is
scan_schema_evolution)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from zip_to_parquet_spark.schema import load_table

SF = "/root/testdata/sf0.001"


def test_ignore_corrupt_files_salvages_good_shards(spark, tmp_path):
    """A 100 TB landing dir WILL contain truncated/garbage files; with
    spark.sql.files.ignoreCorruptFiles the scan salvages every healthy
    shard instead of failing the job. Default (fail-fast) must raise."""
    good = load_table(spark, SF, "region")
    n_good = good.count()
    good.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "d"))
    with open(tmp_path / "d" / "part-corrupt.parquet", "wb") as f:
        f.write(b"PAR1 this is not a parquet file")

    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception):
        spark.read.parquet(str(tmp_path / "d")).count()

    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        got = spark.read.parquet(str(tmp_path / "d")).count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)
    assert got == n_good


def test_observe_metrics_ride_the_job(spark):
    """df.observe(): QA metrics computed IN-FLIGHT on the same pass as
    the action — no second scan — via the collected-metrics API. The
    zero-extra-pass property is why production pipelines attach row
    counts / null budgets to every write this way."""
    from pyspark.sql import Observation

    obs = Observation("qa")
    df = (
        load_table(spark, SF, "lineitem")
        .observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum(
                F.when(F.col("l_quantity").isNull(), 1).otherwise(0)
            ).alias("null_qty"),
        )
        .filter(F.col("l_quantity") > 25)
    )
    n_filtered = df.count()
    m = obs.get
    # The observation sees PRE-filter traffic (it rides the scan).
    assert m["rows_seen"] > n_filtered > 0
    assert m["null_qty"] == 0
