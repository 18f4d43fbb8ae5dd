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

    # Fail-fast default: the error must actually be about the bad file
    # (footer/parquet parse), not an incidental path/schema problem.
    with pytest.raises(Exception, match=r"(?i)footer|parquet|corrupt"):
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


def test_aqe_coalesces_small_shuffles(spark):
    """AQE must be live: a 32-partition shuffle over tiny data coalesces
    at runtime (AQEShuffleRead coalesced) — the mechanism that right-
    sizes reducer counts at 100 TB without hand-tuning
    spark.sql.shuffle.partitions per stage."""
    import contextlib
    import io

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    df = (
        load_table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()  # AQE final plan exists only after execution
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "AQEShuffleRead" in plan
    assert "coalesced" in plan.lower()


def test_parquet_zstd_codec_roundtrip(spark, tmp_path):
    """zstd parquet output (the modern storage-cost default) must be a
    first-class sink option: codec recorded in the file metadata,
    lossless round-trip."""
    import pyarrow.parquet as pq

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    out = str(tmp_path / "zstd")
    docs.write.option("compression", "zstd").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.collect()}
    assert {tuple(r) for r in back.collect()} == a
    part = next(
        p for p in os.listdir(out) if p.endswith(".parquet")
    )
    meta = pq.ParquetFile(os.path.join(out, part)).metadata
    assert meta.row_group(0).column(0).compression == "ZSTD"
