#!/usr/bin/env python
"""Degenerate-input robustness sweep over every DuckDB oracle.

The Levene/Brown-Forsythe bug class (ADVICE r10; direction corrected per
ADVICE r11): DuckDB's ``//`` yields NULL on a zero denominator while
Spark's ANSI ``div`` raises DIVIDE_BY_ZERO, so a degenerate corpus
(constant values, single categories, size-1 groups, zero vectors) can
make EITHER engine error where the other answers — an engine-divergent
edge the sf0.001/sf0.01 fixtures never reach because they are generated
non-degenerate. This sweep runs ALL registered oracles against a tiny
hand-built worst-case fixture and reports every oracle that raises.

Fixture degeneracies planted: one region/nation/supplier; constant
customer balances and a single market segment; constant order totalprice
(ANOVA ssw = 0) on two days with equal order counts (zero daily variance);
a single lineitem part (empty co-purchase graph) with constant
quantity/price; ONE event_type (k = 1 groups) with constant value and
equal daily counts (zero autocorrelation variance, no conversions);
constant single-lang documents; a zero embedding vector (zero norm).

Usage::

    python scripts/degenerate_sweep.py [-v]          # DuckDB oracles
    python scripts/degenerate_sweep.py --spark [-v]  # Spark queries too
                                                     # (driver-like bare
                                                     # session, ANSI
                                                     # defaults — catches
                                                     # the symmetric risk:
                                                     # Spark erroring where
                                                     # DuckDB survives)
    python scripts/degenerate_sweep.py --empty [...] # all tables EMPTY —
                                                     # the most common real
                                                     # degenerate state (a
                                                     # filter matching
                                                     # nothing)

Exit status 1 if anything errors.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from zip_to_parquet_spark.plans import all_oracle_sql  # noqa: E402

DDL = """
CREATE TABLE region AS SELECT 0::INTEGER r_regionkey, 'R' r_name;
CREATE TABLE nation AS SELECT 0::INTEGER n_nationkey, 'N' n_name,
    0::INTEGER n_regionkey;
CREATE TABLE customer AS
  SELECT i::BIGINT c_custkey, 'c' || i c_name, 0::INTEGER c_nationkey,
         100.0::DOUBLE c_acctbal, 'SEG' c_mktsegment
  FROM range(1, 3) t(i);
CREATE TABLE supplier AS SELECT 1::BIGINT s_suppkey, 's1' s_name,
    0::INTEGER s_nationkey, 100.0::DOUBLE s_acctbal;
CREATE TABLE part AS
  SELECT i::BIGINT p_partkey, 'p' || i p_name, 'B' p_brand, 'T' p_type,
         1::INTEGER p_size, 10.0::DOUBLE p_retailprice
  FROM range(1, 3) t(i);
CREATE TABLE orders AS
  SELECT i::BIGINT o_orderkey, 1::BIGINT o_custkey, 'F' o_orderstatus,
         100.0::DOUBLE o_totalprice,
         (TIMESTAMP '2024-01-01 00:00:00'
          + INTERVAL (i % 2) DAY) o_orderdate,
         '1-URGENT' o_orderpriority
  FROM range(1, 5) t(i);
CREATE TABLE lineitem AS
  SELECT i::BIGINT l_orderkey, 1::BIGINT l_partkey, 1::BIGINT l_suppkey,
         1::INTEGER l_linenumber, 1.0::DOUBLE l_quantity,
         10.0::DOUBLE l_extendedprice, 0.0::DOUBLE l_discount,
         0.0::DOUBLE l_tax, 'N' l_returnflag, 'O' l_linestatus,
         (TIMESTAMP '2024-01-03 00:00:00'
          + INTERVAL (i % 2) DAY) l_shipdate
  FROM range(1, 5) t(i);
CREATE TABLE events AS
  SELECT i::BIGINT event_id,
         (TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i % 4) DAY
          + INTERVAL (i) MINUTE) ts,
         1::BIGINT user_id, 'view' event_type, 60.0::DOUBLE "value",
         '{}' props
  FROM range(1, 9) t(i);
CREATE TABLE documents AS
  SELECT i::BIGINT doc_id, 'aaa aaa aaa. aaa aaa.' "text", 'en' lang,
         'web' source, 21::BIGINT n_chars
  FROM range(1, 3) t(i);
CREATE TABLE embeddings AS
  SELECT 1::BIGINT vec_id,
         list_transform(range(64), x -> 0.0::FLOAT) embedding,
         0::INTEGER "label"
  UNION ALL
  SELECT 2, list_transform(range(64), x -> 1.0::FLOAT), 0;
"""


def _build(con: duckdb.DuckDBPyConnection, empty: bool = False) -> None:
    for stmt in DDL.strip().split(";"):
        if stmt.strip():
            con.execute(stmt)
    if empty:
        for t in ("region nation customer supplier part orders "
                  "lineitem events documents embeddings").split():
            con.execute(f"DELETE FROM {t}")


def _sweep_oracles(con: duckdb.DuckDBPyConnection, verbose: bool):
    failures: list[tuple[str, str]] = []
    for key, sql in sorted(all_oracle_sql().items()):
        try:
            con.execute(sql).fetchall()
            if verbose:
                print(f"ok   oracle {key}")
        except Exception as e:  # noqa: BLE001 - report every failure kind
            failures.append((key, f"{type(e).__name__}: {e}"))
    return failures


# Keys whose DEGENERATE-input failure is a deliberate, explanatory
# precondition error rather than an engine-divergence bug: the ANN /
# codebook family refuses to train 16-32 centroids from a 2-row corpus or
# to search with an empty/ill-posed query set, and the fused-retrieval key
# requires its pinned query vector to exist. Silently returning empty
# would hide an ill-posed request; the loud error IS the contract. Each
# must raise ValueError (explanatory), never a bare Index/Axis error.
EXPECTED_PRECONDITION_ERRORS = {
    "customer_rfm_segments",  # quantile cuts need a non-empty corpus
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_trained",
    "ann_ivfpq_topk",
    "ann_ndcg_eval",
    "ann_nprobe_curve",
    "ann_pq_topk",
    "ann_recall_eval",
    "dedup_semantic",
    "retrieval_rrf_fusion",
    "vector_matryoshka_recall",
}


def _sweep_spark(fixture_dir: str, verbose: bool):
    from pyspark.sql import SparkSession

    from zip_to_parquet_spark.plans import all_queries

    # Bare driver-like session: ANSI and every other default as the driver
    # would have them — engine-required confs must be applied at runtime by
    # the engine itself (the verify-skill rule).
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    failures: list[tuple[str, str]] = []
    for key, fn in sorted(all_queries().items()):
        try:
            fn(spark, fixture_dir).collect()
            if verbose:
                print(f"ok   spark  {key}")
        except ValueError as e:
            if key in EXPECTED_PRECONDITION_ERRORS:
                if verbose:
                    print(f"ok   spark  {key} (expected precondition: {e})")
                continue
            failures.append((key, f"ValueError: {e}"))
        except Exception as e:  # noqa: BLE001 - report every failure kind
            failures.append((key, f"{type(e).__name__}: {e}"))
    spark.stop()
    return failures


def main() -> int:
    verbose = "-v" in sys.argv
    empty = "--empty" in sys.argv
    label = "empty" if empty else "degenerate"
    con = duckdb.connect()
    _build(con, empty=empty)
    failures = _sweep_oracles(con, verbose)
    n = len(all_oracle_sql())
    print(f"swept {n} oracles on the {label} fixture:"
          f" {len(failures)} errored")
    if "--spark" in sys.argv:
        import tempfile

        with tempfile.TemporaryDirectory(prefix="degenerate_sf") as d:
            for t in ("region nation customer supplier part orders "
                      "lineitem events documents embeddings").split():
                con.execute(
                    f"COPY (SELECT * FROM {t}) TO '{d}/{t}.parquet'"
                    " (FORMAT PARQUET)"
                )
            sf = _sweep_spark(d, verbose)
        print(f"swept spark queries on the same fixture: {len(sf)} errored")
        failures += [(f"spark:{k}", e) for k, e in sf]
    for key, err in failures:
        print(f"ERR  {key}: {err.splitlines()[0][:160]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
