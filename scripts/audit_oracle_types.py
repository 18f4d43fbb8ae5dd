"""Audit: DuckDB oracle result types vs Spark query schema, per registry key.

The driver's value hash is type-sensitive (round 2's only hash fail was
DuckDB HUGEINT vs Spark BIGINT with bitwise-identical values), so any
type divergence between the two sides is a latent hash fail even when the
pytest value-parity sweep is green. This audit builds every Spark plan
(schema only — no execution) and prepares every oracle with LIMIT 0 in
DuckDB, then diffs canonical type names column by column.

It ALSO runs every oracle to completion and applies the pandas
MATERIALIZATION-OVERFLOW gate (the round-5/6 lesson): the driver
materializes the DuckDB side via pandas, where every DECIMAL/HUGEINT
column degrades to float64 — lossless below 2^53, silently rounding
above it — while Spark returns exact Decimals, so the value hash
diverges on keys whose VALUES are big even when their declared types
match. Any DECIMAL/HUGEINT-sourced column whose max |value| exceeds
2^53 is a hard FAIL; within 100× of the cliff is a WARN (the driver
runs at 10× this script's default sf, so headroom matters).

Usage: python scripts/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_duck(t: str) -> str:
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return t.replace(" ", "")
    return {
        "VARCHAR": "string",
        "BIGINT": "long",
        "INTEGER": "int",
        "SMALLINT": "short",
        "TINYINT": "byte",
        "HUGEINT": "HUGEINT!",
        "UHUGEINT": "HUGEINT!",
        "DOUBLE": "double",
        "FLOAT": "float",
        "BOOLEAN": "boolean",
        "DATE": "date",
        "TIMESTAMP": "timestamp",
        "TIMESTAMP_NS": "timestamp",
        "BLOB": "binary",
    }.get(t, t)


def canon_spark(t) -> str:
    s = t.simpleString()
    if s.startswith("decimal"):
        return s.upper().replace(" ", "")
    return {
        "bigint": "long",
        "timestamp_ntz": "timestamp",
    }.get(s, s)


FLOAT64_EXACT_MAX = 2**53  # largest contiguous exact integer in float64


def materialization_overflow(con, oracle: str) -> tuple[dict, dict]:
    """Run an oracle and return ({col: max_abs}, {col: max_abs}) for
    DECIMAL/HUGEINT columns that (hard) exceed 2^53 or (warn) sit within
    100x of it. These columns become float64 on the driver's pandas path.
    """
    rel = con.sql(f"SELECT * FROM ({oracle})")
    cols = list(rel.columns)
    degrading = {
        i
        for i, t in enumerate(rel.types)
        if str(t).upper().startswith(("DECIMAL", "NUMERIC", "HUGEINT", "UHUGEINT"))
    }
    hard: dict[str, float] = {}
    warn: dict[str, float] = {}
    if not degrading:
        return hard, warn
    maxabs = {i: 0 for i in degrading}
    for row in rel.fetchall():
        for i in degrading:
            v = row[i]
            if v is not None:
                a = abs(v)
                if a > maxabs[i]:
                    maxabs[i] = a
    for i, a in maxabs.items():
        if a > FLOAT64_EXACT_MAX:
            hard[cols[i]] = float(a)
        elif a > FLOAT64_EXACT_MAX // 100:
            warn[cols[i]] = float(a)
    return hard, warn


def main() -> int:
    from zip_to_parquet_spark.plans import all_oracle_sql, all_queries
    from zip_to_parquet_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, oracles = all_queries(), all_oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            s_types = {f.name: canon_spark(f.dataType) for f in sdf.schema.fields}
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: SPARK PLAN ERROR: {exc}")
            bad += 1
            continue
        try:
            rel = con.sql(f"SELECT * FROM ({oracles[name]}) LIMIT 0")
            d_types = {
                c: canon_duck(t) for c, t in zip(rel.columns, rel.types)
            }
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: DUCKDB PREPARE ERROR: {exc}")
            bad += 1
            continue
        if set(s_types) != set(d_types):
            print(f"{name}: COLUMN SET MISMATCH spark={sorted(s_types)} duck={sorted(d_types)}")
            bad += 1
            continue
        # int-vs-long divergence is benign: round 2's driver hash passed on
        # 11 keys carrying exactly that diff (integer widths normalize on
        # both sides). HUGEINT is NOT benign — DuckDB's arrow export maps it
        # to decimal128(38,0), which the value hash distinguishes (round 2's
        # only hash fail).
        diffs = {
            c: (s_types[c], d_types[c])
            for c in s_types
            if s_types[c] != d_types[c]
            and {s_types[c], d_types[c]} != {"int", "long"}
        }
        if diffs:
            print(f"{name}: TYPE DIFFS {diffs}")
            bad += 1
            continue
        try:
            hard, soft = materialization_overflow(con, oracles[name])
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: DUCKDB EXEC ERROR: {exc}")
            bad += 1
            continue
        if hard:
            print(
                f"{name}: MATERIALIZATION OVERFLOW (decimal values exceed "
                f"float64's 2^53 exact range; driver pandas path will round) "
                f"{hard}"
            )
            bad += 1
        elif soft:
            print(
                f"{name}: overflow WARNING (within 100x of 2^53; may cross "
                f"the cliff at driver sf) {soft}"
            )
    print(f"audited {len([k for k in qs if k in oracles])} oracle pairs, {bad} with diffs")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
