"""Data-quality expectation checks — the Deequ/Great-Expectations-style
ingestion gate, as one declarative report plan.

A 100 TB warehouse runs these on every load: row volume, null budgets,
primary-key uniqueness, referential integrity, value domains. Each check
here is a Catalyst aggregate (never a collect-and-inspect loop), metrics
are exact integers (violation counts, micro-unit fractions — no float
seam), and the whole report is ONE DataFrame so it can be sunk, alerted
on, or hash-verified like any other relation.

Scale notes per check: row/null/bounds/domain checks are scan+partial-agg
(map-side combine, one tiny shuffle); uniqueness is one groupBy on the
key (its natural cardinality — no hot key); referential integrity is a
LEFT ANTI join that Spark broadcasts when the dimension side fits, the
same size-aware decision every FK validation at scale wants.

Reference: the zip CLI validates nothing beyond CLI flags (SURVEY §2 H);
north-star warehouse extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["expectations_report"]

MICRO = 1_000_000


def expectations_report(
    lineitem: DataFrame, orders: DataFrame
) -> DataFrame:
    """Six-constraint report over the lineitem fact (with orders as the
    referenced dimension) → ``(constraint, metric, passed)``, one row per
    check. ``metric`` semantics per row: a count for volume/violation
    checks, a micro-unit fraction for the null-budget check."""
    li = lineitem

    row_count = li.agg(
        F.lit("row_count_positive").alias("constraint"),
        F.count(F.lit(1)).alias("metric"),
        (F.count(F.lit(1)) > 0).alias("passed"),
    )

    nulls = li.agg(
        F.lit("shipdate_null_fraction_micro").alias("constraint"),
        F.expr(
            f"cast(sum(if(l_shipdate is null, 1, 0)) * {MICRO}"
            " div count(*) as bigint)"
        ).alias("metric"),
        (F.sum(F.expr("if(l_shipdate is null, 1, 0)")) == 0).alias("passed"),
    )

    dup_groups = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.lit("pk_unique_orderkey_linenumber").alias("constraint"),
            F.coalesce(
                F.sum(F.expr("if(c > 1, 1, 0)")), F.lit(0)
            ).cast("long").alias("metric"),
        )
        .withColumn("passed", F.col("metric") == 0)
    )

    orphans = (
        li.select("l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(
            F.lit("fk_orderkey_in_orders").alias("constraint"),
            F.count(F.lit(1)).alias("metric"),
        )
        .withColumn("passed", F.col("metric") == 0)
    )

    bounds = li.agg(
        F.lit("quantity_in_1_to_50").alias("constraint"),
        F.coalesce(
            F.sum(F.expr("if(l_quantity < 1 or l_quantity > 50, 1, 0)")),
            F.lit(0),
        ).cast("long").alias("metric"),
    ).withColumn("passed", F.col("metric") == 0)

    domain = li.agg(
        F.lit("returnflag_in_domain").alias("constraint"),
        F.coalesce(
            F.sum(F.expr("if(l_returnflag not in ('A', 'N', 'R'), 1, 0)")),
            F.lit(0),
        ).cast("long").alias("metric"),
    ).withColumn("passed", F.col("metric") == 0)

    report = row_count
    for part in (nulls, dup_groups, orphans, bounds, domain):
        report = report.unionByName(part)
    return report
