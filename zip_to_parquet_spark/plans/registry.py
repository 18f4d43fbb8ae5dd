"""Registry mapping query keys → (PySpark callable, optional DuckDB oracle).

Every operator from SURVEY.md §2/§7 that we claim as implemented gets one
entry here; the driver runs the Spark callable and the oracle SQL
side-by-side at sf0.01 and hash-compares results (order-insensitive,
column-name-sorted — hence the "alias everything identically" rule).

Queries whose semantics DuckDB can't express (approximate LSH joins,
stateful streaming) register with ``oracle=None`` → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name`` with an optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query key: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver hands us a session whose Python workers don't have
            # this package on their path; ship it (idempotent) so pickled
            # data sources / pandas UDFs can be unpickled worker-side.
            from zip_to_parquet_spark.runtime import ensure_shipped

            ensure_shipped(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def all_oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
