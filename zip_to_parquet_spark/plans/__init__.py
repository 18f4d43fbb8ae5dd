"""Named query registry backing ``__spark_entry__.queries()``.

Importing this package registers every query module; the driver-facing
surface is ``all_queries()`` / ``all_oracle_sql()``.
"""

from __future__ import annotations

from zip_to_parquet_spark.plans.registry import all_oracle_sql, all_queries, query

# Import for side effect: each module registers its queries.
from zip_to_parquet_spark.plans import relational  # noqa: E402,F401
from zip_to_parquet_spark.plans import llm  # noqa: E402,F401
from zip_to_parquet_spark.plans import zipparity  # noqa: E402,F401
from zip_to_parquet_spark.plans import streamingq  # noqa: E402,F401
from zip_to_parquet_spark.plans import temporal  # noqa: E402,F401

__all__ = ["all_queries", "all_oracle_sql", "query"]
