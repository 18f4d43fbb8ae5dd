"""Sources: the zip-archive member source (reference A1/A2/A3)."""

from zip_to_parquet_spark.sources.zipsource import count_members, read_zip_members

__all__ = ["read_zip_members", "count_members"]
