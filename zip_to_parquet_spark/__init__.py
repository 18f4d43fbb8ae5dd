"""zip_to_parquet_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ``mcpar-land/zip-to-parquet``
(a Rust zip→parquet ETL CLI, see ``/root/reference/src/builder.rs``) as an
idiomatic Spark DataFrame engine, and extends it with the relational operator
library and LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) described in SURVEY.md §2/§7.

Layout:
    session.py     SparkSession construction with scale-aware defaults
    schema.py      explicit StructTypes (zip-member table + driver fixtures)
    sources/       zip-archive source (the reference's A1/A2/A3 surface)
    sinks.py       parquet sink with row-group/compression control (A4/A5)
    functions/     scalar helpers (glob→regex, sha256, vector math)
    operators/     relational + LLM-pipeline operator library
    plans/         named query registry backing __spark_entry__.queries()
    streaming/     Structured Streaming variants over the events table
"""

__version__ = "0.1.0"
