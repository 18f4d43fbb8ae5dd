"""Python DataSource WRITER: sharded-JSONL sink with a two-phase commit.

Completes the Python DataSource API surface (the zip source covers
``reader`` and ``streamReader``; this adds ``writer``) with the one sink
shape training pipelines actually ship: newline-delimited JSON shards, one
per task, written ATOMICALLY via the DSv2 commit protocol —

* each task writes ``_tmp_<uuid>.jsonl`` and returns the name in its
  ``WriterCommitMessage``;
* the driver's ``commit`` renames every temp shard to its final
  ``part-NNNNN.jsonl`` name — a failed/retried task's orphan temp file is
  simply never renamed (and ``abort`` sweeps temps), so the visible
  directory is all-or-nothing;
* rows serialize with ``sort_keys`` + compact separators, so shard bytes
  are a pure function of row content (order within a shard follows the
  task's iterator).

The reference writes Parquet only (/root/reference/src/builder.rs:252-276);
this sink is extension surface, structured the way Spark's own
FileFormatWriter does commits (task temp → driver-side finalize).

Scale shape: one shard per task, no driver data funnel — the driver
handles only O(num-tasks) commit messages; shard count = upstream
partitioning, controlled the usual way (repartition/coalesce).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _ShardCommit(WriterCommitMessage):
    tmp_name: str
    n_rows: int


class JsonlShardWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards sink requires a path")

    def write(self, iterator) -> _ShardCommit:
        os.makedirs(self.path, exist_ok=True)
        tmp = f"_tmp_{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        row.asDict(recursive=True),
                        sort_keys=True,
                        separators=(",", ":"),
                        default=str,
                    )
                )
                f.write("\n")
                n += 1
        return _ShardCommit(tmp_name=tmp, n_rows=n)

    def commit(self, messages) -> None:
        # Two-phase finalize: only shards whose task REPORTED SUCCESS get
        # their final name; orphan temps from failed attempts stay
        # invisible to readers (and are swept below).
        named = set()
        for i, msg in enumerate(messages):
            final = f"part-{i:05d}.jsonl"
            os.replace(
                os.path.join(self.path, msg.tmp_name),
                os.path.join(self.path, final),
            )
            named.add(final)
        for f in os.listdir(self.path):
            if f.startswith("_tmp_"):
                os.remove(os.path.join(self.path, f))
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write("")

    def abort(self, messages) -> None:
        for f in os.listdir(self.path):
            if f.startswith("_tmp_"):
                os.remove(os.path.join(self.path, f))


class JsonlShardsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite: bool) -> JsonlShardWriter:
        w = JsonlShardWriter(self.options)
        if overwrite and os.path.isdir(w.path):
            for f in os.listdir(w.path):
                if f.endswith(".jsonl") or f == "_SUCCESS":
                    os.remove(os.path.join(w.path, f))
        return w


def write_jsonl_shards(df, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as atomic JSONL shards via the Python DataSource
    writer (registers the source on the df's session, idempotent)."""
    spark = df.sparkSession
    try:
        spark.dataSource.register(JsonlShardsDataSource)
    except Exception:
        pass  # already registered under this name
    df.write.format("jsonl_shards").mode(mode).option("path", path).save()
