"""Tar / tar.gz member source — the stream-only sibling of the zip source.

Why a different execution shape than ``sources/zipsource.py``: zip ends
with a central directory, so that source can list members WITHOUT
decompression, push name predicates pre-extraction, split jumbo archives
by member-index range, and count members metadata-only (SURVEY §3;
reference behavior at ``/root/reference/src/builder.rs:173-226``). Tar has
NO index — it is a sequence of 512-byte header blocks, gzip-wrapped in the
common ``.tar.gz`` case, so the only correct access pattern is ONE
sequential pass per archive. The idiomatic Spark plan for that is:

    binaryFile scan (one input split per archive, Spark handles globbing,
    locality, and partition packing) → ``mapInPandas`` explode (stdlib
    ``tarfile`` over the in-memory bytes, Arrow-batched output)

Member-name glob filtering happens INSIDE the pass, before bodies are
materialized into the output batch — the B1-equivalent pushdown tar can
offer (skipping data bytes of non-matching members costs a seek, not a
decompression... except under gzip, where the stream must be inflated to
advance; that cost is inherent to the format, not the plan).

Output schema and null semantics match the zip source (and the
reference's fixed 4-column layout, ``builder.rs:256-274``): ``name``
never null; ``source``/``body``/``hash`` nullable via flags that NULL
values rather than drop columns.

Memory: one archive's bytes per task (binaryFile row) — bounded by the
largest archive, the accepted trade for a format with no random access;
shard giant tars upstream (the same advice the reference's one-thread-
per-zip model implies, ``builder.rs:54-73``).
"""

# NOTE: no `from __future__ import annotations` — pandas-UDF type hints
# must stay resolvable at runtime (same constraint as operators/vectors).

import hashlib
import io
import re
import tarfile
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from zip_to_parquet_spark.functions.globs import glob_to_regex

__all__ = ["read_tar_members"]

_SCHEMA = "name string, source string, body binary, hash string"


def read_tar_members(
    spark: SparkSession,
    pattern: str,
    member_glob: Optional[str] = None,
    body: bool = True,
    source: bool = True,
    sha: bool = True,
) -> DataFrame:
    """One row per regular-file member of every tar archive matching
    ``pattern`` (``.tar``, ``.tar.gz``/``.tgz`` — compression is
    auto-detected per archive via ``tarfile``'s ``r:*``).

    ``member_glob`` filters member names inside the single sequential
    pass; ``body``/``source``/``sha`` null the respective columns
    (reference flag semantics). Bag semantics: duplicate member names are
    all kept, output order is partition-arrival order.
    """
    rx = re.compile(glob_to_regex(member_glob)) if member_glob else None

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                names: list = []
                srcs: list = []
                bodies: list = []
                hashes: list = []
                with tarfile.open(
                    fileobj=io.BytesIO(content), mode="r:*"
                ) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        if rx is not None and not rx.fullmatch(m.name):
                            continue
                        data = None
                        if body or sha:
                            f = tf.extractfile(m)
                            data = f.read() if f is not None else b""
                        names.append(m.name)
                        srcs.append(path if source else None)
                        bodies.append(data if body else None)
                        hashes.append(
                            hashlib.sha256(data).hexdigest() if sha else None
                        )
                yield pd.DataFrame(
                    {
                        "name": names,
                        "source": srcs,
                        "body": bodies,
                        "hash": hashes,
                    }
                )

    # Mirror the zip source's plan-time contract (zipsource._expand_patterns):
    # an input pattern matching nothing is an ERROR, never a silent empty
    # output. Local filesystem paths are checked eagerly here; remote URIs
    # (scheme://) are left to Spark's own FileNotFoundException.
    import glob as _glob

    local = pattern.split("://", 1)[-1] if pattern.startswith("file://") else pattern
    if "://" not in local and not _glob.glob(local):
        raise ValueError(f"no input archives match pattern: {pattern!r}")

    # A glob in the FILENAME rides binaryFile's pathGlobFilter against the
    # parent directory — same matches, but avoids Spark's noisy
    # FileStreamSink metadata probe on a literal glob path (it logs a
    # WARN + stack trace for every load otherwise).
    reader = spark.read.format("binaryFile")
    head, tail = pattern.rsplit("/", 1) if "/" in pattern else (".", pattern)
    if any(c in tail for c in "*?[{") and not any(c in head for c in "*?[{"):
        df = reader.option("pathGlobFilter", tail).load(head)
    else:
        df = reader.load(pattern)
    return df.select("path", "content").mapInPandas(explode, schema=_SCHEMA)
