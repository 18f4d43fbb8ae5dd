"""Zip-archive member source — the reference's core capability, Spark-first.

Reference semantics re-expressed (SURVEY.md §2 A1/A2/A3, B1/B2, F1/F2):

- one zip archive → one unit of parallelism (the reference spawns one thread
  per archive, /root/reference/src/builder.rs:54-73; we emit one
  InputPartition per archive so a 1000-executor cluster fans out naturally);
- one compressed member → one output row of the fixed 4-column schema
  (name, source, body, hash), /root/reference/src/builder.rs:256-274;
- member-name glob filter applied inside the scan before materializing the
  row (builder.rs:180-183) — and, per the SURVEY §2.B bug note, *no glob
  means keep every member* (the intended semantics; the reference's work
  pass emits zero rows without -g, an acknowledged regression there);
- ``--no-body/--no-source/--no-hash`` null the column values, never drop
  columns (builder.rs:185-217); ``body=False, sha=False`` together skip
  decompression entirely — the hand-rolled projection pushdown
  (builder.rs:185-186) becomes a source option here;
- hash is standard 64-char lowercase SHA-256 hex (deliberate divergence from
  the reference's unpadded/Debug-quoted encoding, builder.rs:196-209 —
  SURVEY §2 F1).

Implementation: a PySpark 4 Python Data Source yielding Arrow RecordBatches.
The zip bytes are read directly by the Python worker that owns the partition
(no JVM→Python re-shipping of archive bytes). On a real cluster the archive
paths must be on shared storage visible to executors (the same contract as
any file-based source); ship this package via ``--py-files`` so workers can
unpickle the reader.

Scale notes: members are decompressed one at a time and flushed in bounded
Arrow batches, so peak memory per task ≈ one decompressed member + one batch
(mirrors the reference's bounded-channel posture, builder.rs:53,188-190).
Many-archive inputs parallelize one task per archive; a JUMBO archive (more
than ``split_members`` central-directory entries) additionally splits into
member-index-range partitions — the central directory is random-access, so
each task opens the file independently and reads only its slice, bounding
per-task time by the range size instead of the largest archive. The member
count comes from the end-of-central-directory record alone (an O(comment)
tail read, no CD parse), gated on file size so small archives cost the
driver nothing beyond the stat it already does.

Divergences by design (SURVEY §2 H): empty input glob raises at plan time
(the reference silently writes an empty file — its NoInputsFound error is
dead code); invalid member glob raises ValueError at plan time (the
reference panics mid-job).
"""

from __future__ import annotations

import glob as _pyglob
import hashlib
import io
import json
import re
import zipfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    In,
    InputPartition,
    IsNotNull,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

from zip_to_parquet_spark.functions.globs import glob_to_regex

__all__ = ["read_zip_members", "count_members", "ZipMembersDataSource", "ZipFormatError"]

# zipfile's native codecs, plus zstd (method 93 — modern zips; the
# reference's zip crate decodes it by default, /root/reference/Cargo.toml:13).
# Python's zipfile can't decode 93, so those members go through a manual
# raw-stream + pyarrow-zstd path (_read_zstd_member). Anything else raises
# a typed error.
_ZSTD_METHOD = 93
_SUPPORTED_METHODS = {
    zipfile.ZIP_STORED,
    zipfile.ZIP_DEFLATED,
    zipfile.ZIP_BZIP2,
    zipfile.ZIP_LZMA,
}


class ZipFormatError(ValueError):
    """A member uses a compression method this engine cannot decode."""


def _strict_hash_hex(digest: bytes) -> str:
    """The reference's exact hash encoding (builder.rs:196-209): each digest
    byte rendered with Rust's unpadded ``{:x}`` (so 0x0e → "e", dropping
    leading zeros) and the joined string wrapped in Debug quotes by
    ``format!("{:x?}", hash)``. Lossy and non-standard — our default column
    is plain 64-char lowercase hex (the documented divergence, SURVEY §2
    F1) — but ``strict_hash=True`` reproduces it bit-for-bit so parity with
    reference output files is checkable."""
    return '"' + "".join(format(b, "x") for b in digest) + '"'


def _read_zstd_member(fh, info: zipfile.ZipInfo, path: str) -> bytes:
    """Decode a zstd (method 93) member zipfile can't: seek to the member's
    local header, read ``compress_size`` raw bytes, decompress with
    pyarrow's zstd codec, and CRC-check like zipfile would. CRC/format
    failures raise BadZipFile so ``on_error='skip'`` treats them exactly
    like any other corrupt-archive error."""
    import struct
    import zlib

    import pyarrow as pa

    if not pa.Codec.is_available("zstd"):  # pragma: no cover - env guard
        raise ZipFormatError(
            f"member {info.filename!r} in {path} is zstd-compressed but "
            "pyarrow lacks zstd support in this environment"
        )
    fh.seek(info.header_offset)
    header = fh.read(30)
    if len(header) != 30 or header[:4] != b"PK\x03\x04":
        raise zipfile.BadZipFile(
            f"bad local file header for member {info.filename!r} in {path}"
        )
    fnlen, extralen = struct.unpack("<HH", header[26:30])
    fh.seek(info.header_offset + 30 + fnlen + extralen)
    raw = fh.read(info.compress_size)
    if len(raw) != info.compress_size:
        raise zipfile.BadZipFile(
            f"truncated zstd member {info.filename!r} in {path}"
        )
    try:
        data = pa.input_stream(pa.py_buffer(raw), compression="zstd").read()
    except (pa.lib.ArrowInvalid, OSError) as exc:
        raise zipfile.BadZipFile(
            f"zstd decode failed for member {info.filename!r} in {path}: {exc}"
        ) from exc
    if zlib.crc32(data) & 0xFFFFFFFF != info.CRC:
        raise zipfile.BadZipFile(
            f"CRC mismatch for zstd member {info.filename!r} in {path}"
        )
    return data


# Minimum possible central-directory entry: 46-byte fixed header + a
# nonempty filename. Lets partitions() skip the EOCD tail read entirely
# for any archive too small to exceed the split threshold.
_MIN_CD_ENTRY = 46


def _eocd_member_count(path: str) -> int:
    """Total member count from the end-of-central-directory record alone —
    seek to the tail, find the EOCD signature (scanning back past a zip
    comment of up to 64 KiB), read the 2-byte total; 0xFFFF defers to the
    ZIP64 EOCD's 8-byte total. Never parses the central directory, so a
    million-member archive costs one bounded tail read."""
    import os
    import struct

    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        tail_len = min(size, 22 + 65535)
        fh.seek(size - tail_len)
        tail = fh.read(tail_len)
    i = tail.rfind(b"PK\x05\x06")
    if i < 0 or i + 22 > len(tail):
        raise zipfile.BadZipFile(f"no end-of-central-directory record in {path}")
    total = struct.unpack("<H", tail[i + 10 : i + 12])[0]
    if total == 0xFFFF:
        j = tail.rfind(b"PK\x06\x06", 0, i)
        if j < 0 or j + 40 > len(tail):
            raise zipfile.BadZipFile(f"ZIP64 EOCD not found in {path}")
        total = struct.unpack("<Q", tail[j + 32 : j + 40])[0]
    return total


@dataclass
class _ZipPartition(InputPartition):
    path: str
    # Half-open member-index range [start, end) into the central
    # directory's infolist order; end=None means "to the last member".
    # (0, None) — the default — is the whole archive.
    start: int = 0
    end: int | None = None


class ZipMembersReader(DataSourceReader):
    def __init__(self, options: dict, skip_acc=None):
        # Optional SparkContext accumulator counting archives dropped by
        # on_error='skip' — the Spark-native analog of the reference's
        # per-archive error log (builder.rs:65-71). Travels driver →
        # executor with the pickled reader; updates flow back on task
        # completion, so the caller reads an exact job-wide count.
        self.skip_acc = skip_acc
        self.paths: list[str] = json.loads(options.get("paths", "[]"))
        self.member_regex: str | None = options.get("member_regex") or None
        self.with_body = options.get("body", "true") == "true"
        self.with_source = options.get("source", "true") == "true"
        self.with_hash = options.get("hash", "true") == "true"
        self.batch_rows = int(options.get("batch_rows", "1024"))
        self.batch_bytes = int(options.get("batch_bytes", str(32 * 1024 * 1024)))
        self.on_error = options.get("on_error", "fail")
        self.strict_hash = options.get("strict_hash", "false") == "true"
        # Jumbo-archive splitting threshold (0 disables): archives whose
        # central directory lists more members than this split into
        # member-index-range partitions.
        self.split_members = int(options.get("split_members", "65536"))

        # Populated by pushFilters (Catalyst filter pushdown, Spark 4.1+):
        # per-member name predicates evaluated before decompression, and
        # source predicates that prune whole archives at planning time.
        self.name_preds: list = []
        self.source_preds: list = []

    @staticmethod
    def _compile(filters: list):
        """Filter objects → one python predicate (AND of all)."""
        fns = []
        for f in filters:
            if isinstance(f, EqualTo):
                fns.append(lambda s, v=f.value: s == v)
            elif isinstance(f, In):
                fns.append(lambda s, vs=set(f.value): s in vs)
            elif isinstance(f, StringStartsWith):
                fns.append(lambda s, v=f.value: s.startswith(v))
            elif isinstance(f, StringEndsWith):
                fns.append(lambda s, v=f.value: s.endswith(v))
            elif isinstance(f, StringContains):
                fns.append(lambda s, v=f.value: v in s)
            # IsNotNull: name/source are non-null whenever pushed — no-op.
        return lambda s: all(fn(s) for fn in fns)

    def pushFilters(self, filters):
        """Absorb name/source predicates (SURVEY §4: the reference applies
        its member filter inside the scan, builder.rs:180-183 — this is the
        Catalyst-integrated version). `name` predicates skip members before
        decompression; `source` predicates prune whole archives from the
        partition list — file-level pruning. Everything else, and any
        source predicate while the source column is nulled (--no-source),
        stays with Spark."""
        supported = (EqualTo, In, StringStartsWith, StringEndsWith, StringContains, IsNotNull)
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if not isinstance(f, supported):
                yield f
            elif col == "name":
                if not isinstance(f, IsNotNull):
                    self.name_preds.append(f)
            elif col == "source" and self.with_source:
                if not isinstance(f, IsNotNull):
                    self.source_preds.append(f)
            else:
                yield f

    def partitions(self):
        # One partition per archive == the reference's one-thread-per-archive
        # (builder.rs:64). Executors each open only their own local/shared
        # file; nothing is centralized on the driver. Pushed source
        # predicates prune archives here, before any task launches.
        #
        # Jumbo archives additionally split into member-index ranges so the
        # largest archive no longer bounds per-task time. The size gate
        # (an archive under split_members·46 bytes CANNOT list that many
        # CD entries) keeps the driver cost at the stat it already pays;
        # only plausibly-jumbo files get the O(comment) EOCD tail read.
        # A file unreadable here falls through to a single partition so
        # the error surfaces in the task, where on_error applies.
        import os

        paths = self.paths
        if self.source_preds:
            pred = self._compile(self.source_preds)
            paths = [p for p in paths if pred(p)]
        parts: list[_ZipPartition] = []
        for p in paths:
            n = None
            if self.split_members > 0:
                try:
                    if os.path.getsize(p) > self.split_members * _MIN_CD_ENTRY:
                        n = _eocd_member_count(p)
                except (OSError, zipfile.BadZipFile):
                    n = None
            if n is not None and n > self.split_members:
                parts.extend(
                    _ZipPartition(p, s, min(s + self.split_members, n))
                    for s in range(0, n, self.split_members)
                )
            else:
                parts.append(_ZipPartition(p))
        return parts

    def read(self, partition: _ZipPartition):
        import pyarrow as pa

        pattern = re.compile(self.member_regex) if self.member_regex else None
        name_pred = self._compile(self.name_preds) if self.name_preds else None
        need_decompress = self.with_body or self.with_hash

        names: list[str] = []
        sources: list[str | None] = []
        bodies: list[bytes | None] = []
        hashes: list[str | None] = []
        pending_bytes = 0

        def flush():
            nonlocal names, sources, bodies, hashes, pending_bytes
            batch = pa.RecordBatch.from_arrays(
                [
                    pa.array(names, type=pa.string()),
                    pa.array(sources, type=pa.string()),
                    pa.array(bodies, type=pa.binary()),
                    pa.array(hashes, type=pa.string()),
                ],
                names=["name", "source", "body", "hash"],
            )
            names, sources, bodies, hashes = [], [], [], []
            pending_bytes = 0
            return batch

        try:
            with open(partition.path, "rb") as fh, zipfile.ZipFile(fh) as zf:
                infos = zf.infolist()
                if partition.start or partition.end is not None:
                    infos = infos[partition.start : partition.end]
                for info in infos:
                    if pattern is not None and not pattern.match(info.filename):
                        continue
                    if name_pred is not None and not name_pred(info.filename):
                        continue
                    if need_decompress and not info.is_dir():
                        if info.compress_type == _ZSTD_METHOD:
                            data = _read_zstd_member(fh, info, partition.path)
                        elif info.compress_type not in _SUPPORTED_METHODS:
                            raise ZipFormatError(
                                f"unsupported zip compression (method "
                                f"{info.compress_type}) for member "
                                f"{info.filename!r} in {partition.path}"
                            )
                        else:
                            data = zf.read(info)
                    else:
                        data = b""
                    names.append(info.filename)
                    sources.append(partition.path if self.with_source else None)
                    if self.with_hash:
                        h = hashlib.sha256(data)
                        hashes.append(
                            _strict_hash_hex(h.digest())
                            if self.strict_hash
                            else h.hexdigest()
                        )
                    else:
                        hashes.append(None)
                    if self.with_body:
                        bodies.append(data)
                        pending_bytes += len(data)
                    else:
                        bodies.append(None)
                    if len(names) >= self.batch_rows or pending_bytes >= self.batch_bytes:
                        yield flush()
        except (zipfile.BadZipFile, ZipFormatError, OSError) as exc:
            # ZipFormatError (unsupported compression method, missing zstd
            # codec) must take the same skip path as structural corruption:
            # permissive mode means "convert what this engine can read",
            # and the reference logs-and-fails per archive the same way
            # for undecodable members (builder.rs:65-71).
            if self.on_error == "skip":
                # Permissive mode: a corrupt archive is dropped instead of
                # failing the job (the reference fails the whole run,
                # builder.rs:65-71 — that remains our default). The buffered
                # partial batch is discarded, so an archive smaller than one
                # batch (the common case) contributes zero rows. Best-effort
                # caveat: batches already yielded for an archive larger than
                # batch_rows/batch_bytes before a mid-read CRC failure cannot
                # be retracted under bounded-memory streaming — use
                # on_error='fail' (default) where atomicity matters.
                import sys

                # Count once per ARCHIVE, not per split range: whole-archive
                # corruption fails every range, but only the start==0 task
                # increments, keeping the "archives skipped" semantic exact.
                # (A mid-range CRC failure in a later split logs without
                # counting — that archive already emitted earlier ranges, a
                # case the best-effort caveat above covers either way.)
                if self.skip_acc is not None and partition.start == 0:
                    self.skip_acc.add(1)
                print(
                    f"zipmembers: skipping unreadable archive {partition.path}: {exc}",
                    file=sys.stderr,
                )
                return
            raise
        if names:
            yield flush()


class ZipMembersStreamReader(DataSourceStreamReader):
    """Incremental zip ingestion: each micro-batch picks up archives that
    appeared in the watched directory since the last committed offset.

    Offsets are an (mtime high-watermark, recent-file list) pair — bounded
    steady-state, unlike a grow-forever processed-path list. ``wm`` is the
    max mtime listed; ``seen`` holds ``[mtime, path]`` pairs for files
    within ``stream_lateness`` seconds (default 300) of the watermark. A
    batch processes the files of ``end.seen`` that are neither in
    ``start.seen`` nor older than ``start``'s lateness horizon — so an
    archive landing with an mtime more than ``stream_lateness`` behind the
    newest file is dropped as too late (raise the allowance for laggy copy
    jobs / object stores), and at a million archives the offset stays
    O(arrival-rate × lateness) instead of O(all files ever).

    Two deliberately-unbounded moments: the first offset of a fresh query
    enumerates the whole backfill (those files genuinely all need
    processing), and the first offset after a driver restart re-enumerates
    the directory once (the start offset's horizon then excludes
    already-processed files, so nothing is reprocessed) — steady-state
    offsets are small either way.

    Replay-safe: ``partitions(start, end)`` derives the batch purely from
    the two checkpointed offsets, so a restarted query re-plans the
    identical batch. One InputPartition per new archive, read by the same
    member-exploding logic as the batch reader — executors decompress in
    parallel; the driver only lists the directory.
    """

    def __init__(self, options: dict, skip_acc=None):
        self._batch = ZipMembersReader(options, skip_acc=skip_acc)
        self.pattern: str = options["stream_glob"]
        self.lateness: float = float(options.get("stream_lateness", "300"))
        # Listing horizon; None = enumerate everything (fresh query or
        # just-restarted driver). Ratchets to wm - lateness after each
        # listing, which keeps steady-state offsets bounded.
        self._horizon: float | None = None

    def _snapshot(self) -> list[tuple[float, str]]:
        import os

        files = []
        for p in _pyglob.glob(self.pattern, recursive=True):
            try:
                files.append((os.path.getmtime(p), p))
            except OSError:
                continue  # raced with a delete between glob and stat
        return files

    def initialOffset(self) -> dict:
        return {"wm": 0.0, "seen": []}

    def latestOffset(self) -> dict:
        files = self._snapshot()
        wm = max((mt for mt, _ in files), default=0.0)
        if self._horizon is not None:
            files = [(mt, p) for mt, p in files if mt >= self._horizon]
        self._horizon = max(self._horizon or float("-inf"), wm - self.lateness)
        return {"wm": wm, "seen": sorted([mt, p] for mt, p in files)}

    @staticmethod
    def _paths(offset: dict) -> set[str]:
        # "files" is the pre-watermark offset format — accept it so a
        # checkpoint written by the old reader resumes cleanly.
        if "files" in offset:
            return set(offset["files"])
        return {p for _, p in offset.get("seen", [])}

    def partitions(self, start: dict, end: dict):
        done = self._paths(start)
        # start.wm == 0 ⇒ start is the initial offset (or legacy format):
        # no horizon, everything unseen is new.
        horizon = start["wm"] - self.lateness if start.get("wm") else float("-inf")
        new = sorted(
            p for mt, p in end.get("seen", []) if p not in done and mt >= horizon
        )
        return [_ZipPartition(p) for p in new]

    def read(self, partition: _ZipPartition):
        return self._batch.read(partition)

    def commit(self, end: dict) -> None:
        pass


class ZipMembersDataSource(DataSource):
    """``spark.read.format("zipmembers")`` — one row per zip member.
    ``spark.readStream`` with a ``stream_glob`` option tails a directory of
    arriving archives."""

    # Optional skip-counter accumulator. Options are string-only, so the
    # accumulator rides a class attribute: read_zip_members registers a
    # dynamic subclass carrying it, which cloudpickle serializes BY VALUE
    # (dynamic classes always are), while this importable base stays
    # by-reference. None ⇒ counting disabled.
    _skip_acc = None

    @classmethod
    def name(cls) -> str:
        return "zipmembers"

    def schema(self) -> str:
        return "name string, source string, body binary, hash string"

    def reader(self, schema) -> ZipMembersReader:
        return ZipMembersReader(self.options, skip_acc=type(self)._skip_acc)

    def streamReader(self, schema) -> ZipMembersStreamReader:
        return ZipMembersStreamReader(self.options, skip_acc=type(self)._skip_acc)


def _expand_patterns(patterns: list[str] | str) -> list[str]:
    if isinstance(patterns, str):
        patterns = [patterns]
    paths: list[str] = []
    seen = set()
    for p in patterns:
        matches = sorted(_pyglob.glob(p, recursive=True))
        for m in matches:
            if m not in seen:
                seen.add(m)
                paths.append(m)
    if not paths:
        # Deliberate divergence: the reference's NoInputsFound is dead code
        # and it silently writes an empty parquet (SURVEY §2 H).
        raise ValueError(f"no input archives match patterns: {patterns!r}")
    return paths


def read_zip_members(
    spark: SparkSession,
    patterns: list[str] | str,
    member_glob: str | None = None,
    body: bool = True,
    source: bool = True,
    sha: bool = True,
    on_error: str = "fail",
    batch_rows: int = 1024,
    strict_hash: bool = False,
    skip_counter=None,
    split_members: int = 65536,
) -> DataFrame:
    """Read zip archives as one DataFrame row per member (reference A1+A2).

    Multiple patterns/archives concatenate with UNION ALL bag semantics —
    duplicates kept, order undefined (SURVEY §2 C). ``member_glob`` filters
    member names inside the scan (B1). ``body/source/sha=False`` null the
    respective column (B2); ``body=False, sha=False`` never decompresses —
    the projection pushdown of builder.rs:185-186 as a source option.
    ``strict_hash=True`` emits the reference's quote-wrapped unpadded hex
    encoding instead of standard 64-char hex (see _strict_hash_hex).

    ``skip_counter``: optional ``spark.sparkContext.accumulator(0)``; with
    ``on_error='skip'`` each dropped archive adds 1, giving callers an exact
    job-wide skip count (the reference logs every failed archive,
    builder.rs:65-71). The binding happens at ``.load()`` (schema resolution
    instantiates the source), so interleaved reads each capture their own
    counter.

    ``split_members``: archives whose central directory lists more than
    this many members split into member-index-range partitions (0
    disables) — per-task time is bounded by the range, not the largest
    archive; see the module docstring's scale notes.
    """
    from zip_to_parquet_spark.runtime import ensure_shipped

    paths = _expand_patterns(patterns)
    member_regex = glob_to_regex(member_glob) if member_glob else ""
    ensure_shipped(spark)  # workers must import this module to unpickle
    # Runtime conf (the driver harness owns its session): without it Spark
    # refuses a reader that implements pushFilters.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    source_cls = ZipMembersDataSource
    if skip_counter is not None:
        # Dynamic subclass → pickled by value, accumulator included.
        source_cls = type(
            "ZipMembersDataSourceCounted",
            (ZipMembersDataSource,),
            {"_skip_acc": skip_counter},
        )
    spark.dataSource.register(source_cls)
    return (
        spark.read.format("zipmembers")
        .option("paths", json.dumps(paths))
        .option("member_regex", member_regex)
        .option("body", "true" if body else "false")
        .option("source", "true" if source else "false")
        .option("hash", "true" if sha else "false")
        .option("on_error", on_error)
        .option("batch_rows", str(batch_rows))
        .option("strict_hash", "true" if strict_hash else "false")
        .option("split_members", str(split_members))
        .load()
    )


def read_zip_members_stream(
    spark: SparkSession,
    pattern: str,
    member_glob: str | None = None,
    body: bool = True,
    source: bool = True,
    sha: bool = True,
    on_error: str = "fail",
    skip_counter=None,
) -> DataFrame:
    """Streaming variant of :func:`read_zip_members`: tail a directory glob
    for newly-arriving zip archives; each micro-batch explodes only the new
    archives (exact-once via checkpointed path-set offsets).

    ``skip_counter``: as in the batch reader — with ``on_error='skip'``
    each dropped archive adds 1; the count accumulates ACROSS micro-batches
    (a monitoring counter, not a per-batch metric)."""
    from zip_to_parquet_spark.runtime import ensure_shipped

    member_regex = glob_to_regex(member_glob) if member_glob else ""
    ensure_shipped(spark)
    source_cls = ZipMembersDataSource
    if skip_counter is not None:
        source_cls = type(
            "ZipMembersDataSourceCounted",
            (ZipMembersDataSource,),
            {"_skip_acc": skip_counter},
        )
    spark.dataSource.register(source_cls)
    return (
        spark.readStream.format("zipmembers")
        .option("stream_glob", pattern)
        .option("member_regex", member_regex)
        .option("body", "true" if body else "false")
        .option("source", "true" if source else "false")
        .option("hash", "true" if sha else "false")
        .option("on_error", on_error)
        .load()
    )


def count_members(
    spark: SparkSession,
    patterns: list[str] | str,
    member_glob: str | None = None,
) -> int:
    """Reference A3/D1: count glob-matching members without decompressing
    anything (central-directory-only scan). The reference runs this as a
    separate sequential pre-pass that re-opens every archive
    (builder.rs:24-41); here it is the same distributed scan with the
    body/hash projection pushed down."""
    df = read_zip_members(spark, patterns, member_glob, body=False, source=False, sha=False)
    return df.count()


def read_zip_central_directory(
    spark: SparkSession,
    patterns: list[str] | str,
) -> DataFrame:
    """Metadata-only archive scan: one row per member straight from each
    zip's CENTRAL DIRECTORY — (name, source, crc32, size, csize) — with
    zero decompression (the directory stores CRC-32 and both sizes for
    every member; ~50 bytes of metadata per member vs the full compressed
    stream).

    This is the probe an INCREMENTAL ingest runs first: compare
    (name, crc32, size) against the previous run's manifest and only the
    new/changed members ever get decompressed (see
    :func:`extract_member_hashes`) — at 100 TB the nightly cost becomes
    O(members) metadata + O(churn) decompression instead of O(corpus).
    Extension beyond the reference surface (the reference re-reads every
    member every run, builder.rs:24-41); schema is additive — the
    reference's 4-column member schema (SURVEY §1) is untouched.

    Distribution: archives hash-partition by path; per-task work is one
    central-directory read per archive (no member-range splitting — the
    directory of even a 65k-member archive is a few MB of metadata).
    """
    paths = _expand_patterns(patterns)
    pdf = spark.createDataFrame([(p,) for p in paths], "source string")

    def scan(batches):
        import pandas as _pd

        # One output frame PER ARCHIVE: peak Python-object memory is one
        # archive's directory, not the whole partition's (a partition can
        # hold hundreds of 65k-member archives after repartitioning).
        for b in batches:
            for path in b["source"]:
                names, sources, crcs, sizes, csizes = [], [], [], [], []
                with zipfile.ZipFile(path) as zf:
                    for info in zf.infolist():
                        names.append(info.filename)
                        sources.append(path)
                        crcs.append(info.CRC)
                        sizes.append(info.file_size)
                        csizes.append(info.compress_size)
                yield _pd.DataFrame(
                    {
                        "name": names,
                        "source": sources,
                        "crc32": _pd.array(crcs, dtype="int64"),
                        "size": _pd.array(sizes, dtype="int64"),
                        "csize": _pd.array(csizes, dtype="int64"),
                    }
                )

    return pdf.repartition("source").mapInPandas(
        scan, schema="name string, source string, crc32 long, size long, csize long"
    )


def extract_member_hashes(to_extract: DataFrame) -> DataFrame:
    """Scoped extraction: decompress and sha256 ONLY the (source, name)
    members listed in ``to_extract`` — the second half of an incremental
    ingest (the first half, :func:`read_zip_central_directory`, decides
    WHICH members changed without touching member bytes).

    One applyInPandas group per archive: each task opens its archive once
    and random-accesses just the named members (zipfile seeks straight to
    each member's local header via the central directory — untouched
    members are never read). Output (name, source, hash) uses the same
    standard sha256 hex as ``read_zip_members``. Cost is O(churn bytes),
    independent of corpus size; the groupBy key is the archive path, so
    skew equals per-archive churn (bounded by archive size).
    """
    import pandas as _pd

    def ex(key, pdf):
        path = key[0]
        hashes = []
        with zipfile.ZipFile(path) as zf:
            for nm in pdf["name"]:
                hashes.append(hashlib.sha256(zf.read(nm)).hexdigest())
        return _pd.DataFrame(
            {"name": pdf["name"], "source": path, "hash": hashes}
        )

    return (
        to_extract.select("source", "name")
        .groupBy("source")
        .applyInPandas(ex, schema="name string, source string, hash string")
    )
