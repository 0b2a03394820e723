"""Python DataSource READER for newline-delimited JSON — the read
side of the DSv2 story (round 13; the write side is
``staged_write.py``). The graph import lane a BioDWH2-style workspace
ingests (per-label record files) is exactly this shape.

Design (the three DSv2 read contracts, in their Python API form):

- **partitions()** — files split into byte-range chunks
  (``chunk_bytes``, default 32 MiB) so a single huge JSONL file reads
  in parallel. Ranges are NEWLINE-ALIGNED at read time, the classic
  text-split rule: a task whose range starts at offset > 0 discards
  the (partial) first line — its owner is the previous chunk, which
  reads THROUGH its end boundary to the next newline. Every line is
  therefore read exactly once, regardless of where record boundaries
  fall relative to chunk edges (boundary test pins this).
- **pushFilters()** — equality/range/In/IsNotNull/StringStartsWith on
  top-level attributes are RETAINED by the source and applied while
  scanning (rows drop before they ever reach the JVM — the Python DS
  analog of SupportsPushDownFilters); anything else is handed back to
  Spark. Nested attributes are never claimed.
- **read(partition)** — yields tuples in declared-schema field order
  with permissive scalar coercion (the A9 error-tolerant posture:
  a malformed JSON line or uncastable field becomes NULLs, never a
  task failure — same contract as typemap.permissive_cast).

Schema is EXPLICIT (``.option("schema", "<ddl>")`` or passed to
``spark.read.format(...).schema(...)``) — the repo-wide contract
(sources/formats.py): inference reads data twice and guesses types.

100 TB posture: partition count scales with bytes not files; the scan
does one pass; pushed filters cut rows at the line parser. For
columnar analytics parquet stays the right store — this source is the
INGEST lane (read once, write parquet via the workspace builder).
"""

from __future__ import annotations

import json
import os
from datetime import date, datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
)
from pyspark.sql.types import StructType

DEFAULT_CHUNK = 32 * 1024 * 1024


class _Chunk(InputPartition):
    def __init__(self, path: str, start: int, end: int) -> None:
        self.path, self.start, self.end = path, start, end


def _coerce(v, spark_type: str):
    """Permissive scalar coercion mirroring typemap.permissive_cast:
    wrong-typed / uncoercible values become None, never errors."""
    if v is None:
        return None
    try:
        if spark_type in ("bigint", "int", "smallint", "tinyint", "long"):
            return int(v)
        if spark_type in ("double", "float"):
            return float(v)
        if spark_type == "boolean":
            if isinstance(v, bool):
                return v
            if isinstance(v, str):
                return {"true": True, "false": False}.get(v.lower())
            return bool(v)
        if spark_type == "string":
            return v if isinstance(v, str) else json.dumps(v)
        if spark_type == "date":
            return date.fromisoformat(v) if isinstance(v, str) else None
        if spark_type.startswith("timestamp"):
            return (
                datetime.fromisoformat(v.replace("Z", "+00:00"))
                if isinstance(v, str)
                else None
            )
        if spark_type.startswith("array"):
            return list(v) if isinstance(v, (list, tuple)) else None
        return v
    except (TypeError, ValueError):
        return None


# filter classes this source claims; everything else returns to Spark
_PUSHABLE = (
    EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
    In, IsNotNull, StringStartsWith,
)


def _matches(row: dict, f, types: dict) -> bool:
    # Compare against the SCHEMA-COERCED value, not the raw JSON one:
    # the scan RETURNS coerced values, and a retained filter is never
    # re-applied by Spark, so comparing raw values silently diverges
    # (str-vs-date hits the TypeError→False path; a string-encoded
    # numeric fails ==). Coercion here must mirror read()'s exactly.
    v = _coerce(row.get(f.attribute[0]), types.get(f.attribute[0], "string"))
    if isinstance(f, IsNotNull):
        return v is not None
    if v is None:
        return False  # SQL comparison semantics: NULL never matches
    try:
        if isinstance(f, EqualTo):
            return v == f.value
        if isinstance(f, GreaterThan):
            return v > f.value
        if isinstance(f, GreaterThanOrEqual):
            return v >= f.value
        if isinstance(f, LessThan):
            return v < f.value
        if isinstance(f, LessThanOrEqual):
            return v <= f.value
        if isinstance(f, In):
            return v in f.value
        if isinstance(f, StringStartsWith):
            return isinstance(v, str) and v.startswith(f.value)
    except TypeError:
        return False
    return False


class JsonlGraphReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType, chunk_bytes: int) -> None:
        self._path = path
        self._fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        self._types = dict(self._fields)
        self._chunk = chunk_bytes
        self._pushed: list = []

    def pushFilters(self, filters):
        for f in filters:
            # only top-level attributes of pushable classes; nested
            # paths (len > 1) go back to Spark untouched
            if isinstance(f, _PUSHABLE) and len(f.attribute) == 1:
                self._pushed.append(f)
            else:
                yield f

    def partitions(self):
        files = (
            [self._path]
            if os.path.isfile(self._path)
            else sorted(
                os.path.join(self._path, n)
                for n in os.listdir(self._path)
                if n.endswith((".jsonl", ".json", ".ndjson"))
            )
        )
        out = []
        for p in files:
            size = os.path.getsize(p)
            start = 0
            while start < size or (size == 0 and start == 0):
                out.append(_Chunk(p, start, min(start + self._chunk, size)))
                start += self._chunk
                if size == 0:
                    break
        # a directory with no matching files → NO partitions (Spark
        # plans a single `None` partition; read() returns nothing).
        # The old `[_Chunk(self._path, 0, 0)]` fallback open()ed the
        # directory itself and failed the task with IsADirectoryError.
        return out

    def read(self, part):
        if part is None:  # zero-partition plan (empty directory)
            return
        with open(part.path, "rb") as fh:
            fh.seek(part.start)
            if part.start > 0:
                fh.readline()  # partial line: the previous chunk owns it
            while fh.tell() <= part.end:
                line = fh.readline()
                if not line:
                    break
                # a line STARTING at/before `end` belongs to this
                # chunk even if it extends past it (readline already
                # consumed it whole); the tell() check above uses the
                # line's START offset because it ran before this read
                s = line.strip()
                if not s:
                    continue
                try:
                    rec = json.loads(s)
                except ValueError:
                    rec = {}  # error-tolerant: malformed line → NULL row
                if not isinstance(rec, dict):
                    rec = {}
                if self._pushed and not all(
                    _matches(rec, f, self._types) for f in self._pushed
                ):
                    continue
                yield tuple(
                    _coerce(rec.get(n), t) for n, t in self._fields
                )


class JsonlGraphDataSource(DataSource):
    """``spark.read.format("jsonl_graph").schema(ddl).option("path",
    p).load()`` — parallel, pushdown-filtering newline-JSON reader."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_graph"

    def schema(self):
        ddl = self.options.get("schema")
        if ddl:
            return ddl
        raise ValueError(
            "jsonl_graph needs an explicit schema: pass .schema(ddl) or "
            ".option('schema', ddl) — inference is deliberately "
            "unsupported (sources/formats.py contract)"
        )

    def reader(self, schema: StructType) -> JsonlGraphReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_graph requires .option('path', …)")
        return JsonlGraphReader(
            path, schema, int(self.options.get("chunk_bytes", DEFAULT_CHUNK))
        )


def register(spark) -> None:
    """Idempotent-enough registration (same session-keyed guard as the
    staged writer; also pins the thread-local active session — see
    staged_write.ensure_registered for the measured py4j gotcha)."""
    from biodwh2_arcadedb_server_spark.sources.staged_write import (
        _REG_LOCK,
        _REGISTERED,
    )

    spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
        spark._jsparkSession
    )
    # pushFilters() is gated behind a runtime conf (4.1 default off);
    # a reader that implements it FAILS planning when disabled, so
    # registration turns it on
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    key = ("jsonl", spark.sparkContext.applicationId)
    if key in _REGISTERED:
        return
    with _REG_LOCK:
        if key not in _REGISTERED:
            spark.dataSource.register(JsonlGraphDataSource)
            _REGISTERED.add(key)
