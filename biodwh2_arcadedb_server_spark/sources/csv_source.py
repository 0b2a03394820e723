"""Python DataSource reader for CSV ingest — the `jsonl_graph`
sibling (round 14, ROADMAP r13: "consider a CSV sibling"). Same three
DSv2 read contracts, same postures:

- byte-range partitions with the newline-alignment rule (a chunk
  starting past 0 discards its partial first line; its owner reads
  through the boundary), so one huge CSV scans in parallel with every
  line read exactly once;
- ``pushFilters`` retains the same predicate classes as the JSONL
  reader and evaluates them on the SCHEMA-COERCED values (the ADVICE
  r13 rule: the scan returns coerced values and Spark never re-applies
  a retained filter);
- error tolerance (A9): a row with the wrong column count or an
  uncoercible cell yields NULLs, never a task failure.

CSV specifics: the FIRST line of each file is a header and is skipped
by the chunk that owns byte 0 (column ORDER comes from the declared
schema, header names are not consulted — explicit schema is the
repo-wide source contract); quoted fields (embedded delimiters,
doubled quotes) parse through the stdlib ``csv`` module per line.
Empty strings coerce to NULL for non-string types (the CSV NULL
convention DuckDB's read_csv shares). Embedded NEWLINES inside quoted
fields are NOT supported — byte-range splitting is line-based, the
same limitation as Spark's own csv source with multiLine=false (at
100 TB, multiLine CSV is unsplittable by construction; re-encode).
"""

from __future__ import annotations

import csv
import io
import os

from pyspark.sql.datasource import DataSource, DataSourceReader
from pyspark.sql.types import StructType

from biodwh2_arcadedb_server_spark.sources.jsonl_source import (
    DEFAULT_CHUNK,
    _Chunk,
    _coerce,
    _matches,
    _PUSHABLE,
)


class CsvGraphReader(DataSourceReader):
    def __init__(
        self,
        path: str,
        schema: StructType,
        chunk_bytes: int,
        delimiter: str = ",",
    ) -> None:
        self._path = path
        self._fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        self._types = dict(self._fields)
        self._chunk = chunk_bytes
        self._delim = delimiter
        self._pushed: list = []

    def pushFilters(self, filters):
        for f in filters:
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
                if n.endswith((".csv", ".tsv"))
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
        return out

    def read(self, part):
        if part is None:
            return
        names = [n for n, _ in self._fields]
        with open(part.path, "rb") as fh:
            fh.seek(part.start)
            if part.start > 0:
                fh.readline()  # partial line: the previous chunk owns it
            else:
                fh.readline()  # header line: column order is the schema's
            while fh.tell() <= part.end:
                line = fh.readline()
                if not line:
                    break
                s = line.decode("utf-8", errors="replace").rstrip("\r\n")
                if not s:
                    continue
                try:
                    cells = next(csv.reader(io.StringIO(s), delimiter=self._delim))
                except (csv.Error, StopIteration):
                    cells = []
                # wrong column count → all-NULL row (A9), matching the
                # JSONL reader's malformed-line posture
                rec = (
                    dict(zip(names, cells))
                    if len(cells) == len(names)
                    else {}
                )
                # CSV NULL convention: empty cell is NULL for
                # non-string columns (DuckDB read_csv parity)
                for n, t in self._fields:
                    if rec.get(n) == "" and t != "string":
                        rec[n] = None
                if self._pushed and not all(
                    _matches(rec, f, self._types) for f in self._pushed
                ):
                    continue
                yield tuple(
                    _coerce(rec.get(n), t) for n, t in self._fields
                )


class CsvGraphDataSource(DataSource):
    """``spark.read.format("csv_graph").schema(ddl).option("path",
    p).load()`` — parallel, pushdown-filtering CSV reader."""

    @classmethod
    def name(cls) -> str:
        return "csv_graph"

    def schema(self):
        ddl = self.options.get("schema")
        if ddl:
            return ddl
        raise ValueError(
            "csv_graph needs an explicit schema: pass .schema(ddl) or "
            ".option('schema', ddl) — inference is deliberately "
            "unsupported (sources/formats.py contract)"
        )

    def reader(self, schema: StructType) -> CsvGraphReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("csv_graph requires .option('path', …)")
        return CsvGraphReader(
            path,
            schema,
            int(self.options.get("chunk_bytes", DEFAULT_CHUNK)),
            self.options.get("delimiter", ","),
        )


def register(spark) -> None:
    """Same session-keyed idempotent registration + thread-local
    active-session pin as the JSONL reader."""
    from biodwh2_arcadedb_server_spark.sources.staged_write import (
        _REG_LOCK,
        _REGISTERED,
    )

    spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
        spark._jsparkSession
    )
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    key = ("csv", spark.sparkContext.applicationId)
    if key in _REGISTERED:
        return
    with _REG_LOCK:
        if key not in _REGISTERED:
            spark.dataSource.register(CsvGraphDataSource)
            _REGISTERED.add(key)
