"""Source-format breadth: every supported format round-trips the
documents table losslessly with an explicit schema."""

from __future__ import annotations

import pytest

from biodwh2_arcadedb_server_spark.sources.formats import FORMATS, read_any, write_any
from biodwh2_arcadedb_server_spark.sources.registry import load_table

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_preserves_rows(spark, sf_small, tmp_path, fmt):
    d = load_table(spark, sf_small, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    out = str(tmp_path / fmt)
    write_any(d, out, fmt)
    got = read_any(spark, out, fmt, schema=SCHEMA)
    assert got.schema == d.schema
    want_rows = {tuple(r) for r in d.collect()}
    got_rows = {tuple(r) for r in got.collect()}
    assert got_rows == want_rows


def test_csv_and_json_require_schema(spark, tmp_path):
    for fmt in ("csv", "json"):
        with pytest.raises(ValueError, match="explicit schema"):
            read_any(spark, str(tmp_path), fmt)


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        read_any(spark, str(tmp_path), "avro")


def test_jsonl_graph_python_datasource(spark, tmp_path):
    """Round 13: the DSv2 READ side (Python DataSource) — parallel
    newline-JSON ingest with explicit schema, byte-range partitions
    newline-aligned exactly-once, filter pushdown claiming only
    supported top-level predicates, and the A9 error-tolerant row
    posture (malformed line / wrong type → NULLs, not task failure)."""
    import json as _json

    from pyspark.sql import functions as F

    from biodwh2_arcadedb_server_spark.sources.jsonl_source import (
        JsonlGraphReader,
        register,
    )
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        IsNull,
        StringContains,
        StringStartsWith,
    )
    from pyspark.sql.types import StructType

    p = tmp_path / "recs.jsonl"
    rows = [
        {"id": i, "name": f"n{i:03d}", "score": i / 4, "ok": i % 2 == 0}
        for i in range(500)
    ]
    lines = [_json.dumps(r) for r in rows]
    lines.insert(250, "{broken json")           # malformed → NULL row
    lines.insert(100, _json.dumps({"id": "x", "name": 7}))  # wrong types
    p.write_text("\n".join(lines) + "\n")

    register(spark)
    ddl = "id bigint, name string, score double, ok boolean"
    df = (
        spark.read.format("jsonl_graph")
        .schema(ddl)
        .option("path", str(p))
        .option("chunk_bytes", 512)  # force MANY partitions across lines
        .load()
    )
    got = df.collect()
    assert len(got) == 502  # exactly-once across ~100 byte-range chunks
    good = sorted(
        (r.id, r.name, r.score, r.ok) for r in got if r.id is not None
    )
    assert good == sorted((r["id"], r["name"], r["score"], r["ok"]) for r in rows)
    # error-tolerant rows: malformed line → all-NULL; wrong-typed id →
    # NULL id but name coerced to its string form
    nulls = [r for r in got if r.id is None]
    assert len(nulls) == 2 and any(r.name == "7" for r in nulls)

    # oracle equality against the JVM JSON reader on the same file
    # (None-safe sort key: NULL rows from the tolerant paths)
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    jvm = spark.read.schema(ddl).json(str(p)).collect()
    assert sorted(map(tuple, got), key=key) == sorted(map(tuple, jvm), key=key)

    # pushdown semantics through the full engine
    q = df.where((F.col("id") > 400) & F.col("name").startswith("n4"))
    want = [(r["id"], r["name"]) for r in rows if r["id"] > 400]
    assert sorted((r.id, r.name) for r in q.select("id", "name").collect()) == sorted(want)

    # unit: the reader claims only supported top-level filters
    r = JsonlGraphReader(str(p), StructType.fromDDL(ddl), 1 << 20)
    back = list(
        r.pushFilters(
            [
                GreaterThan(("id",), 400),
                StringStartsWith(("name",), "n4"),
                StringContains(("name",), "42"),   # unsupported class
                EqualTo(("a", "b"), 1),            # nested path
                IsNull(("score",)),                # unsupported class
            ]
        )
    )
    assert {type(f).__name__ for f in back} == {
        "StringContains", "EqualTo", "IsNull"
    }
    assert len(r._pushed) == 2
    [part] = [c for c in r.partitions() if c.start == 0]
    scanned = list(r.read(part))
    assert all(t[0] > 400 and t[1].startswith("n4") for t in scanned)
    assert len(scanned) == len(want)


def test_csv_graph_python_datasource(spark, tmp_path):
    """Round 14: the CSV sibling of the jsonl reader — header
    ownership by chunk 0, exactly-once across byte-range chunks,
    quoted fields (embedded delimiter, doubled quotes), empty-cell
    NULLs for non-string types, coerced retained pushdown, A9
    wrong-column-count tolerance, empty-dir zero-partition plan."""
    import csv as _csv

    from pyspark.sql import functions as F

    from biodwh2_arcadedb_server_spark.sources.csv_source import (
        CsvGraphReader,
        register,
    )

    p = tmp_path / "recs.csv"
    with open(p, "w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(["id", "name", "score"])
        for i in range(300):
            name = f'n,{i}' if i % 5 == 0 else (f'say "{i}"' if i % 7 == 0 else f"n{i}")
            score = "" if i % 11 == 0 else str(i / 4)
            w.writerow([i, name, score])
        fh.write("42,short\n")  # wrong column count -> all-NULL row

    register(spark)
    ddl = "id bigint, name string, score double"
    df = (
        spark.read.format("csv_graph")
        .schema(ddl)
        .option("path", str(p))
        .option("chunk_bytes", 256)  # many chunks across lines
        .load()
    )
    got = df.collect()
    assert len(got) == 301  # 300 data rows + the tolerant NULL row
    by_id = {r.id: r for r in got if r.id is not None}
    assert len(by_id) == 300
    assert by_id[0].name == "n,0"          # quoted embedded delimiter
    assert by_id[7].name == 'say "7"'      # doubled quotes
    assert by_id[11].score is None         # empty cell -> NULL double
    assert by_id[13].score == 13 / 4
    # pushdown keeps coercion semantics (score is a string cell in
    # the file; the filter must see the coerced double)
    q = df.where(F.col("score") > 70.0).select("id")
    want = sorted(i for i in range(300) if i % 11 != 0 and i / 4 > 70.0)
    assert sorted(r.id for r in q.collect()) == want

    # unit: rows drop at the source
    from pyspark.sql.datasource import GreaterThan
    from pyspark.sql.types import StructType

    r = CsvGraphReader(str(p), StructType.fromDDL(ddl), 1 << 20)
    assert list(r.pushFilters([GreaterThan(("score",), 70.0)])) == []
    scanned = sum(len(list(r.read(c))) for c in r.partitions())
    assert scanned == len(want)

    # empty dir -> zero rows, no IsADirectoryError
    d = tmp_path / "none"
    d.mkdir()
    empty = (
        spark.read.format("csv_graph").schema(ddl)
        .option("path", str(d)).load()
    )
    assert empty.count() == 0
