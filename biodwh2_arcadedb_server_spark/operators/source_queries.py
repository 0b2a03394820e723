"""Probe batch 16 (round 14) — the DSv2 ingest lane, oracled.

q192 puts the ``jsonl_graph`` Python DataSource (sources/
jsonl_source.py — the Spark analog of the reference's workspace
ingest, ArcadeDBService.java:129 ``new Graph(path, readOnly=true)``)
under the driver's correctness contract (VERDICT r13 #1): a
multi-chunk newline-JSON fixture is derived deterministically from
the ``orders`` table, read back through
``spark.read.format("jsonl_graph")`` with RETAINED pushed filters,
and hash-matched against a DuckDB ``read_json`` twin over the SAME
file.

The fixture bakes in every posture the reader claims:
- **chunk boundaries**: ``chunk_bytes`` is set far below the file
  size, so the scan runs as many byte-range partitions and the
  newline-alignment rule (partial first line belongs to the previous
  chunk) is what keeps rows exactly-once;
- **schema coercion**: odd-keyed rows string-encode ``o_custkey``
  ("42" for 42) and ``o_orderdate`` is an ISO date string — the
  declared schema (bigint/date) drives ``_coerce``;
- **coerced pushdown** (ADVICE r13 HIGH): the query filters on the
  DATE column and the (sometimes string-encoded) BIGINT column; both
  filters are retained by the source, so they MUST evaluate against
  the coerced values — the raw-value comparison bug dropped every
  string-encoded row and all date rows;
- **error tolerance** (A9): a malformed line is planted mid-file; the
  reader yields it as an all-NULL row, the filter drops it — DuckDB's
  ``ignore_errors=true`` produces the same NULL row on its side.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.sources.registry import load_table

QUERIES: dict = {}
ORACLE: dict = {}

# fixture subset: a fixed absolute key range, so the fixture is
# bounded (≤ _KEY_CAP rows) at EVERY scale factor — orderkeys are
# dense from 0 in the driver's testdata
_KEY_CAP = 6000
_CHUNK_BYTES = 65536  # ~10 byte-range partitions over the fixture
_MALFORMED_AT = 499  # plant the broken line inside the first chunk


def jsonl_fixture_path(sf_dir: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(f"/tmp/biodwh2_jsonl_fixture_{tag}", "orders.jsonl")


def build_jsonl_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Write the deterministic JSONL ingest fixture (idempotent:
    content is a pure function of sf_dir, committed via os.replace so
    a crashed writer never leaves a readable partial file). Driver-
    side by design — this MAKES the ingest input; the scan under test
    is the distributed part."""
    path = jsonl_fixture_path(sf_dir)
    if os.path.exists(path):
        return path
    rows = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < _KEY_CAP)
        .select(
            "o_orderkey", "o_custkey", "o_totalprice",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderstatus",
        )
        .orderBy("o_orderkey")
        .collect()
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        for i, r in enumerate(rows):
            rec = {
                "o_orderkey": r.o_orderkey,
                # odd keys string-encode the bigint: the coerced-
                # pushdown lane (ADVICE r13 HIGH)
                "o_custkey": (
                    str(r.o_custkey) if r.o_orderkey % 2 else r.o_custkey
                ),
                "o_totalprice": r.o_totalprice,
                "o_orderdate": r.o_orderdate.isoformat(),
                "o_orderstatus": r.o_orderstatus,
            }
            fh.write(json.dumps(rec) + "\n")
            if i == _MALFORMED_AT:
                fh.write('{"o_orderkey": not valid json\n')
    os.replace(tmp, path)
    return path


_Q192_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_totalprice double, "
    "o_orderdate date, o_orderstatus string"
)
_Q192_DATE = "1995-06-01"
_Q192_CUSTKEY = 10


def q192_jsonl_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 ingest through the Python DataSource: multi-chunk scan +
    retained coerced pushdown + A9 tolerance, row-level hash against
    DuckDB ``read_json`` on the byte-identical file.

    Scale: partition count scales with BYTES (chunk_bytes), not
    files; pushed filters drop rows at the line parser, so the rows
    crossing into the JVM are exactly the result; one pass, no
    shuffle before the (tiny) sort for the deterministic hash."""
    from biodwh2_arcadedb_server_spark.sources.jsonl_source import register

    path = build_jsonl_fixture(spark, sf_dir)
    register(spark)
    df = (
        spark.read.format("jsonl_graph")
        .schema(_Q192_DDL)
        .option("path", path)
        .option("chunk_bytes", _CHUNK_BYTES)
        .load()
    )
    return (
        df.where(
            (F.col("o_orderdate") >= F.lit(_Q192_DATE).cast("date"))
            & (F.col("o_custkey") >= _Q192_CUSTKEY)
        )
        .select(
            "o_orderkey", "o_custkey", "o_totalprice",
            "o_orderdate", "o_orderstatus",
        )
        .orderBy("o_orderkey")
    )


QUERIES["q192_jsonl_source_scan"] = q192_jsonl_source_scan

# The oracle reads the SAME fixture file the Spark scan read. The
# driver's oracle pass runs at sf0.01 (after the Spark side, which
# builds the fixture); the path is the deterministic sf0.01 fixture
# location. ignore_errors=true: DuckDB yields the malformed line as
# an all-NULL row — the same A9 posture the reader has — and the
# o_custkey/o_orderdate predicates drop it on both engines.
ORACLE["q192_jsonl_source_scan"] = f"""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
           o_orderstatus
    FROM read_json('{jsonl_fixture_path("/root/testdata/sf0.01")}',
                   format='newline_delimited', ignore_errors=true,
                   columns={{'o_orderkey': 'BIGINT',
                            'o_custkey': 'BIGINT',
                            'o_totalprice': 'DOUBLE',
                            'o_orderdate': 'DATE',
                            'o_orderstatus': 'VARCHAR'}})
    WHERE o_orderdate >= DATE '{_Q192_DATE}'
      AND o_custkey >= {_Q192_CUSTKEY}
    ORDER BY o_orderkey
"""


# --- q195: the CSV sibling (round 14, ROADMAP r13) ---------------------------------
_CSV_KEY_CAP = 3000
_CSV_BAL = 500.0


def csv_fixture_path(sf_dir: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(f"/tmp/biodwh2_csv_fixture_{tag}", "customer.csv")


def build_csv_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic CSV ingest fixture from the customer table, with
    the wrinkles the reader claims: QUOTED fields (a comma spliced
    into every 7th name forces csv quoting), empty cells (every 11th
    acctbal → NULL on both engines), and a malformed short row (ours
    → all-NULL then filter-dropped; DuckDB ignore_errors skips it)."""
    import csv as _csv

    path = csv_fixture_path(sf_dir)
    if os.path.exists(path):
        return path
    rows = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < _CSV_KEY_CAP)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
        .collect()
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"])
        for i, r in enumerate(rows):
            name = r.c_name + ", esq" if i % 7 == 0 else r.c_name
            bal = "" if i % 11 == 0 else repr(r.c_acctbal)
            w.writerow([r.c_custkey, name, r.c_nationkey, bal, r.c_mktsegment])
            if i == 199:
                fh.write("999999,short_row\n")  # wrong column count
    os.replace(tmp, path)
    return path


_Q195_DDL = (
    "c_custkey bigint, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)


def q195_csv_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingest through the ``csv_graph`` Python DataSource —
    multi-chunk byte-range scan with header ownership, quoted-field
    parsing, empty-cell NULLs, retained coerced pushdown, and the A9
    malformed-row posture — hash-matched against DuckDB ``read_csv``
    on the byte-identical file."""
    from biodwh2_arcadedb_server_spark.sources.csv_source import register

    path = build_csv_fixture(spark, sf_dir)
    register(spark)
    df = (
        spark.read.format("csv_graph")
        .schema(_Q195_DDL)
        .option("path", path)
        .option("chunk_bytes", 16384)
        .load()
    )
    return (
        df.where(
            (F.col("c_acctbal") > F.lit(_CSV_BAL))
            & F.col("c_mktsegment").startswith("B")
        )
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
    )


QUERIES["q195_csv_source_scan"] = q195_csv_source_scan
ORACLE["q195_csv_source_scan"] = f"""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM read_csv('{csv_fixture_path("/root/testdata/sf0.01")}',
                  header=true, ignore_errors=true,
                  columns={{'c_custkey': 'BIGINT',
                           'c_name': 'VARCHAR',
                           'c_nationkey': 'INTEGER',
                           'c_acctbal': 'DOUBLE',
                           'c_mktsegment': 'VARCHAR'}})
    WHERE c_acctbal > {_CSV_BAL}
      AND c_mktsegment LIKE 'B%'
    ORDER BY c_custkey
"""
