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
