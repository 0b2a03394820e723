"""t2 differential gate, run locally: every queries() entry that has an
oracle must hash-match DuckDB on sf0.01 (same comparison the driver
applies)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from biodwh2_arcadedb_server_spark.testing import compare

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES.keys()))
def test_oracle_match(spark, sf_medium, name):
    ok, detail = compare(spark, _QUERIES[name], _ORACLES[name], sf_medium)
    assert ok, f"{name}: {detail}"


def test_all_oracle_keys_have_queries():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
