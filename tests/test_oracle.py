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


def test_driver_compat_flags_hugeint_and_ns_overflow():
    """The two r2 driver-hash artifact classes must be caught locally:
    HUGEINT aggregates (Arrow decimal128 vs Spark bigint) and dates
    outside the datetime64[ns] range."""
    import datetime

    from biodwh2_arcadedb_server_spark.testing import driver_compat_issues

    issues = driver_compat_issues(
        {"n": "bigint"}, [{"n": 0}], {"n": "decimal128(38, 0)"}
    )
    assert len(issues) == 1 and "CAST" in issues[0]
    issues = driver_compat_issues(
        {"d": "date"}, [{"d": datetime.date(9999, 12, 31)}], {"d": "date32[day]"}
    )
    assert len(issues) == 1 and "datetime64" in issues[0]
    # nullable BIGINT -> float64 is fine (q49 was driver-green in r1)
    assert not driver_compat_issues({"n": "bigint"}, [{"n": 3}], {"n": "int64"})
    assert not driver_compat_issues(
        {"d": "date"}, [{"d": datetime.date(2261, 12, 31)}], {"d": "date32[day]"}
    )


def test_priority_orders_regressions_and_unchecked_first():
    """_compute_priority: red oracled probes lead, then never-checked
    oracled, then never-checked rows-only, then stalest green."""
    import json

    names = ["a", "b", "c", "d", "e"]
    oracled = {"a", "b", "c", "d"}
    # a: red in r2; b: green r1 only; c: never checked; d: green r2;
    # e: never checked, rows-only
    hist = {
        "CORRECTNESS_r01.json": {"b": {"hash_match": True}},
        "CORRECTNESS_r02.json": {
            "a": {"hash_match": False, "rows_match": True},
            "d": {"hash_match": True},
        },
    }
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        for fname, data in hist.items():
            Path(td, fname).write_text(json.dumps(data))
        got = entry_mod._compute_priority(names, oracled, history_dir=Path(td))
    assert got == ["a", "c", "e", "b", "d"]
