"""Differential-oracle harness: Spark result vs DuckDB oracle.

Mirrors the driver's t2 gate (SURVEY.md §5): row-count, column names,
and an order-insensitive value hash over canonicalized cells. Used by
tests/ locally so every `queries()` entry is verified before the
driver ever sees it.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
from typing import Any

import duckdb
from pyspark.sql import DataFrame, SparkSession

from biodwh2_arcadedb_server_spark.sources.registry import TABLES, table_path

ROUND_DP = 4


def _canon_cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, ROUND_DP)
        if r == 0.0:
            r = 0.0  # normalize -0.0
        return f"{r:.4f}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, _dt.timedelta):
        return str(v.total_seconds())
    return str(v)


def canonicalize(rows: list[dict[str, Any]]) -> tuple[int, list[str], str]:
    """(row_count, sorted column names, order-insensitive value hash)."""
    if not rows:
        return 0, [], hashlib.md5(b"").hexdigest()
    cols = sorted(rows[0].keys())
    lines = sorted("|".join(_canon_cell(r[c]) for c in cols) for r in rows)
    digest = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(rows), cols, digest


def spark_rows(df: DataFrame) -> list[dict[str, Any]]:
    return [r.asDict(recursive=True) for r in df.collect()]


def duckdb_rows(sql: str, sf_dir: str) -> tuple[list[dict[str, Any]], dict[str, str]]:
    """Rows via fetchall (authoritative Python values) plus the Arrow
    types of the same result — the driver harness materializes through
    pandas/Arrow, where two artifact classes break its hash even when
    the Python values match (both observed in CORRECTNESS_r02):
    HUGEINT aggregates (Arrow decimal128 → float/Decimal vs Spark's
    bigint) and dates past the datetime64[ns] range. Nullable BIGINT →
    float64 is NOT flagged: r1 proved the driver handles it (q49)."""
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
            )
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = [dict(zip(cols, row)) for row in res.fetchall()]
        arrow_schema = con.execute(sql).fetch_arrow_table().schema
        dtypes = {f.name: str(f.type) for f in arrow_schema}
        return rows, dtypes
    finally:
        con.close()


_NS_MIN = _dt.date(1677, 9, 22)
_NS_MAX = _dt.date(2262, 4, 11)


def driver_compat_issues(
    s_schema: dict[str, str], d_rows: list[dict[str, Any]], d_dtypes: dict[str, str]
) -> list[str]:
    """Detect oracle results that hash-match locally but break the
    driver's pandas-side materialization (observed r2: q82, q88)."""
    issues: list[str] = []
    for col, dtype in d_dtypes.items():
        s_type = s_schema.get(col, "")
        if dtype.startswith("decimal") and s_type in {
            "tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"
        }:
            issues.append(
                f"{col}: DuckDB emits {dtype} (HUGEINT aggregate) but Spark emits "
                f"{s_type} (driver hash sees 0.0 != 0) — CAST the oracle aggregate "
                f"AS BIGINT"
            )
    for r in d_rows:
        for col, v in r.items():
            if isinstance(v, _dt.date) and not (_NS_MIN <= (v.date() if isinstance(v, _dt.datetime) else v) <= _NS_MAX):
                issues.append(
                    f"{col}: value {v} outside datetime64[ns] range — overflows the "
                    f"driver's pandas harness"
                )
                break
    return issues


def compare(
    spark: SparkSession, query_fn, oracle: str, sf_dir: str
) -> tuple[bool, str]:
    """Run both engines, canonicalize, compare. Returns (ok, detail)."""
    s_df = query_fn(spark, sf_dir)
    s_rows = spark_rows(s_df)
    d_rows, d_dtypes = duckdb_rows(oracle, sf_dir)
    s_schema = {f.name: f.dataType.simpleString() for f in s_df.schema.fields}
    compat = driver_compat_issues(s_schema, d_rows, d_dtypes)
    if compat:
        return False, "driver-compat: " + "; ".join(compat)
    s_n, s_cols, s_hash = canonicalize(s_rows)
    d_n, d_cols, d_hash = canonicalize(d_rows)
    if s_n != d_n:
        return False, f"row count: spark={s_n} duckdb={d_n}"
    if s_cols != d_cols:
        return False, f"columns: spark={s_cols} duckdb={d_cols}"
    if s_hash != d_hash:
        s_sample = sorted(map(str, s_rows))[:3]
        d_sample = sorted(map(str, d_rows))[:3]
        return False, f"value hash mismatch; spark sample={s_sample} duckdb sample={d_sample}"
    return True, f"ok n={s_n}"
