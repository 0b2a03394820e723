"""Format-agnostic table reader: parquet (default), ORC, CSV, JSON.

The workspace ETL standardizes on parquet (SURVEY §1.3: columnar,
pushdown, stats), but ingest sources arrive in whatever format the
upstream system emits — the reference's single-format `mapped.db`
becomes "any Spark DataSource" here. JDBC and lakehouse formats
(Delta/Iceberg) plug into the same call when their jars are on the
classpath; they are not bundled in this environment.

Rules encoded here, not left to callers:
- **Explicit schema always** — `inferSchema` scans the entire input
  once before the real read (2× I/O at 100 TB) and can still guess
  wrong; a declared StructType is both faster and a contract.
- CSV gets `header=true` and parquet-compatible null handling by
  default; JSON is line-delimited (the only splittable JSON shape).
- Column pruning and (for parquet/ORC) predicate pushdown flow from
  the format's DataSource implementation — the caller's plan is
  identical across formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "csv", "json")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` in any supported format with an explicit schema.
    Parquet/ORC may omit the schema (self-describing files); CSV and
    JSON require one."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (one of {FORMATS})")
    if schema is None and fmt in ("csv", "json"):
        raise ValueError(f"{fmt} requires an explicit schema (inferSchema rescans the input)")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("nullValue", "")
    return reader.format(fmt).options(**options).load(path)


def write_any(df: DataFrame, path: str, fmt: str = "parquet", **options: str) -> None:
    """Write ``df`` in any supported format (overwrite)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (one of {FORMATS})")
    w = df.write.mode("overwrite")
    if fmt == "csv":
        options.setdefault("header", "true")
    w.format(fmt).options(**options).save(path)
