"""Parquet table registry for the driver testdata layout.

Reference parity: graph source scan + label enumeration
(`ArcadeDBService.java:129,143,227`) — opening the workspace and
listing its labels. In Spark terms a label/table is a Parquet dataset;
scans are partition-pruned and column-pruned by Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver-generated star schema + LLM-pipeline tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain `spark.read.parquet` keeps predicate
    pushdown / column pruning available to every downstream plan.

    The `events` table is written with parquet TIMESTAMP(NANOS), which
    Spark rejects by default; we read nanos as long and convert to a
    microsecond TimestampType (floor, matching DuckDB's fetch
    behavior). The conf is per-session and safe to set repeatedly.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            # integer `div`, not `/`: float division of ~2^60 nanos
            # loses the low microsecond bits (53-bit mantissa)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register each table as a temp view (reference: per-label type
    registration, `ArcadeDBService.java:143-154`). Returns the frames."""
    out: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
