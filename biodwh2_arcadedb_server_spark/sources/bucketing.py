"""Bucketed-table layout — the Spark replacement for the reference's
LSM secondary indexes (A13/B4) on the *join/lookup locality* axis.

The reference builds an LSM_TREE index per indexed property after bulk
load (`ArcadeDBService.java:258-283`) so point lookups and joins avoid
full scans. Spark's equivalents are (a) parquet min/max + predicate
pushdown for selective filters (audited in tests/test_plans.py) and
(b) **bucketing** for join locality: two tables bucketed by the same
key into the same bucket count join with ZERO shuffle — each task
reads matching buckets from both sides. At 100 TB this turns the
recurring fact⋈fact join from a full-network shuffle into a local
merge, paid once at write time.

Bucketed datasets must be saved as tables (the metastore carries the
bucket spec); `spark.sql.sources.bucketing.enabled` is on by default.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int, sort: bool = True
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key``.
    Sorting within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins plus better min/max pruning on the key."""
    # Overwrite mode can't reclaim a location orphaned by a crashed
    # JVM (the fresh catalog doesn't know the table, so the existing
    # directory raises LOCATION_ALREADY_EXISTS) — pre-clear it.
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    stale = Path(urlparse(warehouse).path or warehouse) / table.lower()
    if stale.exists():
        shutil.rmtree(stale, ignore_errors=True)
    # Pre-shuffle into the bucket layout: repartition(buckets, key)
    # uses the same Murmur3 hash as the bucket assignment, so every
    # write task holds exactly one bucket and emits ONE file per
    # bucket. Without this, each of N write tasks emits a file per
    # bucket (N files/bucket) and the scan-side sorted-bucket
    # optimization is lost — Spark re-Sorts before a merge join it
    # could have read pre-sorted (round-8 q44 layout experiment).
    writer = (
        df.repartition(buckets, F.col(key))
        .write.mode("overwrite")
        .bucketBy(buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With equal
    bucket counts the physical plan contains no Exchange on either
    side (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)
