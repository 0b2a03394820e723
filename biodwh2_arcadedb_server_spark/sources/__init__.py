"""Sources: workspace/table readers and view registration.

The reference opens its workspace graph read-only and iterates per
label (`ArcadeDBService.java:129,143,156` in /root/reference). Here a
"workspace" is a directory of Parquet datasets; registration exposes
each as a Spark temp view so the whole query surface is plain Spark
SQL / DataFrames with Catalyst pushdown into the Parquet scans.
"""

from biodwh2_arcadedb_server_spark.sources.registry import (  # noqa: F401
    TABLES,
    load_table,
    register_tables,
)
