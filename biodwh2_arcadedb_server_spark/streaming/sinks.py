"""Streaming sinks: parquet file sink and foreachBatch workspace merge.

The reference ingests once into its database directory and serves
queries (ArcadeDBService.java:156-162 writes nodes, :240-254 edges);
its "sink" is the embedded store. The Spark-first continuous
counterpart keeps the workspace parquet datasets live while a stream
appends to them, with exactly-once delivery:

- ``run_stream_to_parquet`` — Spark's built-in file sink. The sink's
  own transaction log (``_spark_metadata``) records committed files
  per epoch, so readers through Spark see exactly-once output even
  across restarts. Right default for append-only fact streams.
- ``stream_events_into_workspace`` — ``foreachBatch``: each
  micro-batch lands in a deterministic ``ingest_batch=<id>``
  subdirectory written with ``mode("overwrite")``. A replayed batch
  (restart after a crash between write and checkpoint commit)
  overwrites its own directory instead of duplicating rows — the
  standard idempotent-foreachBatch pattern. On a lakehouse table
  format this whole function collapses to ``MERGE INTO``; plain
  parquet gets the same guarantee from deterministic paths.

Kafka parity: every plan here runs unchanged on a Kafka source —
swap ``read_events_stream`` for ``spark.readStream.format("kafka")
.option("subscribe", ...)`` plus ``from_json(value)`` with the events
schema; watermarks, sinks, and checkpoints are
source-agnostic. Not exercised here (no broker in the container).

Scale notes:
- foreachBatch runs the batch writer on the driver per epoch; the
  write itself is a distributed job. Partition the batch by the
  downstream read key (here: repartition on event date) before
  writing so workspace files cluster by query predicate.
- One checkpoint dir per query, on durable storage. The checkpoint
  is the source of truth for offsets; deleting it restarts ingest
  from scratch (and re-overwrites every ingest_batch dir — still
  correct, just wasteful).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_stream_to_parquet(df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Drain a finite stream into parquet with the built-in file sink
    (availableNow); returns the StreamingQuery after termination."""
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def merge_batch_into_workspace(batch_df: DataFrame, batch_id: int, table_dir: str) -> None:
    """The foreachBatch body, exposed for direct (re)invocation in
    tests: write the micro-batch to ``table_dir/ingest_batch=<id>``
    with overwrite. Deterministic path + overwrite = idempotent under
    replay. Hive-style partition naming so a plain
    ``spark.read.parquet(table_dir)`` sees ``ingest_batch`` as a
    partition column and prunes on it."""
    out = os.path.join(table_dir, f"ingest_batch={batch_id}")
    # cluster within the batch by event date so downstream time-range
    # scans touch few files (at sf the batch is one task; at scale
    # this is the shuffle that buys read locality forever after)
    batch_df.withColumn("_event_date", F.to_date("ts")).repartition(
        F.col("_event_date")
    ).drop("_event_date").write.mode("overwrite").parquet(out)


def stream_events_into_workspace(events: DataFrame, table_dir: str, checkpoint_dir: str):
    """Continuous ingest of an events stream into a parquet workspace
    table via idempotent foreachBatch; finite-source runs terminate
    (availableNow)."""
    q = (
        events.writeStream.foreachBatch(
            lambda bdf, bid: merge_batch_into_workspace(bdf, bid, table_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_workspace_events(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read the ingested table back, dropping the ingest bookkeeping
    partition column."""
    return spark.read.parquet(table_dir).drop("ingest_batch")
