"""Streaming ingest of the events stream (C7).

The reference system has no streaming story (its server ingests once
and serves queries); the north star adds one. Everything here is
Structured Streaming: ``readStream`` → declarative transforms →
``writeStream``, with watermarks bounding state for late data.

Batch/stream parity: ``tumbling_agg`` builds the *same plan shape* as
the batch probe ``relational.q16_tumbling_window`` — the test suite
runs the stream to completion on the same files and asserts equality,
which is the oracle strategy for streaming (SURVEY.md §7.6).

Scale notes:
- Watermarks cap state: a `10 minutes` watermark on a 1h tumbling
  window keeps at most ~2 windows of partial aggregates per key in
  the state store regardless of input volume.
- `dropDuplicatesWithinWatermark` is the streaming exact-dedup (C1)
  — state is bounded by the watermark horizon, so it runs forever on
  unbounded streams (plain dropDuplicates would grow state without
  bound).
- File-source streaming reads incrementally (maxFilesPerTrigger);
  in production the same plans run on Kafka sources unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """Incremental file-source stream over the events table.

    The stream schema is sniffed from a batch read of the parquet
    footer rather than hard-coded: the testdata has shipped `ts` both
    as TIMESTAMP(NANOS) (which Spark only reads as long under
    nanosAsLong) and as timestamp[us] (TIMESTAMP_NTZ). Declaring the
    wrong physical type silently corrupts every event time by 1000×,
    so the batch reader's view of the file is the single source of
    truth for both engines.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # The file stream source requires a directory; point it at sf_dir
    # and glob-filter to the events file(s).
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        # legacy nanos-as-long layout: integer `div`, not `/` — float
        # division of ~2^60 nanos loses the low microsecond bits
        # (53-bit mantissa)
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # watermarks/event-time require TIMESTAMP; the session tz is
        # pinned UTC, so this cast is value-preserving vs the batch
        # NTZ view.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_agg(events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window count+sum per event_type — streaming twin of
    relational.q16_tumbling_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sliding_agg(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Sliding-window aggregate: each event lands in window/slide
    overlapping windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_agg(events: DataFrame, gap: str = "10 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity. State per user is one open session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup by event_id with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query over a finite file source to completion
    (availableNow) into an in-memory table; returns the StreamingQuery.
    Local smoke-test harness — production sinks are kafka/parquet."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
