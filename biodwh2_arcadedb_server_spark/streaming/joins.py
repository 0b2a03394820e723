"""Streaming joins (C7): stream-static enrichment and watermarked
stream-stream joins.

Stream-static: each micro-batch hash-joins against the static side —
the standard dimension-enrichment shape; the static side is planned
per batch, so broadcast selection (AQE) applies as in batch.

Stream-stream: both sides carry watermarks and the join condition
bounds event time, so the state store retains only rows inside the
watermark horizon — state is O(rate × window), independent of stream
length. Without the time bound Spark would have to keep every row
ever seen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(stream: DataFrame, dim: DataFrame, stream_key: str, dim_key: str) -> DataFrame:
    """Stream-static inner join: attach dimension attributes to each
    event. ``dim`` is a batch DataFrame."""
    return stream.join(dim, stream[stream_key] == dim[dim_key], "inner").drop(dim[dim_key])


def follow_within(
    stream: DataFrame,
    key: str = "user_id",
    within: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream self-join: pairs (earlier, later)
    events of the same ``key`` where the later event follows the
    earlier within ``within``. Returns one row per ordered pair.

    Both inputs are watermarked so expired state is evicted; the
    band `l.ts < r.ts <= l.ts + within` gives Spark the retention
    bound for each side's state store.
    """
    left = (
        stream.withWatermark("ts", watermark)
        .select(
            F.col(key).alias("l_key"),
            F.col("event_id").alias("l_event_id"),
            F.col("ts").alias("l_ts"),
        )
    )
    right = (
        stream.withWatermark("ts", watermark)
        .select(
            F.col(key).alias("r_key"),
            F.col("event_id").alias("r_event_id"),
            F.col("ts").alias("r_ts"),
        )
    )
    cond = (
        (left.l_key == right.r_key)
        & (right.r_ts > left.l_ts)
        & (right.r_ts <= left.l_ts + F.expr(f"INTERVAL {within}"))
    )
    return left.join(right, cond, "inner").select(
        F.col("l_key").alias("user_id"), "l_event_id", "r_event_id", "l_ts", "r_ts"
    )
