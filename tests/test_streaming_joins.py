"""Streaming joins: results over a finite source must equal the batch
equivalents (the streaming oracle strategy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodwh2_arcadedb_server_spark.sources.registry import load_table
from biodwh2_arcadedb_server_spark.streaming import events as se
from biodwh2_arcadedb_server_spark.streaming.joins import enrich_with_dim, follow_within


def test_stream_static_enrich_matches_batch(spark, sf_small):
    stream = se.read_events_stream(spark, sf_small)
    dim = load_table(spark, sf_small, "customer").select("c_custkey", "c_mktsegment")
    out = enrich_with_dim(stream, dim, "user_id", "c_custkey").select(
        "event_id", "c_mktsegment"
    )
    q = se.run_stream_to_memory(out, "enriched", output_mode="append")
    try:
        got = {(r.event_id, r.c_mktsegment) for r in spark.table("enriched").collect()}
        batch = (
            load_table(spark, sf_small, "events")
            .join(dim, F.col("user_id") == F.col("c_custkey"))
            .select("event_id", "c_mktsegment")
        )
        want = {(r.event_id, r.c_mktsegment) for r in batch.collect()}
        assert got == want and got
    finally:
        q.stop()


def test_stream_stream_self_join_matches_batch(spark, sf_small):
    stream = se.read_events_stream(spark, sf_small).where(F.col("user_id") < 10)
    out = follow_within(stream, within="5 minutes", watermark="10 minutes")
    q = se.run_stream_to_memory(out, "followed", output_mode="append")
    try:
        got = {(r.l_event_id, r.r_event_id) for r in spark.table("followed").collect()}
        e = load_table(spark, sf_small, "events").where(F.col("user_id") < 10)
        l = e.select(F.col("user_id").alias("k"), F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts"))
        r = e.select(F.col("user_id").alias("k"), F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts"))
        batch = l.join(
            r,
            (l.k == r.k)
            & (r.r_ts > l.l_ts)
            & (r.r_ts <= l.l_ts + F.expr("INTERVAL 5 minutes")),
        )
        want = {(x.l_id, x.r_id) for x in batch.collect()}
        assert got == want and got
    finally:
        q.stop()
