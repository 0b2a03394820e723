"""Streaming sinks: file-sink parity with batch, foreachBatch
workspace merge, and idempotent replay."""

from __future__ import annotations

from biodwh2_arcadedb_server_spark.sources.registry import load_table
from biodwh2_arcadedb_server_spark.streaming import events as se
from biodwh2_arcadedb_server_spark.streaming import sinks


def _event_keys(df):
    return {r.event_id for r in df.select("event_id").collect()}


def test_parquet_file_sink_matches_batch(spark, sf_small, tmp_path):
    stream = se.read_events_stream(spark, sf_small)
    q = sinks.run_stream_to_parquet(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    try:
        got = spark.read.parquet(str(tmp_path / "out"))
        want = load_table(spark, sf_small, "events")
        assert _event_keys(got) == _event_keys(want)
    finally:
        q.stop()


def test_foreach_batch_workspace_ingest(spark, sf_small, tmp_path):
    table = str(tmp_path / "events_ws")
    stream = se.read_events_stream(spark, sf_small, max_files_per_trigger=1)
    q = sinks.stream_events_into_workspace(stream, table, str(tmp_path / "ckpt"))
    try:
        got = sinks.read_workspace_events(spark, table)
        want = load_table(spark, sf_small, "events")
        assert _event_keys(got) == _event_keys(want)
        assert got.count() == want.count()
        # ingest_batch is a real partition column on the raw read
        raw = spark.read.parquet(table)
        assert "ingest_batch" in raw.columns
    finally:
        q.stop()


def test_foreach_batch_replay_is_idempotent(spark, sf_small, tmp_path):
    """Re-delivering the same micro-batch (same batch_id) must not
    duplicate rows — the crash-between-write-and-commit case."""
    table = str(tmp_path / "events_ws")
    batch = load_table(spark, sf_small, "events")
    sinks.merge_batch_into_workspace(batch, 0, table)
    n1 = spark.read.parquet(table).count()
    sinks.merge_batch_into_workspace(batch, 0, table)  # replay
    n2 = spark.read.parquet(table).count()
    assert n1 == n2 == batch.count()
